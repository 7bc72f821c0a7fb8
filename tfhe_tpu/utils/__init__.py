"""Utility subsystems: serialization, conformance, key caching."""

from .serialization import (
    ConformanceError,
    DeserializationError,
    safe_serialize,
    safe_deserialize,
    serialize,
    deserialize,
)

__all__ = [
    "ConformanceError",
    "DeserializationError",
    "safe_serialize",
    "safe_deserialize",
    "serialize",
    "deserialize",
]
