"""Utility subsystems: serialization, conformance, key caching."""

from .keycache import KeyCache, KEY_CACHE
from .profiling import OpTimer, annotate, trace
from .serialization import (
    ConformanceError,
    DeserializationError,
    safe_serialize,
    safe_deserialize,
    serialize,
    deserialize,
)

__all__ = [
    "KeyCache",
    "KEY_CACHE",
    "OpTimer",
    "annotate",
    "trace",
    "ConformanceError",
    "DeserializationError",
    "safe_serialize",
    "safe_deserialize",
    "serialize",
    "deserialize",
]
