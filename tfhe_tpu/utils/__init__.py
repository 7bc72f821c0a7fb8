"""Utility subsystems: serialization, conformance, key caching."""

from .jaxcache import enable_persistent_cache
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
    "enable_persistent_cache",
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
