"""Deterministic parameter identity + seeding (SURVEY §2A F5).

The reference derives reproducible randomness and stable parameter ids
from key strings:

- RNG seed = HMAC-SHA1(seedKey, utf8(key))   (`DataframeModeler.scala:260-264`,
  seedKey "DataframeModeler$" at `:224`)
- param id = UUID.nameUUIDFromBytes(utf8(key)) — MD5 name-based v3 UUID
  (`DataframeModeler.scala:213-215`)
- initial embedding = N(0,1) draws rescaled to unit RMS
  (`ModelingStrategy.scala:45-57`)

Bit-exact parity with the JVM is not required (different RNG streams);
determinism given (seed_key, key) is.
"""

from __future__ import annotations

import hashlib
import hmac
import uuid

import numpy as np

DEFAULT_SEED_KEY = b"DataframeModeler$"


def hmac_sha1_seed(key: str, seed_key: bytes = DEFAULT_SEED_KEY) -> int:
    """Reproducible 64-bit RNG seed for a parameter key string."""
    digest = hmac.new(seed_key, key.encode("utf-8"), hashlib.sha1).digest()
    return int.from_bytes(digest[:8], "big")


def name_uuid(key: str) -> str:
    """Stable name-based (MD5, v3) UUID for a parameter key, matching
    Java's ``UUID.nameUUIDFromBytes`` on the UTF-8 bytes.

    Java hashes the raw bytes with version/variant bits patched in;
    ``uuid.uuid3`` would prepend a namespace, so patch by hand.
    """
    md5 = bytearray(hashlib.md5(key.encode("utf-8")).digest())
    md5[6] = (md5[6] & 0x0F) | 0x30  # version 3
    md5[8] = (md5[8] & 0x3F) | 0x80  # IETF variant
    return str(uuid.UUID(bytes=bytes(md5)))


def seeded_unit_rms_tensor(key: str, size: int, seed_key: bytes = DEFAULT_SEED_KEY) -> np.ndarray:
    """Deterministic initial embedding for a categorical key: standard
    normal draws rescaled to unit RMS (`ModelingStrategy.scala:45-57`)."""
    rng = np.random.default_rng(hmac_sha1_seed(key, seed_key))
    values = rng.standard_normal(size)
    rms = float(np.sqrt(np.mean(values**2)))
    return (values / rms if rms > 0 else values).astype(np.float64)
