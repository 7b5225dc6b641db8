"""Spark-compatible bucket-id computation in pure Python.

Spark assigns a bucketed row to bucket ``pmod(murmur3_hash(col), n)``
(``HashPartitioning.partitionIdExpression``) with the 32-bit
Murmur3 x86 variant at seed 42 — the same function ``F.hash`` exposes.
The manifest SQL datasource prunes a clustered snapshot's files at
PLANNING time by hashing the pushed equality points driver-side (no
JVM available in the Python data source worker), so the hash is
re-implemented here from the published algorithm and pinned against
``F.hash`` output in ``tests/test_manifest_source.py`` — if Spark ever
changed the function, the parity test fails before any file could be
wrongly skipped.

Scope: int/long/string bucket columns (the types the engine's
clustered tables use). Everything else returns None = "don't prune".
"""

from __future__ import annotations

import re

_MASK = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593
SEED = 42  # Spark's Murmur3Hash expression seed


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & _MASK


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK
    k1 = _rotl(k1, 15)
    return (k1 * _C2) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def _signed32(x: int) -> int:
    x &= _MASK
    return x - (1 << 32) if x >= (1 << 31) else x


def hash_int(value: int, seed: int = SEED) -> int:
    """Murmur3_x86_32.hashInt — Spark's hash of a 32-bit value."""
    h1 = _mix_h1(seed & _MASK, _mix_k1(value & _MASK))
    return _signed32(_fmix(h1, 4))


def hash_long(value: int, seed: int = SEED) -> int:
    """Murmur3_x86_32.hashLong — low half mixed first, then high."""
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed & _MASK, _mix_k1(v & _MASK))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _MASK))
    return _signed32(_fmix(h1, 8))


def hash_bytes(data: bytes, seed: int = SEED) -> int:
    """Murmur3_x86_32.hashUnsafeBytes — 4-byte little-endian words,
    then trailing bytes one at a time as SIGNED bytes (the JVM reads
    ``byte``s); used by Spark for UTF8String values."""
    n = len(data)
    aligned = n - n % 4
    h1 = seed & _MASK
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:
            b -= 256  # signed byte, sign-extended to int
        h1 = _mix_h1(h1, _mix_k1(b & _MASK))
    return _signed32(_fmix(h1, n))


#: Spark simpleString type names this module can hash (Murmur3Hash's
#: per-type layout differs — an unlisted type must NOT fall through)
_INT32_TYPES = {"int", "smallint", "tinyint", "date"}
_INT64_TYPES = {"bigint", "long"}


def spark_hash(value, spark_type: str) -> int | None:
    """``F.hash(value)`` for a scalar of the given Spark type name, or
    None when the (value, type) pair is outside the supported set —
    the caller must treat None as "cannot prune"."""
    if value is None:
        return None  # null hashes to the seed, but EqualTo(null) is
        # never satisfiable anyway — let Spark's filter handle it
    if spark_type in _INT32_TYPES:
        if isinstance(value, bool) or not isinstance(value, int):
            return None
        return hash_int(value)
    if spark_type in _INT64_TYPES:
        if isinstance(value, bool) or not isinstance(value, int):
            return None
        return hash_long(value)
    if spark_type == "string":
        if not isinstance(value, str):
            return None
        return hash_bytes(value.encode("utf-8"))
    return None


def bucket_id(value, spark_type: str, n_buckets: int) -> int | None:
    """The bucket this value lands in under Spark's layout:
    ``pmod(hash, n)`` of the signed 32-bit hash. None = unknown."""
    h = spark_hash(value, spark_type)
    if h is None:
        return None
    return h % n_buckets if n_buckets > 0 else None


#: Spark's bucket-file name convention: the bucket id rides the file
#: name as ``..._NNNNN.c000...`` (the writer always prints %05d) and
#: the catalog reader parses it back (``BucketingUtils.getBucketId``).
#: ONE definition for the whole engine: operators/txn.py validates
#: clustered snapshots against this same regex, so the SQL reader's
#: bucket pruning and the layout guard can never disagree about what
#: counts as a bucket file.
BUCKET_FILE_RE = re.compile(r"_(\d{5})(?:\.|$)")


def file_bucket_id(file_name: str) -> int | None:
    """Bucket id from a Spark bucketed file name, None if the name
    does not carry one."""
    m = BUCKET_FILE_RE.search(file_name)
    return int(m.group(1)) if m else None
