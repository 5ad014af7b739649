"""Pure-Python replication of Spark's ``xxhash64`` expression (XXH64,
seed 42) for the dir-level Bloom filters in ``tableformat``.

Why replicate instead of asking Spark: the bloom read path needs the
hash of ONE predicate literal at planning time, and the bloom build for
a small freshly-written directory is cheaper done driver-side than as a
Spark job (the probe measured ~0.15 s per literal-only job and ~1.4 s
per micro-batch build — pure job-roundtrip tax).  Big directories still
build distributed (tableformat routes on the dir's row count), so both
sides of the split must hash bit-identically; that equivalence is
property-tested against Spark itself in
``tests/test_properties.py::test_python_xxhash64_matches_spark``.

Algorithm source: the public XXH64 specification as implemented by
Spark's ``org.apache.spark.sql.catalyst.expressions.XxHash64`` /
``XXH64.java`` — per-type entry points ``hashInt`` (4-byte block),
``hashLong`` (8-byte block) and ``hashUnsafeBytes`` (full streaming
XXH64 over UTF-8 bytes for strings).
"""

from __future__ import annotations

_M = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SEED = 42  # Spark's fixed xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed(h: int) -> int:
    """Render a uint64 as Java's signed long (what Spark returns)."""
    return h - (1 << 64) if h >= (1 << 63) else h


def hash_int(value: int, seed: int = SEED) -> int:
    """XXH64 of one 4-byte int block (Spark: byte/short/int/boolean/
    date columns).  ``value`` is the signed 32-bit payload."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _signed(_fmix(h))


def hash_long(value: int, seed: int = SEED) -> int:
    """XXH64 of one 8-byte long block (Spark: long/timestamp columns)."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((value & _M) * _P2 & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _signed(_fmix(h))


def hash_bytes(data: bytes, seed: int = SEED) -> int:
    """Full streaming XXH64 over a byte buffer (Spark: string/binary
    columns — the UTF-8 bytes)."""
    length = len(data)
    off = 0
    if length >= 32:
        limit = length - 32
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while off <= limit:
            for i, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[off + 8 * i:off + 8 * i + 8], "little")
                v = (_rotl((v + k * _P2) & _M, 31) * _P1) & _M
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + length) & _M
    while off + 8 <= length:
        k = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= length:
        k = int.from_bytes(data[off:off + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < length:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _signed(_fmix(h))


#: integral Spark types → (bit width, hashed-as) — bool/byte/short/int
#: all hash through the 4-byte block, long through the 8-byte block
_INTEGRAL = {
    "tinyint": (8, "int"),
    "smallint": (16, "int"),
    "int": (32, "int"),
    "bigint": (64, "long"),
}


def spark_xxhash64(value: object, dtype: str) -> int | None:
    """``xxhash64(CAST(value AS dtype))`` computed in Python for the
    type/literal combinations the bloom path can prove exact:
    int-literal × integral column (including the CAST range check —
    out-of-range casts to NULL in Spark, rendered here as None = "can't
    reason") and str-literal × string column.  Any other combination
    returns None; the caller falls back to asking Spark."""
    if isinstance(value, str) and dtype == "string":
        return hash_bytes(value.encode("utf-8"))
    if (
        isinstance(value, int)
        and not isinstance(value, bool)
        and dtype in _INTEGRAL
    ):
        bits, kind = _INTEGRAL[dtype]
        if not -(1 << (bits - 1)) <= value < (1 << (bits - 1)):
            return None  # CAST overflow → NULL in Spark → unprunable
        return hash_long(value) if kind == "long" else hash_int(value)
    return None


def hash_longs_np(values):
    """Vectorized :func:`hash_long` over an int64 numpy array (returns
    int64 hashes, bit-identical to Spark's xxhash64 on a bigint
    column).  numpy uint64 arithmetic wraps mod 2^64, which IS the
    algorithm's arithmetic — no masking needed."""
    import numpy as np

    with np.errstate(over="ignore"):
        v = values.astype(np.int64).view(np.uint64)
        h = np.uint64((SEED + _P5 + 8) & _M)
        k = _np_rotl(v * np.uint64(_P2), 31) * np.uint64(_P1)
        h = h ^ k
        h = _np_rotl(h, 27) * np.uint64(_P1) + np.uint64(_P4)
        return _np_fmix(h).view(np.int64)


def hash_ints_np(values):
    """Vectorized :func:`hash_int` over an int32 numpy array."""
    import numpy as np

    with np.errstate(over="ignore"):
        v = values.astype(np.int32).view(np.uint32).astype(np.uint64)
        h = np.uint64((SEED + _P5 + 4) & _M)
        h = h ^ (v * np.uint64(_P1))
        h = _np_rotl(h, 23) * np.uint64(_P2) + np.uint64(_P3)
        return _np_fmix(h).view(np.int64)


def _np_rotl(x, r: int):
    import numpy as np

    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _np_fmix(h):
    import numpy as np

    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(_P2)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(_P3)
    h = h ^ (h >> np.uint64(32))
    return h
