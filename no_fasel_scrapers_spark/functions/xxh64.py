"""Pure-Python XXH64 — bit-exact twin of Spark SQL's ``xxhash64``.

Spark's ``xxhash64(string)`` is the standard XXH64 algorithm (public spec,
https://github.com/Cyan4973/xxHash) over the UTF-8 bytes with seed 42.  The
engine's hot path uses the JVM built-in; this twin exists for the
single-threaded ordering oracle and the fixture generator, which must
reproduce the exact frontier ordering key ``(priority, depth, url_hash)``
off-Spark.  tests/test_canonical.py verifies both agree on sample data.

Signed-ness: Spark returns a *signed* 64-bit long; ``xxh64_signed`` applies
the same two's-complement reinterpretation.
"""

from __future__ import annotations

_M = (1 << 64) - 1
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & _M
    return (_rotl(acc, 31) * P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(s: str | bytes, seed: int = SPARK_SEED) -> int:
    """Spark-compatible signed value of ``xxhash64(s)``."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    h = xxh64(b, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_int_signed(i: int, seed: int = SPARK_SEED) -> int:
    """Spark ``xxhash64`` of an IntegerType column value.

    Spark's XxHash64.hashInt == XXH64 over the 4 little-endian bytes of the
    int (two's complement), same seed chaining as any other input."""
    return _to_signed(xxh64((i & 0xFFFFFFFF).to_bytes(4, "little"), seed & _M))


def xxh64_long_signed(v: int, seed: int = SPARK_SEED) -> int:
    """Spark ``xxhash64`` of a LongType column value (8 LE bytes)."""
    return _to_signed(xxh64((v & _M).to_bytes(8, "little"), seed & _M))


def xxh64_chain(values, seed: int = SPARK_SEED) -> int:
    """Spark multi-column ``xxhash64(c1, c2, ...)``: each column's hash
    seeds the next — hash(cN, ... hash(c2, hash(c1, 42))).

    ``values`` items: Python int → IntegerType semantics for small Python
    literals is ambiguous; pass explicit tuples ("int"|"long"|"str", v)."""
    h = seed
    for kind, v in values:
        if kind == "int":
            h = xxh64_int_signed(v, h)
        elif kind == "long":
            h = xxh64_long_signed(v, h)
        elif kind == "str":
            h = _to_signed(xxh64(v.encode("utf-8"), h & _M))
        else:  # pragma: no cover
            raise ValueError(kind)
    return h


def xxh64_long_vec(vals, seed):
    """Vectorized Spark ``xxhash64`` over a numpy int64/uint64 array of
    LongType values (8-byte branch of XXH64, unrolled):

        h  = seed + P5 + 8
        k1 = rotl(x·P2, 31)·P1 ; h ^= k1 ; h = rotl(h, 27)·P1 + P4
        avalanche(h)

    ``seed`` may be a scalar or an array broadcastable against ``vals``.
    Returns signed int64 (Spark long semantics)."""
    import numpy as np

    with np.errstate(over="ignore"):
        x = np.asarray(vals).astype(np.uint64)
        s = np.asarray(seed).astype(np.uint64)
        u = lambda c: np.uint64(c)  # noqa: E731
        rotl = lambda v, r: (v << u(r)) | (v >> u(64 - r))  # noqa: E731
        h = s + u(P5) + u(8)
        k1 = rotl(x * u(P2), 31) * u(P1)
        h ^= k1
        h = rotl(h, 27) * u(P1) + u(P4)
        h ^= h >> u(33)
        h *= u(P2)
        h ^= h >> u(29)
        h *= u(P3)
        h ^= h >> u(32)
        return h.astype(np.int64)
