"""Pure-python XXH64 matching Spark's `xxhash64` (seed 42) bit-for-bit.

Validated against org.apache.spark.sql.catalyst.expressions.XxHash64 on
empty/short/4-byte/8-byte/32+-byte and unicode inputs. Used by the
pandas oracles in check_oracles.py to recompute JVM-hashed pipelines
(simhash) EXACTLY outside Spark. Public algorithm (Yann Collet's
xxHash spec); implementation written from the spec.
"""

M = (1 << 64) - 1
P1, P2, P3, P4, P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                      0x27D4EB2F165667C5)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned 64-bit XXH64 of `data`."""
    n = len(data)
    i = 0
    if n >= 32:
        v = [(seed + P1 + P2) & M, (seed + P2) & M, seed & M,
             (seed - P1) & M]
        while i <= n - 32:
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8],
                                      "little")
                vj = (v[j] + lane * P2) & M
                v[j] = (_rotl(vj, 31) * P1) & M
            i += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12)
             + _rotl(v[3], 18)) & M
        for vj in v:
            vj = (_rotl((vj * P2) & M, 31) * P1) & M
            h = ((h ^ vj) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 8:
        lane = int.from_bytes(data[i:i + 8], "little")
        k = (_rotl((lane * P2) & M, 31) * P1) & M
        h = (_rotl(h ^ k, 27) * P1 + P4) & M
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i:i + 4], "little")
        h = (_rotl(h ^ ((lane * P1) & M), 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64_str_signed(s: str, seed: int = 42) -> int:
    """Spark `F.xxhash64(string_col)` twin: UTF-8 bytes, signed int64."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h
