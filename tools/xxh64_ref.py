"""Pure-python XXH64 reference, used only to develop/validate the DuckDB
oracle SQL for llm_dedup_minhash / llm_dedup_simhash (driver-side dev
tool, not part of the library). Matches org.apache.spark.sql.catalyst
.expressions.XXH64 (= reference xxHash64) on little-endian platforms.
"""
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M = (1 << 64) - 1


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def _round(acc, inp):
    acc = (acc + inp * P2) & M
    return (rotl(acc, 31) * P1) & M


def _merge(h, v):
    h ^= _round(0, v)
    return (h * P1 + P4) & M


def fmix(h):
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], 'little')); i += 8
            v2 = _round(v2, int.from_bytes(data[i:i + 8], 'little')); i += 8
            v3 = _round(v3, int.from_bytes(data[i:i + 8], 'little')); i += 8
            v4 = _round(v4, int.from_bytes(data[i:i + 8], 'little')); i += 8
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        h = _merge(h, v1); h = _merge(h, v2); h = _merge(h, v3); h = _merge(h, v4)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], 'little'))
        h = (rotl(h, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], 'little') * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (rotl(h, 11) * P1) & M
        i += 1
    return fmix(h)


def hash_long(inp: int, seed: int) -> int:
    """XXH64.hashLong — Spark's element step for xxhash64 over arrays."""
    h = (seed + P5 + 8) & M
    h ^= (rotl((inp * P2) & M, 31) * P1) & M
    h = (rotl(h, 27) * P1 + P4) & M
    return fmix(h)


def splitmix(z: int) -> int:
    """graft.functions.HashUtil.mix (splitmix64 finalizer)."""
    z = (z + 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return z ^ (z >> 31)


def to_signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def to_unsigned(s):
    return s + (1 << 64) if s < 0 else s


if __name__ == '__main__':
    for s in [b'', b'a', b'hello', b'hello world, this is a longer string over 32 bytes!']:
        print(s, to_signed(xxh64(s)))
