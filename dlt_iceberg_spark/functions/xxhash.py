"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

The streaming sink computes bucket-transform partition values on the
EXECUTORS from Arrow batches, where no Spark expression can run — so the
bucket hash must be reproduced bit-exactly in Python or stream-landed
files would carry partition tuples that scan-time probe rewriting
(``transform_column``: ``pmod(xxhash64(c), N)``) never matches, silently
breaking pruning.  Equality with Spark is pinned per type in
tests/test_functions.py.

Spark's XxHash64 hashes longs through the 8-byte little-endian path,
ints through the 4-byte path (NOT widened), strings as their UTF-8
bytes, all with seed 42.  Results are returned SIGNED like the Spark
expression.
"""

from __future__ import annotations

_MASK = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_HASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = SPARK_HASH_SEED) -> int:
    """Unsigned XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            k = int.from_bytes(data[i : i + 8], "little")
            v1 = (_rotl((v1 + k * _P2) & _MASK, 31) * _P1) & _MASK
            k = int.from_bytes(data[i + 8 : i + 16], "little")
            v2 = (_rotl((v2 + k * _P2) & _MASK, 31) * _P1) & _MASK
            k = int.from_bytes(data[i + 16 : i + 24], "little")
            v3 = (_rotl((v3 + k * _P2) & _MASK, 31) * _P1) & _MASK
            k = int.from_bytes(data[i + 24 : i + 32], "little")
            v4 = (_rotl((v4 + k * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
            h = ((h * _P1) + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        k = (_rotl((k * _P2) & _MASK, 31) * _P1) & _MASK
        h ^= k
        h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    return _avalanche(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_long(value: int, seed: int = SPARK_HASH_SEED) -> int:
    """Spark ``xxhash64(<long col>)``: the 8-byte LE long path."""
    return _signed(
        xxh64((value & _MASK).to_bytes(8, "little"), seed)
    )


def spark_xxhash64_int(value: int, seed: int = SPARK_HASH_SEED) -> int:
    """Spark ``xxhash64(<int col>)``: the 4-byte LE int path (ints are NOT
    widened — XxHash64.hashInt)."""
    return _signed(
        xxh64((value & 0xFFFFFFFF).to_bytes(4, "little"), seed)
    )


def spark_xxhash64_string(value: str, seed: int = SPARK_HASH_SEED) -> int:
    """Spark ``xxhash64(<string col>)``: UTF-8 bytes."""
    return _signed(xxh64(value.encode("utf-8"), seed))


def _np_rotl(x, r):
    import numpy as np

    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _np_avalanche(h):
    import numpy as np

    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(_P2)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(_P3)
    return h ^ (h >> np.uint64(32))


def spark_xxhash64_long_np(values, seed: int = SPARK_HASH_SEED):
    """Vectorized :func:`spark_xxhash64_long` over an int64 ndarray — the
    streaming sink's bucket hot path (one numpy pass instead of a Python
    call per row).  Bit-equality with the scalar form (and therefore with
    Spark) is pinned in tests/test_functions.py."""
    import numpy as np

    with np.errstate(over="ignore"):
        v = np.asarray(values, dtype=np.int64).view(np.uint64)
        # 8-byte tail lane of XXH64: h = seed+P5+8; h ^= round(k); mix
        k = _np_rotl(v * np.uint64(_P2), 31) * np.uint64(_P1)
        h = np.uint64((seed + _P5 + 8) & _MASK) ^ k
        h = _np_rotl(h, 27) * np.uint64(_P1) + np.uint64(_P4)
        return _np_avalanche(h).view(np.int64)


def spark_xxhash64_int_np(values, seed: int = SPARK_HASH_SEED):
    """Vectorized :func:`spark_xxhash64_int` (4-byte LE path, ints not
    widened) over an int ndarray."""
    import numpy as np

    with np.errstate(over="ignore"):
        v = (np.asarray(values, dtype=np.int64) & np.int64(0xFFFFFFFF)).astype(
            np.uint64
        )
        h = np.uint64((seed + _P5 + 4) & _MASK) ^ (v * np.uint64(_P1))
        h = _np_rotl(h, 23) * np.uint64(_P2) + np.uint64(_P3)
        return _np_avalanche(h).view(np.int64)


def _xxh64_fixed_np(mat, seed: int = SPARK_HASH_SEED):
    """Vectorized XXH64 over an ``(m, L)`` uint8 byte matrix — every row
    the SAME byte length ``L``, so the chunk schedule (stripe rounds,
    8/4-byte tails, byte tail) is static and each step is one numpy op
    over all ``m`` rows.  Returns unsigned uint64 hashes."""
    import numpy as np

    m, L = mat.shape

    def u64(sl):  # (m, 8) LE bytes -> (m,) uint64
        return np.ascontiguousarray(sl).view("<u8").ravel()

    def u32(sl):  # (m, 4) LE bytes -> (m,) uint64
        return np.ascontiguousarray(sl).view("<u4").ravel().astype(np.uint64)

    P1, P2, P3, P4, P5 = (np.uint64(p) for p in (_P1, _P2, _P3, _P4, _P5))
    with np.errstate(over="ignore"):
        i = 0
        if L >= 32:
            v1 = np.full(m, (seed + _P1 + _P2) & _MASK, dtype=np.uint64)
            v2 = np.full(m, (seed + _P2) & _MASK, dtype=np.uint64)
            v3 = np.full(m, seed & _MASK, dtype=np.uint64)
            v4 = np.full(m, (seed - _P1) & _MASK, dtype=np.uint64)
            while i + 32 <= L:
                v1 = _np_rotl(v1 + u64(mat[:, i : i + 8]) * P2, 31) * P1
                v2 = _np_rotl(v2 + u64(mat[:, i + 8 : i + 16]) * P2, 31) * P1
                v3 = _np_rotl(v3 + u64(mat[:, i + 16 : i + 24]) * P2, 31) * P1
                v4 = _np_rotl(v4 + u64(mat[:, i + 24 : i + 32]) * P2, 31) * P1
                i += 32
            h = _np_rotl(v1, 1) + _np_rotl(v2, 7) + _np_rotl(v3, 12) + _np_rotl(v4, 18)
            for v in (v1, v2, v3, v4):
                h = h ^ (_np_rotl(v * P2, 31) * P1)
                h = h * P1 + P4
        else:
            h = np.full(m, (seed + _P5) & _MASK, dtype=np.uint64)
        h = h + np.uint64(L)
        while i + 8 <= L:
            h = h ^ (_np_rotl(u64(mat[:, i : i + 8]) * P2, 31) * P1)
            h = _np_rotl(h, 27) * P1 + P4
            i += 8
        if i + 4 <= L:
            h = h ^ (u32(mat[:, i : i + 4]) * P1)
            h = _np_rotl(h, 23) * P2 + P3
            i += 4
        while i < L:
            h = h ^ (mat[:, i].astype(np.uint64) * P5)
            h = _np_rotl(h, 11) * P1
            i += 1
        return _np_avalanche(h)


def spark_xxhash64_string_arrow(arr, seed: int = SPARK_HASH_SEED):
    """Vectorized Spark ``xxhash64(<string col>)`` over a pyarrow string
    array: hashes the UTF-8 DATA BUFFER directly (offsets + data
    ndarrays), grouping rows by byte length so each group's XXH64 chunk
    schedule is static — no per-row Python anywhere (VERDICT r10 task 3;
    the streaming sink's string-bucket hot path).  Partition-key columns
    have few distinct lengths, so the per-length loop is O(#lengths)
    numpy passes, not O(rows).

    Returns ``(hashes, null_mask)``: signed int64 hashes (0 at null
    positions) and a bool ndarray marking nulls — callers decide the
    null-bucket value (Spark's xxhash64 of NULL returns the seed)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    mask = pc.is_null(arr).to_numpy(zero_copy_only=False).astype(bool)
    out = np.zeros(n, dtype=np.uint64)
    if n:
        off_dtype = "<i8" if pa.types.is_large_string(arr.type) else "<i4"
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=off_dtype)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.empty(0, dtype=np.uint8)
        )
        starts, lens = offs[:-1], offs[1:] - offs[:-1]
        live_lens = np.unique(lens[~mask]) if (~mask).any() else []
        for L in live_lens:
            rows = np.flatnonzero((lens == L) & ~mask)
            if L == 0:
                out[rows] = np.uint64(xxh64(b"", seed))
            else:
                gather = starts[rows][:, None] + np.arange(L, dtype=np.int64)
                out[rows] = _xxh64_fixed_np(data[gather], seed)
    return out.view(np.int64), mask
