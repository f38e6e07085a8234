"""Seeded hash families shared by every sketch.

Design contract (mirrors the reference's distributed invariant): every
executor must evaluate *identical* hash functions, or merged sketches are
meaningless. The reference enforces this by broadcasting rank 0's hash
params (reference: src/mpi/mpiV1.c:24-26). We instead derive all params as a
pure function of an explicit integer seed, so every executor — and the
DuckDB oracle SQL — can regenerate them independently.

Two families:

1. Affine 2-universal family over the Mersenne prime p = 2^31 - 1
   (reference constant PRIME, src/core/count_min_sketch.h:15):
       h_j(x) = ((a_j * (x mod p) + b_j) mod p) mod width
   Reducing x mod p first keeps every product < 2^62, so the whole
   evaluation is exact in int64 — in numpy AND in ANSI-SQL BIGINT
   arithmetic (the DuckDB oracles replay it literally). The reference's
   evaluation (src/core/count_min_sketch.c:136-138) wraps a*x in uint32,
   an artifact we deliberately do not replicate; we keep the *contract*
   (seeded shared affine family), not the overflow bug.

2. djb2 string hash folded modulo LONG_PRIME = 4294967311 at every step
   (reference: src/core/count_min_sketch.c:14-21 computes djb2 in uint64
   then reduces once; we fold mod p each step so the value is computable
   without 64-bit overflow in both numpy and SQL `list_reduce`). This maps
   tokens/URLs into the integer item domain.
"""

from __future__ import annotations

import numpy as np

MERSENNE_PRIME = 2_147_483_647  # 2^31 - 1, reference PRIME
LONG_PRIME = 4_294_967_311  # reference LONG_PRIME (smallest prime > 2^32)
DJB2_INIT = 5381

# Maximum token byte-length supported by the vectorized djb2 kernel.
_MAX_TOKEN_LEN = 4096
_POW33 = np.empty(_MAX_TOKEN_LEN + 1, dtype=np.int64)
_POW33[0] = 1
for _i in range(1, _MAX_TOKEN_LEN + 1):
    _POW33[_i] = (_POW33[_i - 1] * 33) % LONG_PRIME


def affine_params(seed: int, depth: int) -> tuple[np.ndarray, np.ndarray]:
    """Derive ``depth`` (a, b) pairs from ``seed``.

    a in [1, p-1], b in [0, p-1] — same ranges as the reference's
    universal_hash_init (src/core/count_min_sketch.c:121-133), but drawn
    from a seeded PCG64 instead of C rand() so they are reproducible
    everywhere (and embeddable as literals into oracle SQL).
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_PRIME, size=depth, dtype=np.int64)
    b = rng.integers(0, MERSENNE_PRIME, size=depth, dtype=np.int64)
    return a, b


def affine_hash(items: np.ndarray, a: np.ndarray, b: np.ndarray, width: int) -> np.ndarray:
    """Vectorized h_j(x) for all rows j at once -> int64[depth, n].

    Exact in int64: x is reduced mod p (< 2^31) before the multiply.
    """
    x = np.asarray(items, dtype=np.int64) % MERSENNE_PRIME
    return ((a[:, None] * x[None, :] + b[:, None]) % MERSENNE_PRIME) % np.int64(width)


def djb2_py(token: str | bytes) -> int:
    """Scalar djb2 mod LONG_PRIME (pure-Python reference path)."""
    data = token.encode("utf-8") if isinstance(token, str) else token
    h = DJB2_INIT
    for ch in data:
        h = (h * 33 + ch) % LONG_PRIME
    return h


def djb2_batch(tokens) -> np.ndarray:
    """Vectorized djb2 mod LONG_PRIME over a sequence/Series of strings.

    Folding mod p each step equals evaluating the polynomial
    ``5381*33^n + sum(c_i * 33^(n-1-i))`` mod p, which vectorizes:
    concatenate all UTF-8 bytes, weight each byte by 33^(distance from
    token end), segment-sum with np.add.reduceat. No per-row Python.
    """
    import pyarrow as pa

    if isinstance(tokens, pa.ChunkedArray):
        arr = tokens.combine_chunks()
    elif isinstance(tokens, pa.Array):
        arr = tokens
    else:
        arr = pa.array(tokens, type=pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type == pa.large_string():
        import pyarrow.compute as pc

        arr = pc.cast(arr, pa.string())
    if arr.null_count:
        arr = arr.fill_null("")
    buffers = arr.buffers()
    raw_offsets = np.frombuffer(buffers[1], dtype=np.int32, count=arr.offset + len(arr) + 1)
    raw_offsets = raw_offsets[arr.offset:].astype(np.int64)
    first = int(raw_offsets[0])
    offsets = raw_offsets - first
    nbytes = int(offsets[-1])
    if nbytes == 0:
        return np.full(len(arr), DJB2_INIT % LONG_PRIME, dtype=np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8, count=first + nbytes)[first:]
    lengths = np.diff(offsets)
    if lengths.max(initial=0) > _MAX_TOKEN_LEN:
        raise ValueError(f"token longer than {_MAX_TOKEN_LEN} bytes")
    # distance-from-end exponent for every byte position
    ends = np.repeat(offsets[1:], lengths)
    pos = np.arange(nbytes, dtype=np.int64)
    exp = ends - pos - 1
    terms = (data.astype(np.int64) * _POW33[exp]) % LONG_PRIME
    # segment sums at token starts (np.add.reduceat needs non-empty segments)
    starts = offsets[:-1]
    out = np.full(len(arr), (DJB2_INIT * 1) % LONG_PRIME, dtype=np.int64)
    nonempty = lengths > 0
    if nonempty.any():
        red_starts = starts[nonempty]
        seg = np.add.reduceat(terms, red_starts)
        # reduceat sums between consecutive start indices; trailing segment ok.
        # Sum of terms: each term < LONG_PRIME (<2^33); max segment len 4096
        # -> < 2^45, exact in int64.
        out[nonempty] = (DJB2_INIT * _POW33[lengths[nonempty]] + seg) % LONG_PRIME
    return out


def splitmix31(x: np.ndarray, a: int, b: int) -> np.ndarray:
    """One extra affine scramble used where a second independent 31-bit
    hash is needed (HLL rho bits). Kept affine so oracle SQL can replay it."""
    x = np.asarray(x, dtype=np.int64) % MERSENNE_PRIME
    return (np.int64(a) * x + np.int64(b)) % MERSENNE_PRIME
