"""Distributed sketches: HyperLogLog approximate COUNT DISTINCT.

Beyond-reference operator (the reference computes exact distinct counts;
a 100 TB pipeline needs the sketch form): HyperLogLog with 2^p registers
(Flajolet et al. 2007, with the standard small-range linear-counting
correction). Ray realization: each block reduces to ONE register-array
row in map_batches (vectorized numpy max-scatter over 64-bit blake2
hashes); the per-block rows (a few KB each) merge on the driver by
element-wise max — the canonical commutative sketch combine, so the
result is order- and partitioning-independent.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hash64(values: list) -> np.ndarray:
    return np.array(
        [
            int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big"
            )
            for v in values
        ],
        dtype=np.uint64,
    )


def _registers_for(values: list, p: int) -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not values:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = leading zeros of `rest` + 1, capped at 64-p+1 (all-zero rest).
    # Vectorized via log2 of the float value: only the MSB POSITION is
    # needed, which survives float64 rounding except at values rounding
    # up to 2^64 — clamped below.
    lz = np.full(len(h), 64 - p, dtype=np.int64)
    nz = rest > 0
    if nz.any():
        with np.errstate(divide="ignore"):
            msb = np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
        msb = np.minimum(msb, 63)
        lz[nz] = np.clip(63 - msb, 0, 64 - p)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small ranges
    return float(est)


def approx_count_distinct(ds, col: str, p: int = 12) -> float:
    """HLL estimate of the number of distinct values in `col`.
    Standard error ≈ 1.04/sqrt(2^p) (~1.6% at p=12)."""

    def partial(t: pa.Table) -> pa.Table:
        regs = _registers_for(t[col].to_pylist(), p)
        return pa.table({"regs": pa.array([regs.tolist()], pa.list_(pa.uint8()))})

    merged = np.zeros(1 << p, dtype=np.uint8)
    # one row per block, 2^p bytes each — driver merge is the canonical
    # commutative reduce and stays KB-scale regardless of data size
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged = np.maximum(merged, np.asarray(row["regs"], dtype=np.uint8))
    return _estimate(merged)
