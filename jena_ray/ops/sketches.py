"""Distributed sketches: HyperLogLog, Bloom filter, Count-Min.

Beyond-reference operators (the reference computes exact answers; a
100 TB pipeline needs the sketch forms). The shared Ray realization:
each block reduces to ONE small array row in map_batches (vectorized
numpy over 64-bit blake2 hashes); the per-block rows merge by an
element-wise commutative combine (max for HLL, OR for Bloom, + for
Count-Min), so every result is order- and partitioning-independent.

- HyperLogLog approximate COUNT DISTINCT (Flajolet et al. 2007, with
  the standard small-range linear-counting correction).
- Bloom filter membership (Bloom 1970): build a bit array over a key
  column, then probe another dataset as a pure broadcast filter — the
  scale path for decontamination / blocklist joins (no shuffle; false
  positives bounded, NO false negatives).
- Count-Min heavy hitters (Cormode & Muthukrishnan 2005): per-block
  count matrices summed into one sketch; frequency estimates
  overcount only, never undercount.
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


# --------------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------------


def _bloom_positions(values: list, m_bits: int, k: int) -> np.ndarray:
    """k bit positions per value via the standard double-hashing scheme
    (Kirsch & Mitzenmacher 2006: h_i = h1 + i*h2 mod m)."""
    h = _hash64(values)
    h1 = (h % np.uint64(m_bits)).astype(np.int64)
    h2 = ((h >> np.uint64(33)) % np.uint64(m_bits - 1) + 1).astype(np.int64)
    pos = (h1[:, None] + np.arange(k, dtype=np.int64)[None, :] * h2[:, None]) \
        % m_bits
    return pos.reshape(-1)


def bloom_build(ds, col: str, *, m_bits: int = 1 << 20, k: int = 5) -> bytes:
    """Build a Bloom filter over ``col``: each block reduces to one
    packed bit-array row (m_bits/8 bytes); rows merge by bitwise OR —
    commutative, so partitioning never changes the filter. Size for
    FP rate ≈ (1 - e^{-kn/m})^k; the default 1 Mbit / k=5 gives <1% FP
    up to ~130k keys. Returns the packed bit array (ship it to probes
    with ray.put — ONE object-store copy, read by every task)."""

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits, dtype=bool)
        vals = t[col].to_pylist()
        if vals:
            bits[_bloom_positions(vals, m_bits, k)] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()],
                                          pa.large_binary())})

    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged |= np.frombuffer(row["bits"], dtype=np.uint8)
    return merged.tobytes()


def bloom_probe(ds, col: str, bloom_bits: bytes, *, k: int = 5,
                flag_col: str = "maybe_member"):
    """Append a boolean membership column: True = possibly in the built
    set (FP-bounded), False = DEFINITELY not. Pure broadcast filter —
    no shuffle; pass ``bloom_bits`` via ray.put so each task reads the
    one object-store copy."""
    import ray

    ref = bloom_bits if isinstance(bloom_bits, ray.ObjectRef) \
        else ray.put(bloom_bits)

    def probe(t: pa.Table) -> pa.Table:
        raw = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8)).astype(bool)
        m_bits = len(bits)
        vals = t[col].to_pylist()
        if not vals:
            return t.append_column(flag_col, pa.array([], pa.bool_()))
        pos = _bloom_positions(vals, m_bits, k).reshape(len(vals), k)
        member = bits[pos].all(axis=1)
        return t.append_column(flag_col, pa.array(member))

    return ds.map_batches(probe, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Count-Min heavy hitters
# --------------------------------------------------------------------------

_CM_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F)


def _cm_rows(values: list, width: int) -> np.ndarray:
    """(len(values), depth) column indexes — one row of the sketch per
    seed (depth = len(_CM_SEEDS))."""
    out = np.empty((len(values), len(_CM_SEEDS)), dtype=np.int64)
    for d, seed in enumerate(_CM_SEEDS):
        h = np.array(
            [int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8,
                                salt=seed.to_bytes(8, "big")).digest(), "big")
             for v in values], dtype=np.uint64)
        out[:, d] = (h % np.uint64(width)).astype(np.int64)
    return out


def countmin_build(ds, col: str, *, width: int = 1 << 14) -> np.ndarray:
    """Count-Min sketch of value frequencies in ``col``: each block
    reduces to one (depth × width) count matrix; matrices SUM — the
    commutative combine — so the final sketch equals the single-pass
    sketch of the whole stream. Estimate error ≤ e·N/width with
    probability 1 - e^{-depth}."""
    depth = len(_CM_SEEDS)

    def partial(t: pa.Table) -> pa.Table:
        mat = np.zeros((depth, width), dtype=np.int64)
        vals = t[col].to_pylist()
        if vals:
            idx = _cm_rows(vals, width)
            for d in range(depth):
                np.add.at(mat[d], idx[:, d], 1)
        return pa.table({"mat": pa.array([mat.reshape(-1).tolist()],
                                         pa.list_(pa.int64()))})

    merged = np.zeros(depth * width, dtype=np.int64)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged += np.asarray(row["mat"], dtype=np.int64)
    return merged.reshape(depth, width)


def countmin_estimate(sketch: np.ndarray, values: list) -> np.ndarray:
    """Point frequency estimates (min over rows — overcounts only)."""
    width = sketch.shape[1]
    idx = _cm_rows(values, width)
    ests = np.stack([sketch[d, idx[:, d]] for d in range(sketch.shape[0])])
    return ests.min(axis=0)
