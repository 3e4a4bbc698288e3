"""Similarity search over the embeddings table (vec_id, embedding, label).

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (ray.put once) — the exact baseline
- LSH-bucketed ANN: random-hyperplane signatures bucket the corpus; probe
  only matching buckets (multi-probe over nearby codes) — the scale path:
  the shuffle is a groupby on the bucket code, group sizes bounded by
  corpus/2^bits.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc_

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = pc_.index(t["vec_id"], vec_id).as_py()
    return np.array(t["embedding"][idx].as_py(), dtype=np.float64)


def brute_force_topk(emb_ds, query: np.ndarray, k: int = 5):
    """Exact top-k by cosine: per-batch local top-k heap (map side) then a
    tiny global merge — no full sort, no all-to-all."""
    import ray

    qn = query / max(np.linalg.norm(query), 1e-12)
    q_ref = ray.put(qn)

    def local_topk(b: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        mat = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        mat = _norm_rows(mat)
        sims = mat @ q
        ids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        take = min(k, len(ids))
        # partial top-k inside the batch
        part = np.argpartition(-sims, take - 1)[:take]
        return pa.table(
            {
                "vec_id": pa.array(ids[part], pa.int64()),
                "cos": pa.array(np.round(sims[part], 6), pa.float64()),
            }
        )

    local = brute = emb_ds.map_batches(local_topk, batch_format="pyarrow")
    # global merge: tie-break by vec_id for determinism
    return brute.sort(["cos", "vec_id"], descending=[True, False]).limit(k)


def _kmeans(sample: np.ndarray, k: int, iters: int = 20,
            seed: int = 13) -> np.ndarray:
    """Plain Lloyd's k-means on a (small, driver-side) training sample —
    the coarse quantizer for IVF. Deterministic (fixed seed)."""
    rng = np.random.RandomState(seed)
    k = min(k, len(sample))
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        new = np.array(
            [
                sample[assign == j].mean(axis=0) if (assign == j).any()
                else centroids[j]
                for j in range(k)
            ]
        )
        if np.allclose(new, centroids):
            break
        centroids = new
    return centroids


def ivf_topk(emb_ds, query: np.ndarray, k: int = 5, *, n_centroids: int = 16,
             nprobe: int = 4, train_size: int = 2048):
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    partitions the corpus into cells; only the query's `nprobe` nearest
    cells are scanned. One pass, no index materialization (pipeline
    mode): each batch assigns its vectors to cells vectorized, keeps the
    probed cells, and emits a local top-k — same merge as brute force.
    The quantizer trains on a driver-side SAMPLE (train_size vectors —
    KB-scale state, broadcast once)."""
    import ray

    train = []
    need = train_size
    for b in emb_ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        train.extend(b["embedding"].to_pylist()[:need - len(train)])
        if len(train) >= need:
            break
    mat = _norm_rows(np.array(train, dtype=np.float64))
    centroids = _kmeans(mat, n_centroids)

    qn = query / max(np.linalg.norm(query), 1e-12)
    cd = ((centroids - qn[None, :]) ** 2).sum(axis=1)
    probe_cells = np.argsort(cd)[:nprobe]
    state_ref = ray.put((centroids, frozenset(int(c) for c in probe_cells), qn))

    def scan(b: pa.Table) -> pa.Table:
        cents, cells, q = ray.get(state_ref)
        m = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        if len(m) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        m = _norm_rows(m)
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        mask = np.isin(assign, list(cells))
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        sims = m[mask] @ q
        ids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)[mask]
        take = min(k, len(ids))
        part = np.argpartition(-sims, take - 1)[:take]
        return pa.table(
            {"vec_id": pa.array(ids[part], pa.int64()),
             "cos": pa.array(np.round(sims[part], 6), pa.float64())}
        )

    cand = emb_ds.map_batches(scan, batch_format="pyarrow")
    return cand.sort(["cos", "vec_id"], descending=[True, False]).limit(k)


N_PLANES = 8
_rng = np.random.RandomState(7)
_PLANES_BY_DIM: dict[int, np.ndarray] = {}


def _planes(dim: int) -> np.ndarray:
    if dim not in _PLANES_BY_DIM:
        _PLANES_BY_DIM[dim] = np.random.RandomState(7).randn(N_PLANES, dim)
    return _PLANES_BY_DIM[dim]


def _code(mat: np.ndarray) -> np.ndarray:
    proj = mat @ _planes(mat.shape[1]).T  # (n, N_PLANES)
    bits = (proj > 0).astype(np.int64)
    return (bits * (1 << np.arange(N_PLANES))).sum(axis=1)


def lsh_topk(emb_ds, query: np.ndarray, k: int = 5, probes: int = 4):
    """Approximate top-k: only buckets whose code is within `probes`-bit
    flips of the query's code are scanned (multi-probe LSH)."""
    qn = query / max(np.linalg.norm(query), 1e-12)
    qcode = int(_code(qn[None, :])[0])
    # multi-probe: all codes within `probes` bit flips of the query code
    from itertools import combinations

    probe_codes = {qcode}
    for r in range(1, probes + 1):
        for bits in combinations(range(N_PLANES), r):
            c = qcode
            for b in bits:
                c ^= 1 << b
            probe_codes.add(c)
    codes_arr = pa.array(sorted(probe_codes), pa.int64())

    def bucket_filter(b: pa.Table) -> pa.Table:
        mat = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        if len(mat) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        mat = _norm_rows(mat)
        codes = _code(mat)
        mask = np.isin(codes, np.asarray(codes_arr))
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        sims = mat[mask] @ qn
        ids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)[mask]
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "cos": pa.array(np.round(sims, 6), pa.float64())}
        )

    cand = emb_ds.map_batches(bucket_filter, batch_format="pyarrow")
    return cand.sort(["cos", "vec_id"], descending=[True, False]).limit(k)


MAX_SEMDEDUP_GROUP = 4096


def semdedup(emb_ds, *, n_clusters: int = 16, threshold: float = 0.95,
             train_size: int = 2048):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings with k-means and dropping
    all but one member of every within-cluster near-identical pair
    (cosine ≥ threshold). The cluster step is what makes the O(N²)
    pair search tractable — pairs are only computed inside a cluster.

    Distributed shape: the coarse quantizer trains on a driver-side
    sample (KB-scale, broadcast once via ray.put — same pattern as
    ivf_topk); cluster assignment is a vectorized map_batches; the
    within-cluster pass is ONE groupby(cluster).map_groups with a numpy
    gram matrix per group. Keeper = lowest vec_id of each duplicate
    set (deterministic). Hot clusters chain-degrade: groups above
    MAX_SEMDEDUP_GROUP compare inside vec_id-sorted chunks only (the
    same bounded-bucket policy as simhash_pairs), trading recall for a
    hard memory bound.

    Returns (vec_id, cluster, keep) for every input vector."""
    import ray

    train = []
    for b in emb_ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        train.extend(b["embedding"].to_pylist()[:train_size - len(train)])
        if len(train) >= train_size:
            break
    mat = _norm_rows(np.array(train, dtype=np.float64))
    centroids_ref = ray.put(_kmeans(mat, n_clusters))

    def assign(b: pa.Table) -> pa.Table:
        cents = ray.get(centroids_ref)
        m = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        if len(m) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "embedding": b["embedding"]})
        mn = _norm_rows(m)
        d = ((mn[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pa.table({
            "vec_id": b["vec_id"].combine_chunks().cast(pa.int64()),
            "cluster": pa.array(d.argmin(axis=1), pa.int64()),
            "embedding": b["embedding"].combine_chunks(),
        })

    def dedup_group(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("vec_id", "ascending")])
        g = g.take(order)
        ids = g["vec_id"].to_pylist()
        m = _norm_rows(np.array(g["embedding"].to_pylist(),
                                dtype=np.float64))
        keep = np.ones(len(ids), dtype=bool)
        for lo in range(0, len(ids), MAX_SEMDEDUP_GROUP):
            mm = m[lo:lo + MAX_SEMDEDUP_GROUP]
            sims = mm @ mm.T
            # i is dropped if an earlier (lower-id) j in the chunk is a
            # near-duplicate — strictly-lower triangle of the gram matrix
            dup = (np.tril(sims, k=-1) >= threshold).any(axis=1)
            keep[lo:lo + MAX_SEMDEDUP_GROUP] = ~dup
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": g["cluster"],
            "keep": pa.array(keep, pa.bool_()),
        })

    return (emb_ds.map_batches(assign, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(dedup_group, batch_format="pyarrow"))


def kmeans_fit(emb_ds, k: int = 8, *, iters: int = 5, seed: int = 13,
               train_size: int = 2048):
    """Distributed Lloyd's k-means over the full embedding Dataset —
    the classic scalable shape (MacQueen 1967 / Lloyd 1982; the
    map-reduce formulation of Zhao et al. 2009): initial centroids from
    a deterministic driver-side sample, then each refinement round is
    one map_batches computing PER-BATCH partial sums (k rows × dim per
    block — the shuffle moves k·blocks tiny rows, never the corpus)
    plus one groupby(cluster) reduction; the k×dim centroid matrix is
    the only driver-side state and is re-broadcast per round via
    ray.put.

    Returns (centroids ndarray, assignment Dataset (vec_id, cluster,
    dist))."""
    import ray

    train = []
    for b in emb_ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        train.extend(b["embedding"].to_pylist()[:train_size - len(train)])
        if len(train) >= train_size:
            break
    sample = np.array(train, dtype=np.float64)
    rng = np.random.RandomState(seed)
    k = min(k, len(sample))
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]

    for _ in range(iters):
        cref = ray.put(centroids)

        def partials(b: pa.Table) -> pa.Table:
            cents = ray.get(cref)
            m = np.array(b["embedding"].to_pylist(), dtype=np.float64)
            kk, dim = cents.shape
            if len(m) == 0:
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64())),
                    "n": pa.array([], pa.int64())})
            d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            sums = np.zeros((kk, dim))
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=kk)
            keep = counts > 0
            return pa.table({
                "cluster": pa.array(np.arange(kk)[keep], pa.int64()),
                "vsum": pa.array([r.tolist() for r in sums[keep]],
                                 pa.list_(pa.float64())),
                "n": pa.array(counts[keep], pa.int64()),
            })

        def reduce_group(g: pa.Table) -> pa.Table:
            vs = np.array(g["vsum"].to_pylist(), dtype=np.float64)
            n = int(pc.sum(g["n"]).as_py())
            return pa.table({
                "cluster": g["cluster"].slice(0, 1),
                "centroid": pa.array([(vs.sum(axis=0) / n).tolist()],
                                     pa.list_(pa.float64())),
            })

        rows = (emb_ds.map_batches(partials, batch_format="pyarrow")
                .groupby("cluster")
                .map_groups(reduce_group, batch_format="pyarrow")
                .take_all())  # k rows × dim — driver-size by construction
        new = centroids.copy()
        for r in rows:
            new[r["cluster"]] = r["centroid"]
        if np.allclose(new, centroids):
            centroids = new
            break
        centroids = new

    cref = ray.put(centroids)

    def assign_final(b: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        m = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        if len(m) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.float64())})
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        return pa.table({
            "vec_id": b["vec_id"].combine_chunks().cast(pa.int64()),
            "cluster": pa.array(a, pa.int64()),
            "dist": pa.array(np.round(np.sqrt(d[np.arange(len(a)), a]), 6),
                             pa.float64()),
        })

    return centroids, emb_ds.map_batches(assign_final,
                                         batch_format="pyarrow")
