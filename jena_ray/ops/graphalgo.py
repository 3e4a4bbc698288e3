"""Graph algorithms over the triple table: PageRank.

Beyond-reference operator (the reference has no graph analytics): entity
importance over the KG's IRI→IRI edges.

Two execution strategies, switched by ``strategy=``:

- ``"join"`` (default — scale path): rank state is a DATASET, never a
  driver dict. Per round:

      contribs: edges_with_deg ⋈ rank (hash join on src)
                → (dst, rank[src]/deg[src])
      union with (node, 0.0) zero rows so rankless nodes survive
      inflow:   groupby(dst).sum — one shuffle
      update:   vectorized damped combine

  Two shuffles per round; every table stays in the object store.
  compact_blocks between rounds defuses this Ray build's empty-block
  join bug (schema-less empty partition blocks crash chained acero
  joins) and keeps per-execution block counts low.

- ``"broadcast"``: the rank vector is collected to a driver dict and
  ray.put once per round — faster for graphs whose node set is small
  (one float per node), the classic small-graph realization.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..model import KIND_IRI
from ..util import compact_blocks


def entity_edges(triples_ds):
    """IRI→IRI edges (src, dst) from the triple stream."""

    def f(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(b["s_kind"], pa.scalar(KIND_IRI, pa.int8())),
            pc.equal(b["o_kind"], pa.scalar(KIND_IRI, pa.int8())),
        )
        t = b.filter(mask)
        out = pa.Table.from_arrays(
            [t["s_lex"].combine_chunks(), t["o_lex"].combine_chunks()],
            names=["src", "dst"],
        )
        return out.group_by(["src", "dst"]).aggregate([])

    return triples_ds.map_batches(f, batch_format="pyarrow")


def _rename(mapping: dict):
    def fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        return t.rename_columns([mapping.get(n, n) for n in t.schema.names])

    return fn


def pagerank(edges_ds, *, damping: float = 0.85, iterations: int = 10,
             num_partitions: int | None = None, strategy: str = "join"):
    """(node, rank) Dataset after `iterations` of damped PageRank."""
    if strategy == "broadcast":
        return _pagerank_broadcast(edges_ds, damping=damping, iterations=iterations)

    # normalize key dtype up front: acero joins refuse string vs
    # large_string key mismatches
    edges = compact_blocks(
        edges_ds.map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"].combine_chunks().cast(pa.large_string()),
                    "dst": t["dst"].combine_chunks().cast(pa.large_string()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    n_edges = edges.count()
    if num_partitions is None:
        num_partitions = max(1, min(64, n_edges // 2_000_000))

    # distinct node universe (srcs ∪ dsts) — stays distributed
    def both_ends(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        b["src"].combine_chunks().cast(pa.large_string()),
                        b["dst"].combine_chunks().cast(pa.large_string()),
                    ]
                )
            }
        ).group_by("node").aggregate([])

    nodes = compact_blocks(
        edges.map_batches(both_ends, batch_format="pyarrow").groupby("node").count()
        .map_batches(
            lambda t: pa.table(
                {"node": t["node"].combine_chunks().cast(pa.large_string())}
            )
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
    )
    n_nodes = max(1, nodes.count())
    base = (1.0 - damping) / n_nodes
    init = 1.0 / n_nodes

    # static per-edge state: (src, dst, deg[src]) — built once with one join
    def _deg_kernel(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        # Ray groupby emits `string` keys even from large_string input;
        # acero join then refuses the mixed key types — re-cast.
        return pa.table(
            {
                "src": t["src"].combine_chunks().cast(pa.large_string()),
                "deg": t["count()"].combine_chunks(),
            }
        )

    deg = compact_blocks(
        edges.groupby("src").count().map_batches(_deg_kernel, batch_format="pyarrow")
    )
    edges_deg = compact_blocks(
        edges.join(deg, join_type="inner", num_partitions=num_partitions, on=("src",))
    )

    # zero-contribution rows keep rankless nodes in every round's groupby
    zeros = compact_blocks(
        nodes.map_batches(
            lambda t: pa.table(
                {
                    "dst": t["node"].combine_chunks(),
                    "contrib": pa.array([0.0] * t.num_rows, pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    rank = compact_blocks(
        nodes.map_batches(
            lambda t: pa.table(
                {
                    "src": t["node"].combine_chunks(),
                    "rank": pa.array([init] * t.num_rows, pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    for _ in range(iterations):
        def contribs(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return pa.table(
                    {"dst": pa.array([], pa.large_string()),
                     "contrib": pa.array([], pa.float64())}
                )
            vals = pc.divide(
                t["rank"].combine_chunks(),
                pc.cast(t["deg"].combine_chunks(), pa.float64()),
            )
            return pa.table(
                {"dst": t["dst"].combine_chunks().cast(pa.large_string()),
                 "contrib": vals}
            )

        inflow = (
            edges_deg.join(rank, join_type="inner", num_partitions=num_partitions,
                           on=("src",))
            .map_batches(contribs, batch_format="pyarrow")
            .union(zeros)
            .groupby("dst")
            .sum("contrib")
        )

        def update(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return pa.table(
                    {"src": pa.array([], pa.large_string()),
                     "rank": pa.array([], pa.float64())}
                )
            new_rank = pc.add(
                pa.scalar(base),
                pc.multiply(pa.scalar(damping), t["sum(contrib)"].combine_chunks()),
            )
            return pa.table(
                {"src": t["dst"].combine_chunks().cast(pa.large_string()),
                 "rank": new_rank}
            )

        rank = compact_blocks(inflow.map_batches(update, batch_format="pyarrow"))

    return rank.map_batches(
        _rename({"src": "node"}), batch_format="pyarrow"
    ).sort("node")


def _pagerank_broadcast(edges_ds, *, damping: float = 0.85, iterations: int = 10):
    """Broadcast realization: rank vector collected to a driver dict and
    ray.put once per round. Partitioning assumption (documented): the node
    set fits driver memory — one float per node."""
    import ray
    import ray.data as rd

    edges = edges_ds.materialize()

    deg: dict[str, int] = {}
    nodes: set[str] = set()
    for b in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for s, d in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
            deg[s] = deg.get(s, 0) + 1
            nodes.add(s)
            nodes.add(d)
    n_nodes = max(1, len(nodes))
    base = (1.0 - damping) / n_nodes
    ranks = {n: 1.0 / n_nodes for n in sorted(nodes)}

    for _ in range(iterations):
        state_ref = ray.put((ranks, deg))

        def contribs(b: pa.Table) -> pa.Table:
            r, dg = ray.get(state_ref)
            srcs = b["src"].to_pylist()
            vals = [r[s] / dg[s] for s in srcs]
            return pa.table(
                {"dst": b["dst"].combine_chunks(),
                 "contrib": pa.array(vals, pa.float64())}
            )

        inflow_ds = (
            edges.map_batches(contribs, batch_format="pyarrow", batch_size=65536)
            .groupby("dst")
            .sum("contrib")
        )
        inflow: dict[str, float] = {}
        for b in inflow_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            inflow.update(
                zip(b["dst"].to_pylist(), b["sum(contrib)"].to_pylist())
            )
        ranks = {n: base + damping * inflow.get(n, 0.0) for n in ranks}

    items = sorted(ranks.items())
    return rd.from_arrow(
        pa.table(
            {"node": pa.array([k for k, _ in items], pa.string()),
             "rank": pa.array([v for _, v in items], pa.float64())}
        )
    )


def distinct_int_pairs(pairs_ds, cols=("a", "b"), *, num_parts: int = 64):
    """DISTINCT over two int64 columns without Ray's slow multi-column
    sort-groupby (measured 38 s for 265k rows at 8 cpus): per-batch
    arrow group_by pre-dedup, ONE int64 hash-partition shuffle, then a
    vectorized per-partition group_by — the stages/dedup.py int-hash
    trick specialized to integer keys (hash collisions only affect
    placement, never correctness)."""
    import numpy as np

    from ..util import compact_blocks

    a_col, b_col = cols

    def pre(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.select([a_col, b_col]).group_by([a_col, b_col]).aggregate([])

    def add_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("part", pa.array([], pa.int64()))
        a = t[a_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = t[b_col].combine_chunks().to_numpy(zero_copy_only=False)
        h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
            b.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        part = (h % np.uint64(num_parts)).astype("int64")
        return t.append_column("part", pa.array(part))

    def dedup_group(t: pa.Table) -> pa.Table:
        out = t.select([a_col, b_col]).group_by([a_col, b_col]).aggregate([])
        return out.rename_columns([a_col, b_col])

    pre_ds = pairs_ds.map_batches(pre, batch_format="pyarrow",
                                  batch_size=65536).map_batches(
        add_part, batch_format="pyarrow", batch_size=65536
    )
    return compact_blocks(
        pre_ds.groupby("part").map_groups(dedup_group, batch_format="pyarrow")
    )


def triangle_count(edges_ds, *, num_partitions: int | None = None):
    """Distributed triangle counting over an undirected edge Dataset
    with columns (a, b), a < b, distinct rows — the canonical
    ordered-wedge join (public algorithm; e.g. Suri & Vassilvitskii,
    WWW'11 MapReduce triangle counting): wedges (a<b<c) from
    E(a,b) ⋈ E(b,c), closed by E(a,c). Two hash joins, no driver
    state; skew note: ordering every edge low→high bounds wedge
    generation by the HIGHER-degree endpoint's ordered degree, the
    standard hot-vertex mitigation. Returns a one-row Dataset
    (n_triangles).

    The wedge join is materialized (compact_blocks) before the closing
    join: two JoinOperators in ONE streaming plan each reserve their
    partition aggregators up front and deadlock when the CPU pool is
    smaller than the combined reservation. num_partitions defaults to
    data-sized (edge count // 2M, capped 64) like every other join in
    this package."""

    def rename(cols: dict):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns([cols.get(c, c) for c in t.column_names])

        return fn

    from ..util import compact_blocks, fast_count

    n_edges, e = fast_count(edges_ds)
    if num_partitions is None:
        num_partitions = max(1, min(64, n_edges // 2_000_000))
    # wedge join on the middle vertex: (a,b) ⋈ (b,c)
    left = e.map_batches(rename({"a": "a", "b": "m"}),
                         batch_format="pyarrow")
    right = e.map_batches(rename({"a": "m", "b": "c"}),
                          batch_format="pyarrow")
    wedges = compact_blocks(
        left.join(right, join_type="inner",
                  num_partitions=num_partitions, on=("m",))
    )
    # close the wedge: (a,c) must be an edge
    closing = e.map_batches(rename({"b": "c"}), batch_format="pyarrow")
    tri = wedges.join(closing, join_type="inner",
                      num_partitions=num_partitions, on=("a", "c"))
    n = tri.count()
    import ray.data as rd

    return rd.from_items([{"n_triangles": n}])


def kcore(edges_ds, k: int = 2, *, max_rounds: int = 100):
    """k-core of an undirected graph (Seidman 1983; the standard
    iterative-peeling formulation): repeatedly drop vertices with
    degree < k until fixpoint; the survivors are the k-core. The
    classic graph-quality filter (e.g. keeping densely-linked entities
    before embedding training).

    Distributed shape per round: symmetrize once up front, then ONE
    groupby(node) degree count + one hash semi-join of edges against
    surviving nodes — all state stays in Datasets; the driver sees one
    count per round (the fixpoint test). Rounds are bounded by
    max_rounds (each round removes ≥1 vertex or stops, so real graphs
    terminate long before).

    Returns the surviving (node, degree) relation."""
    from ray.data.aggregate import Count

    from ..util import compact_blocks, fast_count

    ls = pa.large_string()

    def sym(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        u0 = t["src"].combine_chunks().cast(ls)
        v0 = t["dst"].combine_chunks().cast(ls)
        both = pa.concat_tables([pa.table({"u": u0, "v": v0}),
                                 pa.table({"u": v0, "v": u0})])
        # self-loops never count toward coreness
        return both.filter(pc.not_equal(both["u"], both["v"]))

    edges = compact_blocks(edges_ds.map_batches(sym,
                                                batch_format="pyarrow"))
    n_prev, edges = fast_count(edges)
    for _ in range(max_rounds):
        deg = edges.groupby("u").aggregate(Count(alias_name="degree"))
        good = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["degree"], k))
            if t.num_columns else t,
            batch_format="pyarrow")
        # an edge survives iff BOTH endpoints survive: two semi-joins
        # (key columns re-cast: Ray's hash groupby narrows large_string)
        keep_u = edges.join(
            good.map_batches(
                lambda t: pa.table(
                    {"u": t["u"].combine_chunks().cast(ls)})
                if t.num_columns else t,
                batch_format="pyarrow"),
            join_type="inner", num_partitions=8, on=("u",))
        keep_u = compact_blocks(keep_u)
        vgood = good.map_batches(
            lambda t: pa.table({"v": t["u"].combine_chunks().cast(ls)})
            if t.num_columns else t,
            batch_format="pyarrow")
        nxt = compact_blocks(keep_u.join(
            vgood, join_type="inner", num_partitions=8, on=("v",)))
        n_now, nxt = fast_count(nxt)
        if n_now == n_prev:
            break
        edges, n_prev = nxt, n_now
        if n_now == 0:
            break
    final = edges.groupby("u").aggregate(Count(alias_name="degree"))
    return final.map_batches(_rename({"u": "node"}),
                             batch_format="pyarrow")


def label_propagation(edges_ds, *, iterations: int = 5):
    """Community detection by (synchronous, deterministic) label
    propagation (Raghavan et al. 2007): every node starts as its own
    label; each round a node adopts the most frequent label among its
    neighbors, ties broken by the SMALLEST label — the deterministic
    variant, so results are reproducible across retries and cluster
    sizes (the price is the classic bipartite-oscillation risk, which
    the fixed iteration count bounds).

    Per round: one hash join (edge ⋈ label of dst) + one
    groupby(src, label) count + one groupby(src) arg-max — everything
    stays a Dataset. Returns (node, label)."""
    from ..util import compact_blocks

    ls = pa.large_string()

    def sym(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        u0 = t["src"].combine_chunks().cast(ls)
        v0 = t["dst"].combine_chunks().cast(ls)
        both = pa.concat_tables([pa.table({"u": u0, "v": v0}),
                                 pa.table({"u": v0, "v": u0})])
        return both.filter(pc.not_equal(both["u"], both["v"]))

    edges = compact_blocks(edges_ds.map_batches(sym,
                                                batch_format="pyarrow"))

    def init_labels(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        u = t["u"].combine_chunks().cast(ls)
        return pa.table({"v": u, "label": u}).group_by(
            ["v", "label"]).aggregate([])

    def cast_vl(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        return pa.table({"v": t["v"].combine_chunks().cast(ls),
                         "label": t["label"].combine_chunks().cast(ls)})

    labels = compact_blocks(edges.map_batches(init_labels,
                                              batch_format="pyarrow"))
    labels = labels.groupby("v").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow").map_batches(
        cast_vl, batch_format="pyarrow")

    for _ in range(iterations):
        nb = compact_blocks(edges.join(labels, join_type="inner",
                                       num_partitions=8, on=("v",)))

        def counts(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return t
            return pa.table({"u": t["u"].combine_chunks(),
                             "label": t["label"].combine_chunks()}) \
                .group_by(["u", "label"]).aggregate([("label", "count")])

        cnt = compact_blocks(nb.map_batches(counts,
                                            batch_format="pyarrow"))

        def argmax(g: pa.Table) -> pa.Table:
            # per-batch counts are PARTIAL — re-sum per label inside
            # the per-node group before taking the arg-max
            tot = g.group_by("label").aggregate([("label_count", "sum")])
            idx = pc.sort_indices(
                tot, sort_keys=[("label_count_sum", "descending"),
                                ("label", "ascending")])
            top = tot.take(idx[:1])
            return pa.table({"v": g["u"].slice(0, 1),
                             "label": top["label"]})

        labels = compact_blocks(
            cnt.groupby("u").map_groups(argmax, batch_format="pyarrow")
            .map_batches(cast_vl, batch_format="pyarrow"))

    return labels.map_batches(_rename({"v": "node"}),
                              batch_format="pyarrow")
