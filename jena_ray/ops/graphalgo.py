"""Graph algorithms over the triple table: PageRank.

Beyond-reference operator (the reference has no graph analytics): entity
importance over the KG's IRI→IRI edges. Per round:

    contributions: map over the (distributed) edge table with the rank
    vector BROADCAST (ray.put once per round) → (dst, rank[src]/deg[src])
    inflow: groupby(dst).sum — the one shuffle per round
    update: damped combine on the (node → rank) vector

The rank vector is one float per node — broadcast-size by assumption
(documented): for graphs whose node set exceeds driver memory, swap the
broadcast for a hash-partitioned join keyed on src (the sameAs-closure
join shape). Note: this Ray build's Dataset.join operator emits
schema-less empty partition blocks that crash chained acero joins
nondeterministically (see git history), so the broadcast form is also
the robust one at this scale.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..model import KIND_IRI


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


def pagerank(edges_ds, *, damping: float = 0.85, iterations: int = 10,
             num_partitions: int = 8):
    """(node, rank) Dataset after `iterations` of damped PageRank."""
    import ray
    import ray.data as rd

    edges = edges_ds.materialize()

    # node universe and out-degrees, collected once (rank-vector-sized)
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
