"""Graph algorithms over the triple table: PageRank.

Beyond-reference operator (the reference has no graph analytics): entity
importance over the KG's IRI→IRI edges. Iterative Dataset algebra — the
same join+groupby shape as the sameAs closure:

  per round: contributions = ranks ⋈ out-degree edges (hash join on src)
             → groupby(dst).sum → damped update
Ranks are materialized per round (small: one row per node).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..model import KIND_IRI



def _arr(x):
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x


def _empty_guard(names, types):
    """Post-join kernels may receive column-less empty partition blocks
    (Ray hash-join emits them); return a correctly-typed empty table."""
    import pyarrow as _pa

    return _pa.Table.from_arrays([_pa.array([], t) for t in types], names=names)


def _compact(ds):
    """Materialize and DROP zero-column empty blocks.

    Ray groupby/join operators emit (0 rows, 0 columns) blocks for empty
    partitions, and map_batches passes them through WITHOUT calling the
    UDF — so they survive any guard and crash a downstream acero join
    ("no match for key field on left side"). Re-assembling from the
    non-empty arrow refs removes them; per-round tables here are small.
    """
    import ray
    import ray.data as rd

    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    if not tables:
        return ds
    return rd.from_arrow(tables)


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
    edges = _compact(edges_ds)

    # node universe + out-degrees
    nodes = (
        edges.map_batches(
            lambda t: pa.Table.from_arrays(
                [pa.concat_arrays([t["src"].combine_chunks(),
                                   t["dst"].combine_chunks()])],
                names=["node"],
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .count()
        .select_columns(["node"])
    )
    nodes = _compact(nodes)
    n_nodes = nodes.count()
    out_deg = (
        edges.groupby("src").count()
        .map_batches(
            lambda t: t.rename_columns(["node", "out_deg"]), batch_format="pyarrow"
        )
    )
    out_deg = _compact(out_deg)  # small; reused every round

    init = 1.0 / n_nodes
    ranks = nodes.map_batches(
        lambda t: _empty_guard(["node", "rank"], [pa.string(), pa.float64()])
        if t.num_columns == 0
        else t.append_column("rank", pa.array([init] * len(t), pa.float64())),
        batch_format="pyarrow",
    )
    ranks = _compact(ranks)

    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        # rank/out_deg per source
        with_deg = ranks.join(
            out_deg, join_type="inner", num_partitions=num_partitions, on=("node",)
        ).map_batches(
            lambda t: _empty_guard(["src", "contrib"], [pa.string(), pa.float64()])
            if t.num_columns == 0 else pa.Table.from_arrays(
                [_arr(t["node"]),
                 _arr(pc.divide(t["rank"], pc.cast(t["out_deg"], pa.float64())))],
                names=["src", "contrib"],
            ),
            batch_format="pyarrow",
        )
        with_deg = _compact(with_deg)
        inflow = (
            edges.join(with_deg, join_type="inner",
                       num_partitions=num_partitions, on=("src",))
            .map_batches(
                lambda t: _empty_guard(["node", "contrib"], [pa.string(), pa.float64()])
                if t.num_columns == 0 else pa.Table.from_arrays(
                    [_arr(t["dst"]), _arr(t["contrib"])],
                    names=["node", "contrib"],
                ),
                batch_format="pyarrow",
            )
            .groupby("node")
            .sum("contrib")
            .map_batches(
                lambda t: t.rename_columns(["node", "inflow"]), batch_format="pyarrow"
            )
        )
        inflow = _compact(inflow)
        ranks = (
            nodes.join(inflow, join_type="left_outer",
                       num_partitions=num_partitions, on=("node",))
            .map_batches(
                lambda t: _empty_guard(["node", "rank"], [pa.string(), pa.float64()])
                if t.num_columns == 0 else pa.Table.from_arrays(
                    [_arr(t["node"]),
                     _arr(pc.add(
                         pa.scalar(base),
                         pc.multiply(
                             pa.scalar(damping),
                             pc.coalesce(_arr(t["inflow"]), pa.scalar(0.0)),
                         ),
                     ))],
                    names=["node", "rank"],
                ),
                batch_format="pyarrow",
            )
        )
        ranks = _compact(ranks)
    return ranks
