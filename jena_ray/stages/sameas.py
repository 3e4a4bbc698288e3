"""owl:sameAs equivalence closure — distributed union-find.

The reference derives sameAs semantics from its OWL rule set
(jena-core/src/main/resources/etc/owl-fb.rules:157,424-449: symmetric +
transitive equivalence). We do NOT port the RETE engine; the closure is
rebuilt as iterative min-label propagation (SURVEY.md §7.2.6):

  representative(component) = lexicographic min member

Two execution paths:

- ``components_driver``: distinct edges are reduced distributed
  (map-side dedup + groupby), then the *small* edge list is union-found on
  the driver and the rep map broadcast via ``ray.put``. Right when the
  equivalence graph ≪ corpus (entity equivalences usually are).

- ``components_distributed``: pure Dataset algebra for when the edge set
  itself is huge: per-round neighbor min-propagation + pointer jumping,
  each implemented as union + groupby().map_groups (a join expressed as a
  groupby on the shared key — no driver state). Converges in
  O(log diameter) rounds; every round is one all-to-all shuffle.

Rewrite semantics (applies to the triple stream):
- every IRI s/o is mapped through the rep map
- original (a sameAs b) assertions are dropped (they would collapse to
  self-loops) and replaced by (member, owl:sameAs, rep) per member ≠ rep,
  preserving the equivalence information in the output graph.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..model import KIND_IRI, OWL_SAMEAS, TRIPLE_SCHEMA


def extract_edges(triples_ds):
    """Distinct sameAs (a, b) edge Dataset from the triple stream."""

    def to_edges(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("p"), OWL_SAMEAS)
        t = batch.filter(mask)
        tbl = pa.Table.from_arrays(
            [t.column("s_lex").combine_chunks(), t.column("o_lex").combine_chunks()],
            names=["a", "b"],
        )
        # map-side dedup before the shuffle
        return tbl.group_by(["a", "b"]).aggregate([])

    return triples_ds.map_batches(to_edges, batch_format="pyarrow")


class _UF:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo


def components_driver(edges_ds) -> dict[str, str]:
    """Union-find over the (deduplicated, small) edge list on the driver.

    Partitioning assumption: |distinct sameAs edges| fits driver memory —
    i.e. equivalences are sparse relative to the corpus. Use
    ``components_distributed`` otherwise.
    """
    uf = _UF()
    for batch in edges_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b in zip(batch.column("a").to_pylist(), batch.column("b").to_pylist()):
            uf.union(a, b)
    return {x: uf.find(x) for x in list(uf.parent)}


def components_distributed(edges_ds, max_rounds: int = 20):
    """Label-propagation closure entirely in Dataset algebra.

    Returns a Dataset (node, rep). Each round:
      1. neighbor-min: every node learns min(label) over itself + neighbors
         — union(labels, symmetric edges) → groupby(node) → emit candidate
         (peer, my_label) messages → groupby(node).min
      2. pointer-jump: label ← label(label), the same union+groupby join
    Convergence check = count of (node,label) pairs that changed, computed
    distributed; stops early at fixpoint.
    """
    import ray.data as rd

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks()
        b = batch.column("b").combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([a, b]), pa.concat_arrays([b, a])],
            names=["node", "peer"],
        )

    edges = edges_ds.map_batches(symmetrize, batch_format="pyarrow")

    # initial labels: node → min(node, min(peers)) computed in one groupby
    labels = (
        edges.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node").combine_chunks(),
                 pc.min_element_wise(t.column("node"), t.column("peer")).combine_chunks()],
                names=["node", "label"],
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .min("label")
        .map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        )
    )

    for _ in range(max_rounds):
        # --- neighbor-min round: join labels with edges on `node` ---------
        lab_rows = labels.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node").combine_chunks(),
                 pa.nulls(len(t), pa.large_string()),
                 t.column("label").combine_chunks()],
                names=["node", "peer", "label"],
            ),
            batch_format="pyarrow",
        )
        edge_rows = edges.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node").combine_chunks(),
                 t.column("peer").combine_chunks(),
                 pa.nulls(len(t), pa.large_string())],
                names=["node", "peer", "label"],
            ),
            batch_format="pyarrow",
        )

        def propagate(g: pd.DataFrame) -> pd.DataFrame:
            lab = g["label"].dropna()
            my = lab.min() if len(lab) else g["node"].iloc[0]
            peers = g["peer"].dropna()
            nodes = list(peers) + [g["node"].iloc[0]]
            return pd.DataFrame({"node": nodes, "label": [my] * len(nodes)})

        candidates = (
            lab_rows.union(edge_rows)
            .groupby("node")
            .map_groups(propagate, batch_format="pandas")
        )
        new_labels = (
            candidates.groupby("node")
            .min("label")
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
            )
        )

        # --- pointer jump: label ← label(label) --------------------------
        ask = new_labels.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("label").combine_chunks(),
                 t.column("node").combine_chunks(),
                 pa.nulls(len(t), pa.large_string())],
                names=["key", "asker", "label"],
            ),
            batch_format="pyarrow",
        )
        have = new_labels.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node").combine_chunks(),
                 pa.nulls(len(t), pa.large_string()),
                 t.column("label").combine_chunks()],
                names=["key", "asker", "label"],
            ),
            batch_format="pyarrow",
        )

        def jump(g: pd.DataFrame) -> pd.DataFrame:
            lab = g["label"].dropna()
            my = lab.min() if len(lab) else g["key"].iloc[0]
            askers = g["asker"].dropna()
            return pd.DataFrame({"node": list(askers), "label": [my] * len(askers)})

        jumped = (
            ask.union(have).groupby("key").map_groups(jump, batch_format="pandas")
        )
        jumped = (
            jumped.groupby("node")
            .min("label")
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
            )
        )

        # --- convergence: any label changed? ------------------------------
        old_tag = labels.map_batches(
            lambda t: t.append_column("src", pa.array(["o"] * len(t))),
            batch_format="pyarrow",
        )
        new_tag = jumped.map_batches(
            lambda t: t.append_column("src", pa.array(["n"] * len(t))),
            batch_format="pyarrow",
        )
        changed = (
            old_tag.union(new_tag)
            .groupby(["node", "label"])
            .count()
            .filter(lambda r: r["count()"] == 1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "rep"]), batch_format="pyarrow"
    )


def rewrite_with_reps(triples_ds, rep_map: dict[str, str], run_doc_id: str = ""):
    """Broadcast the rep map (ray.put once) and rewrite the stream."""
    import ray
    import ray.data as rd

    rep_ref = ray.put(rep_map)

    class Rewriter:
        def __init__(self):
            self.rep = ray.get(rep_ref)  # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            rep = self.rep
            # drop original sameAs assertions (replaced below)
            batch = batch.filter(pc.not_equal(batch.column("p"), OWL_SAMEAS))

            def remap(col, kind_col):
                arr = col.combine_chunks().dictionary_encode()
                vals = arr.dictionary.to_pylist()
                new = pa.array(
                    [rep.get(v, v) if v is not None else None for v in vals],
                    type=pa.large_string(),
                )
                mapped = new.take(arr.indices)
                is_iri = pc.equal(kind_col, pa.scalar(KIND_IRI, pa.int8())).combine_chunks()
                return pc.if_else(is_iri, mapped, col.combine_chunks())

            s_lex = remap(batch.column("s_lex"), batch.column("s_kind"))
            o_lex = remap(batch.column("o_lex"), batch.column("o_kind"))
            return pa.Table.from_arrays(
                [
                    batch.column("s_kind").combine_chunks(),
                    s_lex,
                    batch.column("p").combine_chunks(),
                    batch.column("o_kind").combine_chunks(),
                    o_lex,
                    batch.column("o_datatype").combine_chunks(),
                    batch.column("o_lang").combine_chunks(),
                    batch.column("g").combine_chunks(),
                    batch.column("doc_id").combine_chunks(),
                ],
                schema=batch.schema,
            )

    rewritten = triples_ds.map_batches(Rewriter, batch_format="pyarrow", concurrency=4)

    # (member, owl:sameAs, rep) assertions — small, built driver-side
    members = [(m, r) for m, r in sorted(rep_map.items()) if m != r]
    if members:
        n = len(members)
        sameas_tbl = pa.Table.from_arrays(
            [
                pa.array([KIND_IRI] * n, pa.int8()),
                pa.array([m for m, _ in members], pa.large_string()),
                pa.array([OWL_SAMEAS] * n, pa.large_string()),
                pa.array([KIND_IRI] * n, pa.int8()),
                pa.array([r for _, r in members], pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([run_doc_id] * n, pa.large_string()),
            ],
            schema=TRIPLE_SCHEMA,
        )
        rewritten = rewritten.union(rd.from_arrow(sameas_tbl))
    return rewritten
