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

# per-worker-process broadcast cache (see rewrite_with_reps)
_REP_CACHE: dict = {}


def _combine(x):
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x


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


def components_distributed(edges_ds, max_rounds: int | None = None,
                           num_partitions: int | None = None):
    """Label-propagation closure entirely in Dataset algebra.

    Returns a Dataset (node, rep). Per round:
      1. neighbor-min: candidates = edges ⋈ labels (hash join on node),
         then groupby(node).min over labels ∪ propagated candidates
      2. pointer-jump: label ← label(label) via a left-outer self-join,
         halving the remaining diameter → O(log d) rounds total
    The (small) label table is materialized each round — without this the
    lazy lineage would re-execute all prior rounds every iteration.
    Convergence = per-round signature of the label table reaching a
    fixpoint: a per-block partial sum of deterministic vectorized row
    hashes (map_batches kernel) combined by a Sum aggregate — an
    order-independent commutative fold, so it needs no sort and never
    moves label rows to the driver.
    """
    import numpy as np

    _SIG_MOD = (1 << 56) - 5  # partials sum within int64 across many blocks

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks().cast(pa.large_string())
        b = batch.column("b").combine_chunks().cast(pa.large_string())
        return pa.Table.from_arrays(
            [pa.concat_arrays([a, b]), pa.concat_arrays([b, a])],
            names=["node", "peer"],
        )

    def _relabel_ls(names):
        # groupby emits `string` keys even from large_string input, and
        # acero joins refuse mixed key types — rename AND re-cast
        def f(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [t.column(i).combine_chunks().cast(pa.large_string())
                 for i in range(len(names))],
                names=list(names),
            )

        return f

    from ..util import compact_blocks

    def _sig_kernel(t: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(
            t.column("node").cast(pa.large_string()),
            t.column("label").cast(pa.large_string()),
            pa.scalar("\x00", pa.large_string()),
        )
        # pd.util.hash_array is siphash with a fixed key — deterministic
        # across worker processes (builtin hash() is not), vectorized in C.
        h = pd.util.hash_array(np.asarray(joined.to_pylist(), dtype=object))
        partial = int(h.astype(object).sum()) % _SIG_MOD
        return pa.Table.from_arrays([pa.array([partial], pa.int64())], names=["partial"])

    def compact_with_sig(ds):
        """Materialize (cutting lineage), drop empty blocks by metadata
        (labels stay in the object store), and reduce the convergence
        signature distributed."""
        compacted = compact_blocks(ds)
        total = compacted.map_batches(_sig_kernel, batch_format="pyarrow").sum(
            "partial"
        )
        acc = (total or 0) % _SIG_MOD
        return compacted, acc

    edges = compact_blocks(
        edges_ds.map_batches(symmetrize, batch_format="pyarrow")
    )
    if num_partitions is None:
        # Per-execution overhead scales with block/partition count, so
        # size the join fan-out to the data: ~2M edge rows per partition,
        # floor 1 (tiny graphs run essentially single-block).
        n_edges = edges.count()
        num_partitions = max(1, min(64, n_edges // 2_000_000))

    # initial labels: node → min(node, min(peers)) in one groupby
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
        .map_batches(_relabel_ls(["node", "label"]), batch_format="pyarrow")
    )
    labels, prev_sig = compact_with_sig(labels)
    rounds = 0
    while True:
        # runs to the signature fixpoint by default (O(log diameter)
        # rounds with pointer jumping); an explicit cap raises rather
        # than silently returning unconverged labels
        if max_rounds is not None and rounds >= max_rounds:
            raise RuntimeError(
                f"components_distributed: round cap {max_rounds} hit "
                "before the label fixpoint — raise max_rounds or pass None"
            )
        rounds += 1
        # 1. neighbor-min: peer receives the node's current label
        def _cand_kernel(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return pa.Table.from_arrays(
                    [pa.array([], pa.large_string()), pa.array([], pa.large_string())],
                    names=["node", "label"],
                )
            return pa.Table.from_arrays(
                [t.column("peer").combine_chunks(), t.column("label").combine_chunks()],
                names=["node", "label"],
            )

        cand = edges.join(
            labels, join_type="inner", num_partitions=num_partitions, on=("node",)
        ).map_batches(_cand_kernel, batch_format="pyarrow")
        merged = (
            labels.union(cand)
            .groupby("node")
            .min("label")
            .map_batches(_relabel_ls(["node", "label"]), batch_format="pyarrow")
        )

        # 2. pointer jump: label ← label(label)
        lab_as_node = labels.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node").combine_chunks(), t.column("label").combine_chunks()],
                names=["label", "label2"],
            ),
            batch_format="pyarrow",
        )
        jumped = merged.join(
            lab_as_node,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("label",),
        ).map_batches(
            lambda t: pa.Table.from_arrays(
                [pa.array([], pa.large_string()), pa.array([], pa.large_string())],
                names=["node", "label"],
            )
            if t.num_columns == 0
            else pa.Table.from_arrays(
                [
                    t.column("node").combine_chunks(),
                    _combine(pc.coalesce(
                        t.column("label2").combine_chunks(),
                        t.column("label").combine_chunks(),
                    )),
                ],
                names=["node", "label"],
            ),
            batch_format="pyarrow",
        )

        labels, sig = compact_with_sig(jumped)
        if sig == prev_sig:
            break
        prev_sig = sig
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "rep"]), batch_format="pyarrow"
    )


def rewrite_with_reps_ds(triples_ds, reps_ds, run_doc_id: str = "",
                         num_partitions: int | None = None):
    """Join-based rewrite for when the rep map is NOT driver-sized.

    ``reps_ds`` is a (node, rep) Dataset (``components_distributed``
    output). The stream is rewritten by two left-outer hash joins — one
    on s_lex, one on o_lex — with the representative coalesced in only
    for IRI terms; the (member, owl:sameAs, rep) assertions are emitted
    distributed from the reps Dataset. No structure proportional to the
    equivalence graph ever lands on the driver."""
    from ..util import compact_blocks

    def _clean_reps(t: pa.Table) -> pa.Table:
        # groupby upstream may downgrade large_string → string; acero
        # joins refuse mixed key types, so re-cast both columns
        return pa.table(
            {
                "__node": t.column("node").combine_chunks().cast(pa.large_string()),
                "__rep": t.column("rep").combine_chunks().cast(pa.large_string()),
            }
        )

    reps = compact_blocks(reps_ds.map_batches(_clean_reps, batch_format="pyarrow"))

    base = compact_blocks(
        triples_ds.map_batches(
            lambda t: t.filter(pc.not_equal(t.column("p"), OWL_SAMEAS)),
            batch_format="pyarrow",
        )
    )
    if num_partitions is None:
        num_partitions = max(1, min(64, base.count() // 2_000_000))

    names = TRIPLE_SCHEMA.names

    def _rebuild(pos_lex: str, pos_kind: str):
        def kernel(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.Table.from_arrays(
                    [pa.array([], f.type) for f in TRIPLE_SCHEMA],
                    schema=TRIPLE_SCHEMA,
                )
            rep = t.column("__rep").combine_chunks()
            lex = t.column(pos_lex).combine_chunks().cast(pa.large_string())
            is_iri = pc.equal(
                t.column(pos_kind), pa.scalar(KIND_IRI, pa.int8())
            ).combine_chunks()
            new_lex = pc.if_else(pc.and_(is_iri, pc.is_valid(rep)), rep, lex)
            cols = {}
            for n in names:
                if n == pos_lex:
                    cols[n] = _combine(new_lex)
                else:
                    cols[n] = t.column(n).combine_chunks().cast(
                        TRIPLE_SCHEMA.field(n).type
                    )
            return pa.Table.from_arrays([cols[n] for n in names], schema=TRIPLE_SCHEMA)

        return kernel

    j1 = base.join(
        reps, join_type="left_outer", num_partitions=num_partitions,
        on=("s_lex",), right_on=("__node",),
    ).map_batches(_rebuild("s_lex", "s_kind"), batch_format="pyarrow")
    j2 = compact_blocks(j1).join(
        reps, join_type="left_outer", num_partitions=num_partitions,
        on=("o_lex",), right_on=("__node",),
    ).map_batches(_rebuild("o_lex", "o_kind"), batch_format="pyarrow")

    def _assert_rows(t: pa.Table) -> pa.Table:
        x = t.filter(pc.not_equal(t.column("__node"), t.column("__rep")))
        n = x.num_rows
        return pa.Table.from_arrays(
            [
                pa.array([KIND_IRI] * n, pa.int8()),
                x.column("__node").combine_chunks(),
                pa.array([OWL_SAMEAS] * n, pa.large_string()),
                pa.array([KIND_IRI] * n, pa.int8()),
                x.column("__rep").combine_chunks(),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([run_doc_id] * n, pa.large_string()),
            ],
            schema=TRIPLE_SCHEMA,
        )

    assertions = reps.map_batches(_assert_rows, batch_format="pyarrow")
    return j2.union(assertions)


def rewrite_with_reps(triples_ds, rep_map: dict[str, str], run_doc_id: str = ""):
    """Broadcast the rep map (ray.put once) and rewrite the stream."""
    import ray
    import ray.data as rd

    rep_ref = ray.put(rep_map)

    # Stateless tasks (not an actor pool — no CPU reservation/starvation):
    # the broadcast map is fetched from the LOCAL object store and cached
    # per worker process (module-level cache survives across task calls in
    # the same worker), so it deserializes once per worker.
    def rewriter(batch: pa.Table) -> pa.Table:
        key = rep_ref.hex()
        rep = _REP_CACHE.get(key)
        if rep is None:
            _REP_CACHE.clear()
            rep = _REP_CACHE[key] = ray.get(rep_ref)
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

    rewritten = triples_ds.map_batches(
        rewriter, batch_format="pyarrow", batch_size=65536
    )

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
