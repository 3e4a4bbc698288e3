"""Streaming RDFS inference — materialize entailments as a flat-map.

Parity: jena-arq/.../rdfs/RDFSFactory.java (stream wrapper
InfStreamRDFS.java, per-triple rule application rdfs/engine/ApplyRDFS.java,
precomputed T-box closures rdfs/setup/). Semantics implemented (the
data-side RDFS subset the reference streams):

  rdfs2:  (p domain C)  + (s p o)        → (s rdf:type C)
  rdfs3:  (p range C)   + (s p o), o IRI/bnode → (o rdf:type C)
  rdfs5:  subPropertyOf transitivity     (T-box closure, driver-side)
  rdfs7:  (p subPropertyOf q) + (s p o)  → (s q o)
  rdfs9:  (C subClassOf D) + (s type C)  → (s type D)
  rdfs11: subClassOf transitivity        (T-box closure, driver-side)

The T-box (schema triples) is small: its transitive closures are computed
on the driver and broadcast via ray.put; the A-box streams through a
stateless flat-map batch kernel — 1 triple in, N out (SURVEY §2.3 row
"RDFS inference").
"""

from __future__ import annotations

import pyarrow as pa

from ..model import KIND_IRI, KIND_LITERAL, RDF_TYPE, RDFS_NS, TRIPLE_SCHEMA

RDFS_SUBCLASSOF = RDFS_NS + "subClassOf"
RDFS_SUBPROPERTYOF = RDFS_NS + "subPropertyOf"
RDFS_DOMAIN = RDFS_NS + "domain"
RDFS_RANGE = RDFS_NS + "range"


def transitive_closure(pairs: list[tuple[str, str]]) -> dict[str, set]:
    """closure[x] = every y reachable from x (driver-side; T-box is small)."""
    direct: dict[str, set] = {}
    for a, b in pairs:
        direct.setdefault(a, set()).add(b)
    closure: dict[str, set] = {}

    def dfs(x: str, seen: set):
        for y in direct.get(x, ()):
            if y not in seen:
                seen.add(y)
                dfs(y, seen)

    for x in direct:
        seen: set = set()
        dfs(x, seen)
        closure[x] = seen
    return closure


class TBox:
    """Precomputed schema closures (rdfs/setup/ analog)."""

    def __init__(self, schema_triples: list[tuple]):
        sub_class, sub_prop = [], []
        self.domain: dict[str, set] = {}
        self.range: dict[str, set] = {}
        for t in schema_triples:
            s, p, o = t[1], t[2], t[4]
            if p == RDFS_SUBCLASSOF:
                sub_class.append((s, o))
            elif p == RDFS_SUBPROPERTYOF:
                sub_prop.append((s, o))
            elif p == RDFS_DOMAIN:
                self.domain.setdefault(s, set()).add(o)
            elif p == RDFS_RANGE:
                self.range.setdefault(s, set()).add(o)
        self.sub_class = transitive_closure(sub_class)
        self.sub_prop = transitive_closure(sub_prop)
        # per-predicate class emission sets with the subclass closure
        # folded in (rdfs2+9 / rdfs3+9 in one lookup) — lets the batch
        # kernel emit one constant-class column block per (pred, class)
        self.domain_cl = {
            p: tuple(sorted(set().union(
                *({c} | self.sub_class.get(c, set()) for c in cs))))
            for p, cs in self.domain.items()
        }
        self.range_cl = {
            p: tuple(sorted(set().union(
                *({c} | self.sub_class.get(c, set()) for c in cs))))
            for p, cs in self.range.items()
        }


def _empty_triples() -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
    )


def _const(n: int, v) -> pa.Array:
    return pa.array([v] * n, pa.large_string())


def _repred(x: pa.Table, q: str) -> pa.Table:
    """(s p o) → (s q o): one column swapped for a constant predicate."""
    return pa.Table.from_arrays(
        [
            x.column("s_kind").combine_chunks(),
            x.column("s_lex").combine_chunks(),
            _const(x.num_rows, q),
            x.column("o_kind").combine_chunks(),
            x.column("o_lex").combine_chunks(),
            x.column("o_datatype").combine_chunks(),
            x.column("o_lang").combine_chunks(),
            x.column("g").combine_chunks(),
            x.column("doc_id").combine_chunks(),
        ],
        schema=TRIPLE_SCHEMA,
    )


def _typed(x: pa.Table, kind_col: str, lex_col: str, cls: str) -> pa.Table:
    """(term rdf:type cls) rows from one side of the input triples."""
    n = x.num_rows
    return pa.Table.from_arrays(
        [
            x.column(kind_col).combine_chunks(),
            x.column(lex_col).combine_chunks(),
            _const(n, RDF_TYPE),
            pa.array([KIND_IRI] * n, pa.int8()),
            _const(n, cls),
            _const(n, ""),
            _const(n, ""),
            x.column("g").combine_chunks(),
            x.column("doc_id").combine_chunks(),
        ],
        schema=TRIPLE_SCHEMA,
    )


def _dedup_batch(parts: list[pa.Table]) -> pa.Table:
    """Concat rule emissions + in-batch REDUCED-style dedup (full-row
    group_by — the distinct set is unchanged; exact_dedup downstream owns
    global set semantics)."""
    tbl = pa.concat_tables([p.select(TRIPLE_SCHEMA.names) for p in parts])
    if tbl.num_rows == 0:
        return _empty_triples()
    out = tbl.group_by(TRIPLE_SCHEMA.names, use_threads=False).aggregate([])
    return pa.Table.from_arrays(
        [out.column(n).combine_chunks().cast(TRIPLE_SCHEMA.field(n).type)
         for n in TRIPLE_SCHEMA.names],
        schema=TRIPLE_SCHEMA,
    )


def infer_batch(batch: pa.Table, tbox: TBox, include_input: bool = True) -> pa.Table:
    """Stateless flat-map kernel: apply RDFS rules to the A-box batch.

    Fully vectorized (VERDICT r2 #4): per rule-relevant predicate one
    pyarrow filter, then constant-column emission tables per rule family
    — no per-row Python in the hot path. The T-box lookups drive which
    (tiny) set of filters run; predicates absent from the batch are
    skipped via one unique() pass."""
    import pyarrow.compute as pc

    parts: list[pa.Table] = []
    if include_input:
        parts.append(batch)
    if batch.num_rows == 0:
        return _dedup_batch(parts) if parts else _empty_triples()

    batch_preds = set(pc.unique(batch.column("p")).to_pylist())
    rule_preds = batch_preds & (
        set(tbox.sub_prop) | set(tbox.domain_cl) | set(tbox.range_cl)
    )
    lit = pa.scalar(KIND_LITERAL, pa.int8())
    for p_val in sorted(rule_preds):
        x = batch.filter(pc.equal(batch.column("p"), p_val))
        # rdfs7 + the superproperties' own domain/range (rdfs2/3 apply to
        # every predicate in the subPropertyOf closure chain)
        preds = [p_val] + sorted(tbox.sub_prop.get(p_val, ()))
        for q in preds[1:]:
            parts.append(_repred(x, q))
        x_res = None
        for q in preds:
            for c in tbox.domain_cl.get(q, ()):  # rdfs2 (+9 folded in)
                parts.append(_typed(x, "s_kind", "s_lex", c))
            rng = tbox.range_cl.get(q, ())
            if rng and x_res is None:
                x_res = x.filter(pc.not_equal(x.column("o_kind"), lit))
            for c in rng:  # rdfs3 (+9 folded in; object must be a resource)
                parts.append(_typed(x_res, "o_kind", "o_lex", c))
    # rdfs9: explicit rdf:type assertions
    if RDF_TYPE in batch_preds and tbox.sub_class:
        ty = batch.filter(
            pc.and_(
                pc.equal(batch.column("p"), RDF_TYPE),
                pc.equal(batch.column("o_kind"), pa.scalar(KIND_IRI, pa.int8())),
            )
        )
        if ty.num_rows:
            classes = set(pc.unique(ty.column("o_lex")).to_pylist()) & set(
                tbox.sub_class
            )
            for c in sorted(classes):
                xc = ty.filter(pc.equal(ty.column("o_lex"), c))
                for d in sorted(tbox.sub_class[c]):
                    parts.append(_typed(xc, "s_kind", "s_lex", d))
    return _dedup_batch(parts) if parts else _empty_triples()


# per-worker-process broadcast cache (same pattern as sameas.rewrite):
# stateless TASKS instead of an actor pool — pool spin-up alone costs
# seconds and dominates small rule workloads, while the broadcast T-box
# deserializes once per worker via this cache
_TBOX_CACHE: dict = {}


def rdfs_inference(triples_ds, schema_triples: list[tuple], include_input=True):
    """Broadcast the T-box once (ray.put), stream the A-box through the
    rule kernel. Output may contain duplicates across batches — follow
    with exact_dedup for set semantics."""
    import ray

    tbox_ref = ray.put(TBox(schema_triples))

    def kernel(batch: pa.Table) -> pa.Table:
        key = tbox_ref.hex()
        tbox = _TBOX_CACHE.get(key)
        if tbox is None:
            _TBOX_CACHE.clear()
            tbox = _TBOX_CACHE[key] = ray.get(tbox_ref)
        return infer_batch(batch, tbox, include_input)

    return triples_ds.map_batches(kernel, batch_format="pyarrow")
