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


def infer_batch(batch: pa.Table, tbox: TBox, include_input: bool = True) -> pa.Table:
    """Stateless flat-map kernel: apply RDFS rules to every A-box triple."""
    cols = {name: batch.column(name).to_pylist() for name in TRIPLE_SCHEMA.names}
    out: dict[str, list] = {name: [] for name in TRIPLE_SCHEMA.names}
    seen_out: set = set()

    def emit(s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g, doc):
        key = (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g)
        if key in seen_out:
            return
        seen_out.add(key)
        out["s_kind"].append(s_kind)
        out["s_lex"].append(s_lex)
        out["p"].append(p)
        out["o_kind"].append(o_kind)
        out["o_lex"].append(o_lex)
        out["o_datatype"].append(o_dt)
        out["o_lang"].append(o_lang)
        out["g"].append(g)
        out["doc_id"].append(doc)

    n = len(batch)
    for i in range(n):
        s_kind, s_lex = cols["s_kind"][i], cols["s_lex"][i]
        p = cols["p"][i]
        o_kind, o_lex = cols["o_kind"][i], cols["o_lex"][i]
        o_dt, o_lang = cols["o_datatype"][i], cols["o_lang"][i]
        g, doc = cols["g"][i], cols["doc_id"][i]
        if include_input:
            emit(s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g, doc)
        # rdfs7: superproperties (then their domains/ranges apply too)
        preds = [p] + sorted(tbox.sub_prop.get(p, ()))
        for q in preds:
            if q != p:
                emit(s_kind, s_lex, q, o_kind, o_lex, o_dt, o_lang, g, doc)
            # rdfs2 + rdfs9
            for c in sorted(tbox.domain.get(q, ())):
                emit(s_kind, s_lex, RDF_TYPE, KIND_IRI, c, "", "", g, doc)
                for d in sorted(tbox.sub_class.get(c, ())):
                    emit(s_kind, s_lex, RDF_TYPE, KIND_IRI, d, "", "", g, doc)
            # rdfs3 + rdfs9 (object must be a resource)
            if o_kind != KIND_LITERAL:
                for c in sorted(tbox.range.get(q, ())):
                    emit(o_kind, o_lex, RDF_TYPE, KIND_IRI, c, "", "", g, doc)
                    for d in sorted(tbox.sub_class.get(c, ())):
                        emit(o_kind, o_lex, RDF_TYPE, KIND_IRI, d, "", "", g, doc)
        # rdfs9: explicit rdf:type assertions
        if p == RDF_TYPE and o_kind == KIND_IRI:
            for d in sorted(tbox.sub_class.get(o_lex, ())):
                emit(s_kind, s_lex, RDF_TYPE, KIND_IRI, d, "", "", g, doc)
    return pa.Table.from_arrays(
        [pa.array(out[f.name], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
    )


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
