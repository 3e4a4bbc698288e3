"""OWL forward rules beyond the RDFS/sameAs fragments.

Parity: jena-core reasoner/rulesys with the owl-fb rule set
(etc/owl-fb.rules — inverseOf :424-449 region, symmetricProperty,
transitiveProperty, functionalProperty equality rules). The RETE engine
is not ported; each rule family gets the Ray realization its data shape
needs (SURVEY custom-operator rule):

- owl:inverseOf / owl:SymmetricProperty — per-triple rules: broadcast
  T-box + stateless flat-map kernel (same shape as stages/rdfs.py).
- owl:TransitiveProperty — closure is NOT per-triple: per transitive
  predicate the (s, o) edge set is closed by semi-naive iterative joins
  (ops/paths.py transitive_pairs — frontier ⋈ base per round, min-tag
  dedup), then unioned back as triples.
- owl:FunctionalProperty / InverseFunctionalProperty — derived equality:
  groupby (s, p) [resp. (o, p)] over the fact stream; groups with >1
  object [subject] emit owl:sameAs pairs for stages/sameas.py to close.

Derived triples inherit the graph/doc of their premise where the rule is
per-triple; join-derived closure triples carry doc_id="owl-closure".
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..model import KIND_IRI, KIND_LITERAL, OWL_SAMEAS, RDF_TYPE, TRIPLE_SCHEMA

OWL_NS = "http://www.w3.org/2002/07/owl#"
OWL_INVERSE_OF = OWL_NS + "inverseOf"
OWL_SYMMETRIC = OWL_NS + "SymmetricProperty"
OWL_TRANSITIVE = OWL_NS + "TransitiveProperty"
OWL_FUNCTIONAL = OWL_NS + "FunctionalProperty"
OWL_INV_FUNCTIONAL = OWL_NS + "InverseFunctionalProperty"


class OwlTBox:
    """Schema triples → rule tables (small, broadcastable)."""

    def __init__(self, schema_triples: list[tuple]):
        self.inverse: dict[str, set] = {}
        self.symmetric: set = set()
        self.transitive: set = set()
        self.functional: set = set()
        self.inverse_functional: set = set()
        for t in schema_triples:
            s, p, o = t[1], t[2], t[4]
            if p == OWL_INVERSE_OF:
                self.inverse.setdefault(s, set()).add(o)
                self.inverse.setdefault(o, set()).add(s)  # symmetric rule
            elif p == RDF_TYPE:
                if o == OWL_SYMMETRIC:
                    self.symmetric.add(s)
                elif o == OWL_TRANSITIVE:
                    self.transitive.add(s)
                elif o == OWL_FUNCTIONAL:
                    self.functional.add(s)
                elif o == OWL_INV_FUNCTIONAL:
                    self.inverse_functional.add(s)


def _swapped(x: pa.Table, new_p: str) -> pa.Table:
    """(s p o) → (o new_p s) emission table (inverse/symmetric rules)."""
    n = x.num_rows
    blank = pa.array([""] * n, pa.large_string())
    return pa.Table.from_arrays(
        [
            x.column("o_kind").combine_chunks(),
            x.column("o_lex").combine_chunks(),
            pa.array([new_p] * n, pa.large_string()),
            x.column("s_kind").combine_chunks(),
            x.column("s_lex").combine_chunks(),
            blank,
            blank,
            x.column("g").combine_chunks(),
            x.column("doc_id").combine_chunks(),
        ],
        schema=TRIPLE_SCHEMA,
    )


def _stream_kernel(batch: pa.Table, tbox: OwlTBox, include_input: bool) -> pa.Table:
    """Vectorized per-triple OWL rules (VERDICT r2 #4): one pyarrow filter
    per rule-relevant predicate present in the batch, column-swapped
    emission tables, in-batch full-row dedup via group_by."""
    from .rdfs import _dedup_batch, _empty_triples

    parts: list[pa.Table] = []
    if include_input:
        parts.append(batch)
    if batch.num_rows:
        rule_preds = set(pc.unique(batch.column("p")).to_pylist()) & (
            set(tbox.inverse) | tbox.symmetric
        )
        if rule_preds:
            res = batch.filter(
                pc.not_equal(batch.column("o_kind"),
                             pa.scalar(KIND_LITERAL, pa.int8()))
            )
            for p_val in sorted(rule_preds):
                x = res.filter(pc.equal(res.column("p"), p_val))
                if x.num_rows == 0:
                    continue
                # inverseOf: (s p o) → (o q s) for every declared inverse q
                for q in sorted(tbox.inverse.get(p_val, ())):
                    parts.append(_swapped(x, q))
                # SymmetricProperty: (s p o) → (o p s)
                if p_val in tbox.symmetric:
                    parts.append(_swapped(x, p_val))
    return _dedup_batch(parts) if parts else _empty_triples()


def _closure_triples(triples_ds, pred: str, max_rounds: int | None = None):
    """Transitive closure of one predicate's edge set → NEW triples only."""
    from ..ops.paths import transitive_pairs

    def to_pairs(t: pa.Table) -> pa.Table:
        x = t.filter(
            pc.and_(
                pc.equal(t["p"], pred),
                pc.not_equal(t["o_kind"], pa.scalar(KIND_LITERAL, pa.int8())),
            )
        )
        return pa.table(
            {
                "start": x["s_lex"].combine_chunks().cast(pa.large_string()),
                "end": x["o_lex"].combine_chunks().cast(pa.large_string()),
            }
        )

    pairs = triples_ds.map_batches(to_pairs, batch_format="pyarrow")
    closed = transitive_pairs(pairs, max_rounds=max_rounds)

    def to_triples(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.Table.from_arrays(
                [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
            )
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                pa.array([KIND_IRI] * n, pa.int8()),
                t["start"].combine_chunks(),
                pa.array([pred] * n, pa.large_string()),
                pa.array([KIND_IRI] * n, pa.int8()),
                t["end"].combine_chunks(),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array(["owl-closure"] * n, pa.large_string()),
            ],
            schema=TRIPLE_SCHEMA,
        )

    return closed.map_batches(to_triples, batch_format="pyarrow")


def functional_equalities(triples_ds, tbox: OwlTBox):
    """FunctionalProperty / InverseFunctionalProperty → owl:sameAs triples
    (to be closed by stages/sameas.py). One groupby per direction."""
    import ray.data as rd

    outs = []

    def build(preds: set, key_cols, val_col, val_kind_col):
        if not preds:
            return None
        plist = sorted(preds)

        def relevant(t: pa.Table) -> pa.Table:
            x = t.filter(
                pc.and_(
                    pc.is_in(t["p"], value_set=pa.array(plist, t["p"].type)),
                    pc.not_equal(t["o_kind"], pa.scalar(KIND_LITERAL, pa.int8())),
                )
            )
            return pa.table(
                {
                    "k1": x[key_cols[0]].combine_chunks().cast(pa.large_string()),
                    "p": x["p"].combine_chunks().cast(pa.large_string()),
                    "v": x[val_col].combine_chunks().cast(pa.large_string()),
                }
            )

        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            vals = sorted(set(g["v"]))
            if len(vals) < 2:
                return pd.DataFrame({"a": [], "b": []}).astype(str)
            # chain pairing: (v0,v1),(v1,v2)... — sameAs closure connects
            return pd.DataFrame({"a": vals[:-1], "b": vals[1:]})

        return (
            triples_ds.map_batches(relevant, batch_format="pyarrow")
            .groupby(["k1", "p"])
            .map_groups(pairs, batch_format="pandas")
        )

    fwd = build(tbox.functional, ("s_lex",), "o_lex", "o_kind")
    if fwd is not None:
        outs.append(fwd)
    inv = build(tbox.inverse_functional, ("o_lex",), "s_lex", "s_kind")
    if inv is not None:
        outs.append(inv)
    if not outs:
        return rd.from_arrow(
            pa.table({"a": pa.array([], pa.large_string()),
                      "b": pa.array([], pa.large_string())})
        )
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)

    def to_sameas(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.Table.from_arrays(
                [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
            )
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                pa.array([KIND_IRI] * n, pa.int8()),
                t["a"].combine_chunks().cast(pa.large_string()),
                pa.array([OWL_SAMEAS] * n, pa.large_string()),
                pa.array([KIND_IRI] * n, pa.int8()),
                t["b"].combine_chunks().cast(pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array(["owl-eq"] * n, pa.large_string()),
            ],
            schema=TRIPLE_SCHEMA,
        )

    return ds.map_batches(to_sameas, batch_format="pyarrow")


def owl_inference(triples_ds, schema_triples: list[tuple], *,
                  include_input: bool = True, max_rounds: int | None = None):
    """Apply the OWL rule families; returns a triple Dataset (may contain
    duplicates across batches — follow with exact_dedup)."""
    import ray

    from .rdfs import _TBOX_CACHE

    tbox = OwlTBox(schema_triples)
    tbox_ref = ray.put(tbox)

    # stateless tasks + per-worker broadcast cache (see rdfs.py) — actor
    # pool spin-up dominated small rule workloads
    def kernel(batch: pa.Table) -> pa.Table:
        key = tbox_ref.hex()
        tb = _TBOX_CACHE.get(key)
        if tb is None:
            _TBOX_CACHE.clear()
            tb = _TBOX_CACHE[key] = ray.get(tbox_ref)
        return _stream_kernel(batch, tb, include_input)

    out = triples_ds.map_batches(kernel, batch_format="pyarrow")
    if tbox.transitive:
        # closure sees the streamed output (inverse/symmetric edges count)
        out = out.materialize()
        for pred in sorted(tbox.transitive):
            out = out.union(_closure_triples(out, pred, max_rounds=max_rounds))
    eq = functional_equalities(triples_ds, tbox)
    if tbox.functional or tbox.inverse_functional:
        out = out.union(eq)
    return out
