"""Minimal BGP (basic graph pattern) match engine over the triple table.

Reference semantics: jena-arq sparql/engine/main/OpExecutor.java:127-464 +
StageMatchTriple.java (substitution matching) and the solver chain
QueryIterBlockTriples: a BGP is a conjunction of triple patterns solved
left-to-right, each pattern joining its bindings with the accumulated
solution set. The Ray realization makes the join explicit:

    per pattern:  filter the triple Dataset on the pattern's constants
                  (one vectorized map_batches), project its variables to
                  binding columns
    accumulate:   hash join on the shared variables (Dataset.join),
                  cartesian-free — patterns must be connected through
                  shared vars (the planner reorders to guarantee it)

Pattern join order: patterns are greedily reordered so each next pattern
shares ≥1 variable with the already-joined prefix (most-constants first
as the seed) — the reference's ReorderLib.fixed() heuristic analog.

Bindings are lexical forms (s_lex/p/o_lex). With ``with_meta=True`` each
variable additionally carries hidden term-metadata columns —
``{v}__kind`` (int8 node kind), ``{v}__dt`` (datatype IRI), ``{v}__lang``
(language tag) — sourced from the triple table when present, defaulted
otherwise. These drive term-typed FILTER comparison and SPARQL term
ordering in the front door (NodeValue.java / BindingComparator.java
semantics) and are never part of the join key or the projected output.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from ..util import compact_blocks


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Lit:
    """A literal constant in a triple-pattern object position with its
    term-type constraints (StageMatchTriple matches by sameTerm, so
    `?x :p 1` must NOT match "1"^^xsd:string or "01"^^xsd:integer).

    ``dts``: allowed datatype IRIs ("" = the engine's untyped tabular
    convention), or None for no datatype constraint. ``lang``: exact
    language tag ("" = must have none), or None for no constraint."""

    lex: str
    dts: tuple | None = None
    lang: str | None = None


@dataclass(frozen=True)
class TTPat:
    """RDF 1.2 triple-term pattern in a triple-pattern OBJECT position
    (SPARQL 1.2 `<<( s p o )>>`; reified-triple sugar desugars to
    `reifier rdf:reifies TTPat(...)`). Components are Var | IRI str |
    Lit | nested TTPat. Matching destructures the serialized
    KIND_TRIPLE_TERM lex per row (gated to kind==3 rows)."""

    s: object
    p: object
    o: object


def _term_var_names(t) -> list[str]:
    if isinstance(t, Var):
        return [t.name]
    if isinstance(t, TTPat):
        return (_term_var_names(t.s) + _term_var_names(t.p)
                + _term_var_names(t.o))
    return []


def tt_ground_lex(tp: TTPat) -> str | None:
    """Serialized inner-triple lex of a variable-free TTPat (the fast
    constant-match path), or None when it contains variables."""
    from ..model import KIND_IRI, KIND_LITERAL, KIND_TRIPLE_TERM
    from ..rdf.tripleterm import serialize_tt

    def term(n):
        if isinstance(n, Var):
            return None
        if isinstance(n, TTPat):
            inner = tt_ground_lex(n)
            return None if inner is None else (KIND_TRIPLE_TERM, inner,
                                               "", "")
        if isinstance(n, Lit):
            dt = next((d for d in (n.dts or ()) if d), "")
            return (KIND_LITERAL, n.lex, dt, n.lang or "")
        if hasattr(n, "label"):  # template BNode (sparql.BNode)
            from ..model import KIND_BNODE

            return (KIND_BNODE, n.label, "", "")
        return (KIND_IRI, n, "", "")

    s, p, o = term(tp.s), term(tp.p), term(tp.o)
    if s is None or p is None or o is None:
        return None
    return serialize_tt(s, p, o)


def _tt_match(lex: str, tp: TTPat, binds: dict) -> bool:
    """Destructure one serialized triple term against a TTPat,
    accumulating inner-variable bindings (term tuples) into ``binds``;
    within-pattern duplicate vars must bind the same term (sameTerm)."""
    from ..model import (KIND_IRI, KIND_LITERAL, KIND_TRIPLE_TERM,
                         XSD_STRING)
    from ..rdf.tripleterm import parse_tt

    try:
        comps = parse_tt(lex)
    except Exception:
        return False
    for comp, node in zip(comps, (tp.s, tp.p, tp.o)):
        if isinstance(node, Var):
            prev = binds.get(node.name)
            if prev is not None:
                if prev[0] != comp[0] or prev[1] != comp[1]:
                    return False
            else:
                binds[node.name] = comp
        elif isinstance(node, TTPat):
            if comp[0] != KIND_TRIPLE_TERM or not _tt_match(
                    comp[1], node, binds):
                return False
        elif isinstance(node, Lit):
            if comp[0] != KIND_LITERAL or comp[1] != node.lex:
                return False
            dt = "" if comp[2] == XSD_STRING else comp[2]
            if node.dts is not None and not any(
                    dt == ("" if d == XSD_STRING else d) for d in node.dts):
                return False
            if node.lang is not None and (
                    (comp[3] or "").lower() != node.lang.lower()):
                return False
        else:  # IRI constant
            if comp[0] != KIND_IRI or comp[1] != node:
                return False
    return True


# hidden per-variable term-metadata column suffixes (see module docstring)
META_SUFFIXES = ("__kind", "__dt", "__lang")


def meta_cols_of(v: str) -> tuple[str, str, str]:
    return (v + "__kind", v + "__dt", v + "__lang")


def is_meta_col(name: str) -> bool:
    return name.endswith(META_SUFFIXES)


def _is_var(t) -> bool:
    return isinstance(t, Var)


def _pattern_vars(pat) -> list[str]:
    out: list[str] = []
    for t in pat:
        out.extend(_term_var_names(t))
    return out


def _order_patterns(patterns, sources=None):
    """Greedy connected ordering: seed = most constants; each next pattern
    must share a variable with the prefix when possible. A disconnected
    BGP (no pattern shares a variable — a cartesian product, which
    SPARQL permits) appends the most-constant remaining pattern and the
    join chain cross-joins it; scale note: the product is the query's
    own semantics, output size multiplies.

    ``sources`` (optional, aligned with ``patterns``): a per-pattern
    triple Dataset override, carried through the reorder. Returns a list
    of (pattern, source) pairs (source None = the default dataset)."""
    items = list(zip(patterns, sources or [None] * len(patterns)))
    if not items:
        return []
    items.sort(key=lambda it: (-sum(0 if _is_var(t) else 1 for t in it[0]),))
    ordered = [items.pop(0)]
    bound = set(_pattern_vars(ordered[0][0]))
    while items:
        for i, (p, _src) in enumerate(items):
            if bound & set(_pattern_vars(p)):
                ordered.append(items.pop(i))
                bound |= set(_pattern_vars(ordered[-1][0]))
                break
        else:
            ordered.append(items.pop(0))
            bound |= set(_pattern_vars(ordered[-1][0]))
    return ordered


def _bindings_for_pattern(triples_ds, pat, graph=None, with_meta: bool = False):
    """One triple pattern → Dataset of bindings (one column per var).

    ``graph``: None = union-default-graph mode (no constraint — matches
    the engine's one-table model and Jena's unionDefaultGraph); a string
    = only that named graph; a Var = named graphs only, graph name bound
    (GRAPH ?g semantics — the shared g var forces same-graph joins).

    An all-constant pattern (no variable positions) yields the UNIT
    relation: one ``__exists`` marker row per matching triple — Jena's
    StageMatchTriple returns one empty binding per match; the marker
    column preserves the row count that a zero-column table would lose."""
    from ..model import KIND_IRI, KIND_LITERAL

    s, p, o = pat
    # (var, source column, position tag) per VARIABLE POSITION —
    # duplicates preserved so ?x p ?x becomes a within-pattern equality
    positions = []
    if _is_var(s):
        positions.append((s.name, "s_lex", "s"))
    if _is_var(p):
        positions.append((p.name, "p", "p"))
    if _is_var(o):
        positions.append((o.name, "o_lex", "o"))
    if _is_var(graph):
        positions.append((graph.name, "g", "g"))
    # triple-term pattern in the subject/object position: ground →
    # constant lex fast path; with vars → per-row destructure (kind==3
    # only; RDF 1.2 Full admits triple-term subjects — the SPARQL 1.2
    # grammar does, syntax-triple-terms-positive subject-tripleterm)
    tt_o = o if isinstance(o, TTPat) else None
    tt_ground = tt_ground_lex(tt_o) if tt_o is not None else None
    tt_s = s if isinstance(s, TTPat) else None
    tt_s_ground = tt_ground_lex(tt_s) if tt_s is not None else None
    inner_vars = sorted(
        (set(_term_var_names(tt_o))
         if tt_o is not None and tt_ground is None else set())
        | (set(_term_var_names(tt_s))
           if tt_s is not None and tt_s_ground is None else set()))
    var_names = sorted({v for v, _, _ in positions} | set(inner_vars))

    out_names = var_names or ["__exists"]

    def _empty_out() -> pa.Table:
        cols: dict[str, pa.Array] = {}
        for v in out_names:
            cols[v] = pa.array([], pa.large_string())
            if with_meta and v != "__exists":
                kc, dc, lc = meta_cols_of(v)
                cols[kc] = pa.array([], pa.int8())
                cols[dc] = pa.array([], pa.large_string())
                cols[lc] = pa.array([], pa.large_string())
        return pa.table(cols)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return _empty_out()
        mask = None

        def conj(m, cond):
            return cond if m is None else pc.and_(m, cond)

        if tt_s is not None:
            from ..model import KIND_TRIPLE_TERM

            if "s_kind" not in t.schema.names:
                return _empty_out()
            mask = conj(mask, pc.fill_null(pc.equal(
                t["s_kind"], pa.scalar(KIND_TRIPLE_TERM, pa.int8())),
                False))
            if tt_s_ground is not None:
                mask = conj(mask, pc.equal(t["s_lex"], tt_s_ground))
        elif isinstance(s, Lit):
            # ARQ extended syntax allows literal subjects (generalized
            # RDF); stored triples never have one, so this matches only
            # generalized stores — and property functions consume the
            # term before any data match
            mask = conj(mask, pc.equal(t["s_lex"], s.lex))
            if "s_kind" in t.schema.names:
                mask = conj(mask, pc.fill_null(pc.equal(
                    t["s_kind"], pa.scalar(KIND_LITERAL, pa.int8())), True))
        elif not _is_var(s):
            mask = conj(mask, pc.equal(t["s_lex"], s))
        if not _is_var(p):
            mask = conj(mask, pc.equal(t["p"], p))
        if tt_o is not None:
            from ..model import KIND_TRIPLE_TERM

            if "o_kind" not in t.schema.names:
                return _empty_out()
            mask = conj(mask, pc.fill_null(pc.equal(
                t["o_kind"], pa.scalar(KIND_TRIPLE_TERM, pa.int8())), False))
            if tt_ground is not None:
                mask = conj(mask, pc.equal(t["o_lex"], tt_ground))
        elif isinstance(o, Lit):
            mask = conj(mask, pc.equal(t["o_lex"], o.lex))
            names = t.schema.names
            if "o_kind" in names:
                mask = conj(mask, pc.fill_null(pc.equal(
                    t["o_kind"], pa.scalar(KIND_LITERAL, pa.int8())), True))
            if o.dts is not None and "o_datatype" in names:
                mask = conj(mask, pc.is_in(
                    pc.fill_null(
                        t["o_datatype"].combine_chunks().cast(
                            pa.large_string()), ""),
                    value_set=pa.array(list(o.dts), pa.large_string())))
            if o.lang is not None and "o_lang" in names:
                mask = conj(mask, pc.equal(
                    pc.utf8_lower(pc.fill_null(
                        t["o_lang"].combine_chunks().cast(pa.large_string()),
                        "")),
                    o.lang.lower()))
        elif not _is_var(o):
            mask = conj(mask, pc.equal(t["o_lex"], o))
        if isinstance(graph, str):
            # "" = the strict default graph (SPARQL dataset semantics);
            # tabular stores without a g column have no named graphs, so
            # every row is default-graph
            if "g" in t.schema.names:
                mask = conj(mask, pc.equal(t["g"], graph))
            elif graph:
                mask = conj(mask, pa.array([False] * t.num_rows))
        elif _is_var(graph):
            mask = conj(mask, pc.not_equal(t["g"], ""))
        x = t.filter(mask) if mask is not None else t
        by_var: dict[str, list] = {}
        for v, col, _pos in positions:
            by_var.setdefault(v, []).append(col)
        eq_mask = None
        for v, cl in by_var.items():
            for extra in cl[1:]:  # same var twice → equality constraint
                eq_mask = conj(eq_mask, pc.equal(x[cl[0]], x[extra]))
        if eq_mask is not None:
            x = x.filter(eq_mask)
        tt_rows: list[dict] = []
        if inner_vars:
            # destructure the serialized triple term(s) per surviving
            # row (already narrowed to kind==3); a shared binds dict
            # unifies vars across subject and object terms, and
            # outer-position vars that also occur inside a term must
            # agree (sameTerm on lex)
            sides = []
            if tt_s is not None and tt_s_ground is None:
                sides.append((tt_s, x["s_lex"].to_pylist()))
            if tt_o is not None and tt_ground is None:
                sides.append((tt_o, x["o_lex"].to_pylist()))
            overlap = {v: x[by_var[v][0]].to_pylist()
                       for v in by_var if v in set(inner_vars)}
            keep: list[int] = []
            for i in range(x.num_rows):
                binds: dict = {}
                ok = True
                for tp, lexes in sides:
                    lx = lexes[i]
                    if lx is None or not _tt_match(lx, tp, binds):
                        ok = False
                        break
                if not ok:
                    continue
                if any(col[i] != binds[v][1]
                       for v, col in overlap.items() if v in binds):
                    continue
                keep.append(i)
                tt_rows.append(binds)
            x = x.take(pa.array(keep, pa.int64()))
        if not by_var and not inner_vars:
            # all-constant pattern: unit relation, count kept
            return pa.table(
                {"__exists": pa.array(["1"] * x.num_rows, pa.large_string())}
            )
        cols = {
            v: x[cl[0]].combine_chunks().cast(pa.large_string())
            for v, cl in by_var.items()
        }
        for v in inner_vars:
            if v in by_var:
                continue
            cols[v] = pa.array([r[v][1] for r in tt_rows], pa.large_string())
            if with_meta:
                kc, dc, lc = meta_cols_of(v)
                cols[kc] = pa.array([r[v][0] for r in tt_rows], pa.int8())
                cols[dc] = pa.array(
                    [r[v][2] or "" for r in tt_rows], pa.large_string())
                cols[lc] = pa.array(
                    [r[v][3] or "" for r in tt_rows], pa.large_string())
        if with_meta:
            first_pos = {}
            for v, _col, pos in positions:
                first_pos.setdefault(v, pos)
            have = set(x.schema.names)
            n = x.num_rows

            def _col_or(name: str, default, typ):
                if name is not None and name in have:
                    return x[name].combine_chunks().cast(typ)
                return pa.array([default] * n, typ)

            for v, pos in first_pos.items():
                kc, dc, lc = meta_cols_of(v)
                if pos == "s":
                    cols[kc] = _col_or("s_kind", KIND_IRI, pa.int8())
                elif pos == "o":
                    cols[kc] = _col_or("o_kind", KIND_LITERAL, pa.int8())
                else:  # predicate / graph positions are always IRIs
                    cols[kc] = pa.array([KIND_IRI] * n, pa.int8())
                cols[dc] = _col_or(
                    "o_datatype" if pos == "o" else None, "", pa.large_string()
                )
                cols[lc] = _col_or(
                    "o_lang" if pos == "o" else None, "", pa.large_string()
                )
        return pa.table(cols)

    return compact_blocks(triples_ds.map_batches(kernel, batch_format="pyarrow"))


# Below this many rows on the smaller side, a pattern join is realized as
# a BROADCAST hash join (small side ray.put once, per-batch acero join in
# map_batches) instead of an all-to-all shuffle. This sidesteps the skew
# stall of low-cardinality join keys (e.g. a 25-value nation key leaves
# ≤25 populated shuffle partitions regardless of cluster size).
BGP_BROADCAST_ROWS = 250_000


def _broadcast_join(big_ds, small_ds, keys: list[str]):
    """big ⋈ small on `keys` with the small side broadcast (one ray.put,
    per-batch pyarrow acero join — vectorized, no shuffle)."""
    import ray

    from ..util import compact_blocks

    small_schema = small_ds.schema().base_schema
    tables = [t.combine_chunks() for t in ray.get(small_ds.to_arrow_refs())]
    small_tbl = (
        pa.concat_tables(tables)
        if tables
        else pa.table({f.name: pa.array([], f.type) for f in small_schema})
    )
    small_ref = ray.put(small_tbl)

    big_schema = big_ds.schema().base_schema
    out_fields = [(n, big_schema.field(n).type) for n in big_schema.names] + [
        (f.name, f.type) for f in small_schema
        if f.name not in keys and f.name not in big_schema.names
    ]

    def kern(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({n: pa.array([], typ) for n, typ in out_fields})
        s = ray.get(small_ref)
        return t.combine_chunks().join(s, keys=keys, join_type="inner")

    return compact_blocks(big_ds.map_batches(kern, batch_format="pyarrow"))


def _empty_bindings(var_names, with_meta: bool):
    """A TYPED empty binding relation over ``var_names`` — an all-empty
    Dataset can lose its schema (Dataset.schema() → None) and poison
    downstream joins."""
    import ray.data as rd

    cols: dict[str, pa.Array] = {}
    for v in sorted(var_names):
        cols[v] = pa.array([], pa.large_string())
        if with_meta and v != "__exists":
            kc, dc, lc = meta_cols_of(v)
            cols[kc] = pa.array([], pa.int8())
            cols[dc] = pa.array([], pa.large_string())
            cols[lc] = pa.array([], pa.large_string())
    return rd.from_arrow(pa.table(cols))


def _join_step(acc, acc_vars, n_acc, nxt, nxt_vars, n_nxt, *,
               with_meta: bool, num_partitions: int | None = None):
    """Join two prepared binding relations → (ds, combined_vars, n|None).

    Both sides arrive MATERIALIZED with known counts (util.fast_count),
    so broadcast-vs-shuffle planning is metadata-only — no plan
    re-execution (the round-3 double-scan fix). Returned n is 0 for the
    short-circuit empty case, else None (caller fast_counts if needed)."""
    all_vars = acc_vars | nxt_vars
    shared = sorted(acc_vars & nxt_vars)
    if min(n_acc, n_nxt) == 0:
        return _empty_bindings(all_vars, with_meta), all_vars, 0
    if with_meta and shared:
        # shared vars carry meta on BOTH sides — keep the accumulated
        # side's columns, drop the new pattern's (joins are on the
        # lexical form; the engine's documented term-join subset)
        drop = [m for v in shared for m in meta_cols_of(v)]

        def _drop_meta(t: pa.Table, _d=tuple(drop)) -> pa.Table:
            keep = [c for c in t.schema.names if c not in _d]
            return t.select(keep)

        nxt = nxt.map_batches(_drop_meta, batch_format="pyarrow")
    if not shared:
        # disconnected component: cartesian product via a constant
        # join key (SPARQL permits it; the multiply is the query's
        # own semantics)
        def _tag_cross(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return t
            return t.append_column(
                "__cross", pa.array([1] * t.num_rows, pa.int8()))

        lc = compact_blocks(acc.map_batches(
            _tag_cross, batch_format="pyarrow"))
        rc = compact_blocks(nxt.map_batches(
            _tag_cross, batch_format="pyarrow"))
        out = compact_blocks(
            lc.join(rc, join_type="inner", num_partitions=1,
                    on=("__cross",))
        ).map_batches(
            lambda t: t.drop_columns(["__cross"])
            if t.num_columns and "__cross" in t.schema.names
            else t,
            batch_format="pyarrow",
        )
    elif min(n_acc, n_nxt) <= BGP_BROADCAST_ROWS:
        big, small = (acc, nxt) if n_acc >= n_nxt else (nxt, acc)
        out = _broadcast_join(big, small, shared)
    else:
        n_parts = num_partitions or max(1, min(64, n_acc // 2_000_000))
        out = compact_blocks(
            acc.join(nxt, join_type="inner", num_partitions=n_parts,
                     on=tuple(shared))
        )
    return out, all_vars, None


def join_prepared(parts, *, with_meta: bool = True,
                  num_partitions: int | None = None):
    """Join a list of PREPARED binding relations ``[(ds, var_names)]`` —
    the semi-naive rule engine's entry point (stages/rules.py): pattern
    scans are computed once per round by the caller and reused across
    the per-position delta variants, so only the joins differ.

    The FIRST element is the seed (callers put the delta there — it is
    the small side); the rest join greedily on shared variables."""
    items = [(ds, set(vs)) for ds, vs in parts]
    if not items:
        raise ValueError("empty join_prepared")
    from ..util import fast_count

    acc, acc_vars = items.pop(0)
    n_acc, acc = fast_count(acc)
    while items:
        for i, (_ds, vs) in enumerate(items):
            if acc_vars & vs:
                nxt, nxt_vars = items.pop(i)
                break
        else:
            nxt, nxt_vars = items.pop(0)
        if n_acc == 0:
            # short-circuit: the result is empty whatever remains —
            # just accumulate the variable set (typed empty at the end)
            acc_vars |= nxt_vars
            acc = _empty_bindings(acc_vars, with_meta)
            continue
        n_nxt, nxt = fast_count(nxt)
        acc, acc_vars, n_known = _join_step(
            acc, acc_vars, n_acc, nxt, nxt_vars, n_nxt,
            with_meta=with_meta, num_partitions=num_partitions)
        n_acc, acc = (n_known, acc) if n_known is not None else fast_count(acc)
    return acc


def _dedup(ds, cols):
    return compact_blocks(
        ds.groupby(list(cols)).count().map_batches(
            lambda t: pa.table(
                {c: t[c].combine_chunks().cast(pa.large_string()) for c in cols}
            )
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
    )


def match_bgp(triples_ds, patterns, *, distinct: bool = False,
              num_partitions: int | None = None, graph=None,
              with_meta: bool = False, sources=None):
    """Solve a BGP over the triple Dataset → binding Dataset (one
    large_string column per variable, SPARQL bag semantics unless
    ``distinct``). ``graph`` scopes every pattern (see
    _bindings_for_pattern); a Var graph joins as a shared variable, so
    all patterns bind within the SAME named graph.

    ``sources`` (optional, aligned with ``patterns``): a per-pattern
    triple-Dataset override — the semi-naive rule engine matches one
    body position against the round's delta and the rest against the
    full graph (stages/rules.py).

    All-constant patterns contribute no columns but DO gate/multiply the
    solution set: each matching triple contributes one empty binding
    (StageMatchTriple semantics), so 0 matches empties the BGP and a BGP
    of only constant patterns returns the unit relation (``__exists``
    marker column, one row per solution)."""
    from ..util import fast_count

    pats = list(patterns)
    if not pats:
        raise ValueError("empty BGP")
    srcs = list(sources) if sources is not None else [None] * len(pats)
    if len(srcs) != len(pats):
        raise ValueError("sources must align with patterns")
    gvars = {graph.name} if _is_var(graph) else set()
    # a Var graph binds a variable in EVERY pattern, so nothing is constant
    if gvars:
        const_items, var_items = [], list(zip(pats, srcs))
    else:
        const_items = [(p, s) for p, s in zip(pats, srcs)
                       if not _pattern_vars(p)]
        var_items = [(p, s) for p, s in zip(pats, srcs) if _pattern_vars(p)]
    mult = 1
    for p, src in const_items:
        mult *= fast_count(
            _bindings_for_pattern(src or triples_ds, p, graph, False))[0]
        if mult == 0:
            break
    if not var_items:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"__exists": pa.array(["1"] * mult, pa.large_string())})
        )
    ordered = _order_patterns(*zip(*var_items))

    pat0, src0 = ordered[0]
    n_acc, acc = fast_count(
        _bindings_for_pattern(src0 or triples_ds, pat0, graph, with_meta))
    acc_vars = set(_pattern_vars(pat0)) | gvars
    for pat, src in ordered[1:]:
        pat_vars = set(_pattern_vars(pat)) | gvars
        if n_acc == 0 and mult != 0:
            # result is empty whatever remains — skip the scans, just
            # widen the typed empty relation
            acc_vars |= pat_vars
            acc = _empty_bindings(acc_vars, with_meta)
            continue
        n_nxt, nxt = fast_count(
            _bindings_for_pattern(src or triples_ds, pat, graph, with_meta))
        acc, acc_vars, n_known = _join_step(
            acc, acc_vars, n_acc, nxt, pat_vars, n_nxt,
            with_meta=with_meta, num_partitions=num_partitions)
        n_acc, acc = (n_known, acc) if n_known is not None else fast_count(acc)
    if mult == 0:
        acc = acc.limit(0)
    elif mult > 1:  # bag semantics: constant matches multiply solutions
        acc = acc.map_batches(
            lambda t, _m=mult: pa.concat_tables([t] * _m)
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
    if distinct:
        acc = _dedup(acc, sorted(acc_vars))
    return acc


def select(bindings_ds, columns, *, where=None):
    """Projection + optional vectorized filter (the OpFilter/OpProject
    tail of the algebra): ``where`` is a callable batch→BooleanArray."""

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({c: pa.array([], pa.large_string()) for c in columns})
        if where is not None:
            t = t.filter(where(t))
        return pa.table({c: t[c].combine_chunks() for c in columns})

    return bindings_ds.map_batches(kernel, batch_format="pyarrow")
