"""ARQ property functions ("magic properties") over binding relations.

A BGP triple whose predicate is a registered property-function IRI is
not matched against the data; it transforms the binding relation built
from the patterns before it (reference: jena-arq
org/apache/jena/sparql/pfunction/* — PropFuncArg, PFuncSimple,
PropertyFunctionRegistry; the library lives in pfunction/library/*).

Ray-Data realization: each PF is either
  * a per-batch COLUMN transform on the relation (apf:assign, apf:str,
    apf:concat, apf:splitIRI, jext:uppercase, jext:localname with a
    bound subject), or
  * a RELATION derived from the triple Dataset joined in
    (list:member/index/length via an iterative rdf:rest chain walk,
    rdfs:member via the rdf:_N container relation, jext:labelSearch as
    a BGP + regex rewrite, jext:localname with an unbound subject as a
    node enumeration) — all distributed joins, no driver-side data.

Arg lists `( a b )` reach the BGP desugared into rdf:first/rdf:rest
chains; split_pf_patterns() reconstructs them and removes the chain
triples, exactly like Jena's PropertyFunctionProcessor walking the
graph of the BGP.

Partitioning assumption: rdf:rest chain walks run one distributed join
per list DEPTH (bounded by _MAX_LIST_DEPTH rounds) — list length, not
list COUNT, is the driver-synchronized dimension.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..model import (KIND_BNODE, KIND_IRI, KIND_LITERAL, RDF_FIRST,
                     RDF_NIL, RDF_REST, RDF_TYPE, RDFParseError, XSD_STRING)
from .bgp import Lit, Var, match_bgp, meta_cols_of

APF = "http://jena.apache.org/ARQ/property#"
LIST = "http://jena.apache.org/ARQ/list#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
JEXT = "java:arq.examples.propertyfunction."
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"

PF_IRIS = frozenset({
    APF + "assign", APF + "concat", APF + "splitIRI", APF + "splitURI",
    APF + "str",
    LIST + "member", LIST + "index", LIST + "length",
    RDFS + "member",
    JEXT + "localname", JEXT + "uppercase", JEXT + "labelSearch",
})

_MAX_LIST_DEPTH = 1000  # rounds cap for rdf:rest chain walks


def is_pf_predicate(p) -> bool:
    return isinstance(p, str) and p in PF_IRIS


def has_pf(patterns) -> bool:
    return any(is_pf_predicate(p[1]) for p in patterns if len(p) >= 3)


def split_pf_patterns(patterns):
    """→ ordered segments [(plain_patterns, pf | None), ...] where
    pf = (subject, subject_args, iri, object, object_args); *_args is
    the reconstructed arg list when that side was written as a
    collection (the desugared rdf:first/rest chain triples are REMOVED
    from the plain patterns — PropFuncArg semantics), else None.
    `()` (rdf:nil) on an arg-list-typed side is the EMPTY arg list."""
    pats = list(patterns)
    firsts: dict = {}
    rests: dict = {}
    for t in pats:
        if len(t) == 3 and isinstance(t[0], Var) \
                and t[0].name.startswith("__bn_"):
            if t[1] == RDF_FIRST:
                firsts.setdefault(t[0].name, t)
            elif t[1] == RDF_REST:
                rests.setdefault(t[0].name, t)

    def chase(head):
        """collection chain rooted at `head` → (args, chain_triples),
        or None when `head` is not a clean parser-desugared chain."""
        if head == RDF_NIL:
            return [], []
        args, used, seen = [], [], set()
        cur = head
        while True:
            if cur == RDF_NIL:
                return args, used
            if not isinstance(cur, Var) or \
                    not cur.name.startswith("__bn_") or cur.name in seen:
                return None
            seen.add(cur.name)
            f, r = firsts.get(cur.name), rests.get(cur.name)
            if f is None or r is None:
                return None
            args.append(f[2])
            used += [f, r]
            cur = r[2]

    consumed_ids: set = set()
    pf_at: dict = {}
    for idx, t in enumerate(pats):
        if len(t) != 3 or not is_pf_predicate(t[1]):
            continue
        s, p, o = t
        s_args = o_args = None
        # ARQ arg-list sides: list:index takes an (index member) object,
        # apf:splitIRI/concat take object lists; subjects stay single
        # in the implemented library
        if p in (LIST + "index", APF + "splitIRI", APF + "splitURI",
                 APF + "concat"):
            got = chase(o)
            if got is None:
                raise RDFParseError(
                    f"SPARQL: {p} needs a ( .. ) object arg list")
            o_args, used = got
            consumed_ids.update(id(x) for x in used)
        pf_at[idx] = (s, s_args, p, o, o_args)

    segments = []
    plain: list = []
    for idx, t in enumerate(pats):
        if id(t) in consumed_ids:
            continue
        if idx in pf_at:
            segments.append((plain, pf_at[idx]))
            plain = []
        else:
            plain.append(t)
    if plain or not segments:
        segments.append((plain, None))
    return segments


# ---------------------------------------------------------------- util

def _unit_relation():
    import ray.data as rd

    return rd.from_arrow(pa.table(
        {"__exists": pa.array(["1"], pa.large_string())})), []


def _rename(ds, mapping: dict):
    def kernel(t: pa.Table, _m=dict(mapping)) -> pa.Table:
        if t.num_columns == 0:
            return t
        return t.rename_columns([_m.get(c, c) for c in t.schema.names])

    return ds.map_batches(kernel, batch_format="pyarrow")


def _project(ds, keep: list):
    def kernel(t: pa.Table, _k=tuple(keep)) -> pa.Table:
        if t.num_columns == 0:
            return t
        names = set(t.schema.names)
        return pa.table({c: t[c].combine_chunks() for c in _k
                         if c in names})

    return ds.map_batches(kernel, batch_format="pyarrow")


def _var_meta(t: pa.Table, v: str):
    """(lex, kind, dt, lang) arrays of var ?v over a binding batch."""
    n = t.num_rows
    names = set(t.schema.names)
    lex = (t[v].combine_chunks().cast(pa.large_string())
           if v in names else pa.nulls(n, pa.large_string()))
    kc, dc, lc = meta_cols_of(v)
    kind = (pc.cast(t[kc].combine_chunks(), pa.int8())
            if kc in names else pa.array([KIND_LITERAL] * n, pa.int8()))
    dt = (pc.fill_null(t[dc].combine_chunks().cast(pa.large_string()), "")
          if dc in names else pa.array([""] * n, pa.large_string()))
    lang = (pc.fill_null(t[lc].combine_chunks().cast(pa.large_string()), "")
            if lc in names else pa.array([""] * n, pa.large_string()))
    return lex, kind, dt, lang


def _const_tuple(x):
    """pattern constant → (lex, kind, dt, lang); Lit datatype is its
    typed entry ('' = plain)."""
    if isinstance(x, str):
        return (x, KIND_IRI, "", "")
    if isinstance(x, Lit):
        dt = next((d for d in (x.dts or ()) if d), "")
        return (x.lex, KIND_LITERAL, dt, x.lang or "")
    raise RDFParseError(f"SPARQL: unsupported property-function arg {x!r}")


def _arg_tuple(x, t: pa.Table):
    """arg → per-row (lex, kind, dt, lang) arrays (vars read columns,
    constants broadcast)."""
    n = t.num_rows
    if isinstance(x, Var):
        return _var_meta(t, x.name)
    lex, kind, dt, lang = _const_tuple(x)
    return (pa.array([lex] * n, pa.large_string()),
            pa.array([kind] * n, pa.int8()),
            pa.array([dt] * n, pa.large_string()),
            pa.array([lang] * n, pa.large_string()))


def _same_term_mask(a, b):
    """element-wise sameTerm over two (lex, kind, dt, lang) tuples;
    '' and xsd:string datatypes are the one RDF 1.1 term."""
    def dtn(d):
        return pc.if_else(pc.equal(d, XSD_STRING),
                          pa.scalar("", pa.large_string()), d)

    m = pc.and_(pc.fill_null(pc.equal(a[0], b[0]), False),
                pc.fill_null(pc.equal(a[1], b[1]), True))
    m = pc.and_(m, pc.fill_null(pc.equal(dtn(a[2]), dtn(b[2])), True))
    return pc.and_(m, pc.fill_null(pc.equal(a[3], b[3]), True))


def _set_term(cols: dict, v: str, lex, kind, dt, lang):
    cols[v] = lex
    kc, dc, lc = meta_cols_of(v)
    cols[kc], cols[dc], cols[lc] = kind, dt, lang


def _bind_or_filter(rel, rel_vars, target, value_of, optional=False):
    """Generic PF result wiring for 1→0/1 functions: per batch,
    value_of(t) → (lex, kind, dt, lang, ok_mask) arrays. `target` var
    unbound → bind (null where !ok); bound var / constant → keep rows
    where sameTerm; optional=True keeps failing rows with nulls."""
    tname = target.name if isinstance(target, Var) else None
    fresh = tname is not None and tname not in rel_vars

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        lex, kind, dt, lang, ok = value_of(t)
        cols = {c: t[c].combine_chunks() for c in t.schema.names}
        if fresh:
            nulls = pc.if_else(ok, lex, pa.scalar(None, pa.large_string()))
            _set_term(cols, tname, nulls,
                      pc.if_else(ok, kind, pa.scalar(None, pa.int8())),
                      pc.if_else(ok, dt, pa.scalar(None, pa.large_string())),
                      pc.if_else(ok, lang, pa.scalar(None, pa.large_string())))
            out = pa.table(cols)
            if optional:
                return out
            return out.filter(pc.fill_null(ok, False))
        got = _arg_tuple(target, t)
        keep = pc.and_(pc.fill_null(ok, False),
                       _same_term_mask(got, (lex, kind, dt, lang)))
        if optional:
            return pa.table(cols)  # bound target: optional keeps rows
        return pa.table(cols).filter(keep)

    out = rel.map_batches(kernel, batch_format="pyarrow")
    out_vars = sorted(set(rel_vars) | ({tname} if fresh else set()))
    return out, out_vars


def _str_of(arg, t: pa.Table):
    """STR(arg) per row → (lex, ok): IRIs/literals → lexical form,
    bnodes/unbound → not ok."""
    lex, kind, dt, lang = _arg_tuple(arg, t)
    ok = pc.and_(pc.is_valid(lex),
                 pc.invert(pc.fill_null(
                     pc.equal(kind, pa.scalar(KIND_BNODE, pa.int8())),
                     False)))
    return lex, ok


# Util.splitNamespaceXML's NCName-suffix split (jena-core
# org/apache/jena/util/SplitIRI semantics): the localname is the
# longest NCName suffix; shrink from the left until it starts with an
# NCName start char.
_NC_CHAR = re.compile(r"[A-Za-z0-9._\-·À-￿]")
_NC_START = re.compile(r"[A-Za-z_À-￿]")


def split_iri(iri: str) -> tuple[str, str]:
    i = len(iri)
    while i > 0 and _NC_CHAR.fullmatch(iri[i - 1]):
        i -= 1
    j = i
    while j < len(iri) and not _NC_START.fullmatch(iri[j]):
        j += 1
    return iri[:j], iri[j:]


# ------------------------------------------------------- store relations

LIST_DRIVER_THRESHOLD = 50_000  # rdf:first+rdf:rest rows; above → joins


def _list_chain_rels_local(firsts, rests, lvar, ivar, mvar):
    """Driver-side rdf:first/rdf:rest chain walk — the small-subgraph
    strategy of _list_chain_rels (outputs and multiplicities identical
    to the distributed per-depth joins: suffix cells are not heads,
    multi-first cells fork, chains cap at _MAX_LIST_DEPTH)."""
    import ray.data as rd

    def _rows(ds, cols):
        out = []
        for t in ds.iter_batches(batch_format="pyarrow"):
            names = set(t.schema.names)
            data = [t[c].to_pylist() if c in names else [None] * t.num_rows
                    for c in cols]
            out.extend(zip(*data))
        return out

    mk, md, ml = meta_cols_of(mvar)
    nk, nd, nl = meta_cols_of("__pfn")
    first_of: dict = {}
    head_meta: dict = {}
    for n, n_k, m, m_k, m_d, m_l in _rows(
            firsts, ["__pfn", nk, mvar, mk, md, ml]):
        first_of.setdefault(n, []).append((m, m_k, m_d or "", m_l or ""))
        head_meta[n] = n_k
    rest_of: dict = {}
    suffixes: set = set()
    for a, b in _rows(rests, ["__pfa", "__pfb"]):
        rest_of.setdefault(a, []).append(b)
        suffixes.add(b)

    idx_rows: list = []   # (head, head_kind, depth, m, mk, md, ml)
    len_rows: list = []   # (head, head_kind, length)
    for h in first_of:
        if h in suffixes:
            continue
        hk = head_meta[h]
        stack = [(h, 0)]
        while stack:
            cur, d = stack.pop()
            if d > _MAX_LIST_DEPTH:
                continue
            entries = first_of.get(cur)
            if not entries:
                continue  # no rdf:first → the level row dies here
            for m in entries:
                idx_rows.append((h, hk, d, *m))
            for nxt in rest_of.get(cur, []):
                if nxt == RDF_NIL:
                    # one length row per (level row, nil rest) pair
                    len_rows.extend([(h, hk, d + 1)] * len(entries))
                else:
                    # the advance forks once per level row
                    stack.extend([(nxt, d + 1)] * len(entries))

    lk, ld, ll = meta_cols_of(lvar)
    ik, idt, il = meta_cols_of(ivar)

    def _table(rows, with_member: bool) -> pa.Table:
        n = len(rows)
        cols = {
            lvar: pa.array([r[0] for r in rows], pa.large_string()),
            lk: pa.array([r[1] for r in rows], pa.int8()),
            ld: pa.array([""] * n, pa.large_string()),
            ll: pa.array([""] * n, pa.large_string()),
            ivar: pa.array([str(r[2]) for r in rows], pa.large_string()),
            ik: pa.array([KIND_LITERAL] * n, pa.int8()),
            idt: pa.array([XSD_INTEGER] * n, pa.large_string()),
            il: pa.array([""] * n, pa.large_string()),
        }
        if with_member:
            cols[mvar] = pa.array([r[3] for r in rows], pa.large_string())
            cols[mk] = pa.array([r[4] for r in rows], pa.int8())
            cols[md] = pa.array([r[5] for r in rows], pa.large_string())
            cols[ml] = pa.array([r[6] for r in rows], pa.large_string())
        return pa.table(cols)

    # rdf:nil itself is the empty list (length 0) — same as the
    # distributed tail
    len_rows.append((RDF_NIL, KIND_IRI, 0))
    return (rd.from_arrow(_table(idx_rows, True)),
            rd.from_arrow(_table(len_rows, False)))


def _list_chain_rels(store, graph, lvar, ivar, mvar):
    """(index_rel, length_rel) from the rdf:first/rdf:rest structure in
    the active graph: index_rel binds (?lvar list, ?ivar index, ?mvar
    member+meta); length_rel binds (?lvar, ?ivar length). One
    distributed join per list DEPTH (≤ _MAX_LIST_DEPTH)."""
    from ..util import fast_count
    from .sparql import _join_bindings

    firsts = match_bgp(store, [(Var("__pfn"), RDF_FIRST, Var(mvar))],
                       with_meta=True, graph=graph)
    rests = match_bgp(store, [(Var("__pfa"), RDF_REST, Var("__pfb"))],
                      with_meta=True, graph=graph)
    n_first, firsts = fast_count(firsts)
    n_rest, rests = fast_count(rests)
    if n_first + n_rest <= LIST_DRIVER_THRESHOLD:
        # the rdf:first/rdf:rest SUBGRAPH is small: walk the chains on
        # the driver (the CLOSURE_DRIVER_THRESHOLD strategy switch —
        # identical semantics, none of the per-DEPTH join/materialize
        # round-trips, which dominate wall time on short lists)
        return _list_chain_rels_local(firsts, rests, lvar, ivar, mvar)
    # only true list HEADS seed the walk — a cons cell that is the
    # object of an rdf:rest is a suffix, not a list (ARQ list-6: an
    # unbound-subject list:member must not enumerate suffixes)
    from .sparql import _minus_bindings

    tails = _project(_rename(rests, {"__pfb": "__pfn"}),
                     ["__pfn", *meta_cols_of("__pfn")])
    heads, _ = _minus_bindings(firsts, sorted({"__pfn", mvar}),
                               tails, ["__pfn"])

    def _with_head(t: pa.Table) -> pa.Table:
        # level-0 pairs: every cons cell heads its own suffix
        if t.num_columns == 0:
            return t
        cols = {c: t[c].combine_chunks() for c in t.schema.names}
        cols[lvar] = cols["__pfn"]
        kc, dc, lc = meta_cols_of(lvar)
        nk, nd, nl = meta_cols_of("__pfn")
        for a, b in ((kc, nk), (dc, nd), (lc, nl)):
            if b in t.schema.names:
                cols[a] = cols[b]
        return pa.table(cols)

    level = heads.map_batches(_with_head, batch_format="pyarrow")
    level = _rename(level, {"__pfn": "__pfcur"})
    lv_vars = sorted({lvar, "__pfcur", mvar})
    idx_parts = []   # (depth, Dataset(lvar, mvar))
    len_parts = []   # (Dataset(lvar), length)
    rest_step = _rename(rests, {"__pfa": "__pfcur", "__pfb": "__pfnext"})
    nil_tails = rest_step  # rows where __pfnext == nil terminate chains

    depth = 0
    while True:
        n_level, level = fast_count(level)
        if n_level == 0 or depth > _MAX_LIST_DEPTH:
            break
        idx_parts.append((depth, _project(
            level, [lvar, mvar, *meta_cols_of(lvar), *meta_cols_of(mvar)])))
        # length: cur's rest is nil → length = depth + 1
        ends, _ = _join_bindings(
            level, lv_vars,
            nil_tails, sorted({"__pfcur", "__pfnext"}), "inner")
        ends = ends.map_batches(
            lambda t: t.filter(pc.equal(
                t["__pfnext"].combine_chunks().cast(pa.large_string()),
                RDF_NIL)) if t.num_columns else t,
            batch_format="pyarrow")
        len_parts.append((_project(ends, [lvar, *meta_cols_of(lvar)]),
                          depth + 1))
        # advance: join with rests, cur := next
        nxt, _ = _join_bindings(
            _project(level, [lvar, "__pfcur", *meta_cols_of(lvar)]),
            sorted({lvar, "__pfcur"}),
            rest_step, sorted({"__pfcur", "__pfnext"}), "inner")
        nxt = nxt.map_batches(
            lambda t: t.filter(pc.not_equal(
                t["__pfnext"].combine_chunks().cast(pa.large_string()),
                RDF_NIL)) if t.num_columns else t,
            batch_format="pyarrow")
        nxt = _project(nxt, [lvar, "__pfnext", *meta_cols_of(lvar)])
        nxt = _rename(nxt, {"__pfnext": "__pfhead"})
        # re-anchor the member lookup at the new head
        nxt, _ = _join_bindings(
            _rename(nxt, {"__pfhead": "__pfcur"}),
            sorted({lvar, "__pfcur"}),
            _rename(_project(firsts,
                             ["__pfn", mvar, *meta_cols_of(mvar)]),
                    {"__pfn": "__pfcur"}),
            sorted({"__pfcur", mvar}), "inner")
        level = nxt
        depth += 1

    import ray.data as rd

    def _stamp_idx(ds, d):
        def kernel(t: pa.Table, _d=d) -> pa.Table:
            if t.num_columns == 0:
                return t
            cols = {c: t[c].combine_chunks() for c in t.schema.names}
            n = t.num_rows
            _set_term(cols, ivar,
                      pa.array([str(_d)] * n, pa.large_string()),
                      pa.array([KIND_LITERAL] * n, pa.int8()),
                      pa.array([XSD_INTEGER] * n, pa.large_string()),
                      pa.array([""] * n, pa.large_string()))
            return pa.table(cols)

        return ds.map_batches(kernel, batch_format="pyarrow")

    empty_cols = {}
    for v in (lvar, ivar, mvar):
        empty_cols[v] = pa.array([], pa.large_string())
        kc, dc, lc = meta_cols_of(v)
        empty_cols[kc] = pa.array([], pa.int8())
        empty_cols[dc] = pa.array([], pa.large_string())
        empty_cols[lc] = pa.array([], pa.large_string())
    index_rel = rd.from_arrow(pa.table(empty_cols))
    for d, part in idx_parts:
        index_rel = index_rel.union(_stamp_idx(part, d))

    # lengths, plus rdf:nil itself (the empty list has length 0)
    nil_row = {lvar: pa.array([RDF_NIL], pa.large_string())}
    kc, dc, lc = meta_cols_of(lvar)
    nil_row[kc] = pa.array([KIND_IRI], pa.int8())
    nil_row[dc] = pa.array([""], pa.large_string())
    nil_row[lc] = pa.array([""], pa.large_string())
    length_rel = _stamp_idx(rd.from_arrow(pa.table(nil_row)), 0)
    length_rel = _rename(length_rel, {})
    for part, ln in len_parts:
        length_rel = length_rel.union(_stamp_idx(part, ln))
    return index_rel, length_rel


def _container_rel(store, graph, cvar, mvar):
    """rdfs:member relation (container.java): concrete rdfs:member
    triples UNION rdf:_N members of containers TYPED Bag/Seq/Alt."""
    from .sparql import _join_bindings

    concrete = match_bgp(store, [(Var(cvar), RDFS + "member", Var(mvar))],
                         with_meta=True, graph=graph)
    n_rel = match_bgp(store, [(Var(cvar), Var("__pfp"), Var(mvar))],
                      with_meta=True, graph=graph)

    def only_nth(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        p = t["__pfp"].combine_chunks().cast(pa.large_string())
        return t.filter(pc.fill_null(
            pc.match_substring_regex(p, r"^" + re.escape(RDFNS) + r"_\d+$"),
            False))

    members = _project(n_rel.map_batches(only_nth, batch_format="pyarrow"),
                       [cvar, mvar, *meta_cols_of(cvar),
                        *meta_cols_of(mvar)])
    typed = match_bgp(store, [(Var(cvar), RDF_TYPE, Var("__pft"))],
                      with_meta=True, graph=graph)
    typed = typed.map_batches(
        lambda t: t.filter(pc.is_in(
            t["__pft"].combine_chunks().cast(pa.large_string()),
            value_set=pa.array([RDFNS + "Bag", RDFNS + "Seq",
                                RDFNS + "Alt"], pa.large_string())))
        if t.num_columns else t,
        batch_format="pyarrow")
    typed = _project(typed, [cvar, *meta_cols_of(cvar)])
    calc, _ = _join_bindings(members, sorted({cvar, mvar}),
                             typed, [cvar], "inner")
    calc = _project(calc, [cvar, mvar, *meta_cols_of(cvar),
                           *meta_cols_of(mvar)])
    concrete = _project(concrete, [cvar, mvar, *meta_cols_of(cvar),
                                   *meta_cols_of(mvar)])
    return concrete.union(calc)


def _all_nodes_rel(store, graph, svar, lnvar):
    """jext:localname node enumeration: every IRI OCCURRENCE in the
    active graph (s, p, o slots, duplicates preserved — the example
    'uses a list if you want counting results') with its localname."""
    spo = match_bgp(store, [(Var("__pfs"), Var("__pfp"), Var("__pfo"))],
                    with_meta=True, graph=graph)

    def kernel(t: pa.Table) -> pa.Table:
        cols_out = {svar: [], lnvar: []}
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({
                svar: pa.array([], pa.large_string()),
                lnvar: pa.array([], pa.large_string())})
        s_lex, s_kind, _, _ = _var_meta(t, "__pfs")
        p_lex = t["__pfp"].combine_chunks().cast(pa.large_string())
        o_lex, o_kind, _, _ = _var_meta(t, "__pfo")
        sk, ok_ = s_kind.to_pylist(), o_kind.to_pylist()
        sl, plx, ol = s_lex.to_pylist(), p_lex.to_pylist(), o_lex.to_pylist()
        for i in range(t.num_rows):
            if sk[i] == KIND_IRI:
                cols_out[svar].append(sl[i])
                cols_out[lnvar].append(split_iri(sl[i])[1])
            cols_out[svar].append(plx[i])
            cols_out[lnvar].append(split_iri(plx[i])[1])
            if ok_[i] == KIND_IRI:
                cols_out[svar].append(ol[i])
                cols_out[lnvar].append(split_iri(ol[i])[1])
        out = {svar: pa.array(cols_out[svar], pa.large_string()),
               lnvar: pa.array(cols_out[lnvar], pa.large_string())}
        n = len(cols_out[svar])
        kc, dc, lc = meta_cols_of(svar)
        out[kc] = pa.array([KIND_IRI] * n, pa.int8())
        out[dc] = pa.array([""] * n, pa.large_string())
        out[lc] = pa.array([""] * n, pa.large_string())
        kc, dc, lc = meta_cols_of(lnvar)
        out[kc] = pa.array([KIND_LITERAL] * n, pa.int8())
        out[dc] = pa.array([""] * n, pa.large_string())
        out[lc] = pa.array([""] * n, pa.large_string())
        return pa.table(out)

    return spo.map_batches(kernel, batch_format="pyarrow")


# ------------------------------------------------------------- dispatch

def apply_pf(rel, rel_vars, pf, store, graph, optional: bool = False):
    """Apply one property function to the binding relation. `rel` None
    means the PF opens the group (unit relation input). optional=True
    (substitution inside a PF-only OPTIONAL) keeps non-matching rows
    with null outputs for the simple 1→0/1 functions."""
    if rel is None:
        rel, rel_vars = _unit_relation()
    s, s_args, iri, o, o_args = pf
    name = iri.rsplit("#", 1)[-1].rsplit(".", 1)[-1]
    if iri in (APF + "assign",):
        return _pf_assign(rel, rel_vars, s, o, optional)
    if iri == APF + "str":
        return _pf_str(rel, rel_vars, s, o, optional)
    if iri == APF + "concat":
        return _pf_concat(rel, rel_vars, s, o_args or [], optional)
    if iri in (APF + "splitIRI", APF + "splitURI"):
        return _pf_splitiri(rel, rel_vars, s, o_args or [], optional)
    if iri == JEXT + "uppercase":
        return _pf_uppercase(rel, rel_vars, s, o, optional)
    if iri == JEXT + "localname":
        return _pf_localname(rel, rel_vars, s, o, store, graph, optional)
    if iri == JEXT + "labelSearch":
        return _pf_labelsearch(rel, rel_vars, s, o, store, graph)
    if iri in (LIST + "member", LIST + "index", LIST + "length"):
        return _pf_list(rel, rel_vars, s, iri, o, o_args, store, graph)
    if iri == RDFS + "member":
        return _pf_container(rel, rel_vars, s, o, store, graph)
    raise RDFParseError(f"SPARQL: unimplemented property function {iri}")


def _pf_assign(rel, rel_vars, s, o, optional):
    """apf:assign (assign.java): unbound side := other side's TERM;
    both bound → sameValueAs filter (value space, so 1 matches 01)."""
    s_var = isinstance(s, Var) and s.name not in rel_vars
    o_var = isinstance(o, Var) and o.name not in rel_vars
    if s_var and o_var:
        raise RDFParseError(
            "SPARQL: apf:assign with both sides unbound")
    if s_var:
        src, tgt = o, s
    elif o_var:
        src, tgt = s, o
    else:
        # both bound: sameValueAs filter
        def kernel(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return t
            mask = _eq_mask(s, o, t)
            return t.filter(mask)

        return rel.map_batches(kernel, batch_format="pyarrow"), rel_vars

    def value_of(t, _src=src):
        lex, kind, dt, lang = _arg_tuple(_src, t)
        return lex, kind, dt, lang, pc.is_valid(lex)

    return _bind_or_filter(rel, rel_vars, tgt, value_of, optional)


def _eq_mask(a, b, t: pa.Table):
    """sameValueAs mask for two bound args: term-equal OR equal in the
    numeric value space (assign-5: 1 matches "01"^^xsd:integer)."""
    A, B = _arg_tuple(a, t), _arg_tuple(b, t)
    same = _same_term_mask(A, B)
    num_re = r"^[+-]?((\d+(\.\d*)?)|(\.\d+))([eE][+-]?\d+)?$"
    an = pc.fill_null(pc.match_substring_regex(
        pc.fill_null(A[0], ""), num_re), False)
    bn = pc.fill_null(pc.match_substring_regex(
        pc.fill_null(B[0], ""), num_re), False)
    av = pc.cast(pc.if_else(an, A[0], pa.scalar(None, pa.large_string())),
                 pa.float64())
    bv = pc.cast(pc.if_else(bn, B[0], pa.scalar(None, pa.large_string())),
                 pa.float64())
    numeq = pc.fill_null(pc.equal(av, bv), False)
    return pc.or_(same, numeq)


def _pf_str(rel, rel_vars, s, o, optional):
    """apf:str (str.java): subject := plain-literal STR(object)."""
    def value_of(t):
        n = t.num_rows
        lex, ok = _str_of(o, t)
        return (lex, pa.array([KIND_LITERAL] * n, pa.int8()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()), ok)

    return _bind_or_filter(rel, rel_vars, s, value_of, optional)


def _pf_concat(rel, rel_vars, s, args, optional):
    """apf:concat (concat.java): subject := concat of STR(arg)..."""
    def value_of(t):
        n = t.num_rows
        acc = pa.array([""] * n, pa.large_string())
        ok = pa.array([True] * n)
        for a in args:
            lex, aok = _str_of(a, t)
            ok = pc.and_(ok, aok)
            acc = pc.binary_join_element_wise(
                acc, pc.fill_null(lex, ""),
                pa.scalar("", pa.large_string()))
        return (acc, pa.array([KIND_LITERAL] * n, pa.int8()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()), ok)

    return _bind_or_filter(rel, rel_vars, s, value_of, optional)


def _pf_uppercase(rel, rel_vars, s, o, optional):
    """jext:uppercase (uppercase.java): object := UCASE(lexical) of a
    LITERAL subject; non-literals produce nothing."""
    def value_of(t):
        n = t.num_rows
        lex, kind, _, _ = _arg_tuple(s, t)
        ok = pc.and_(pc.is_valid(lex), pc.fill_null(
            pc.equal(kind, pa.scalar(KIND_LITERAL, pa.int8())), False))
        return (pc.utf8_upper(pc.fill_null(lex, "")),
                pa.array([KIND_LITERAL] * n, pa.int8()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()), ok)

    return _bind_or_filter(rel, rel_vars, o, value_of, optional)


def _pf_splitiri(rel, rel_vars, s, args, optional):
    """apf:splitIRI (splitIRI.java): IRI subject → (namespace-IRI,
    localname-string) object list; constants filter."""
    if len(args) != 2:
        raise RDFParseError(
            "SPARQL: apf:splitIRI object list needs 2 elements")
    ns_arg, ln_arg = args

    def compute(t):
        lex, kind, _, _ = _arg_tuple(s, t)
        ok = pc.and_(pc.is_valid(lex), pc.fill_null(
            pc.equal(kind, pa.scalar(KIND_IRI, pa.int8())), False))
        okl = ok.to_pylist()
        ll = lex.to_pylist()
        ns, ln = [], []
        for i, hit in enumerate(okl):
            if hit and ll[i] is not None:
                a, b = split_iri(ll[i])
                ns.append(a)
                ln.append(b)
            else:
                ns.append(None)
                ln.append(None)
        return (pa.array(ns, pa.large_string()),
                pa.array(ln, pa.large_string()), ok)

    def ns_value(t):
        n = t.num_rows
        ns, _ln, ok = compute(t)
        return (ns, pa.array([KIND_IRI] * n, pa.int8()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()), ok)

    rel, rel_vars = _bind_or_filter(rel, rel_vars, ns_arg, ns_value,
                                    optional)

    def ln_value(t):
        n = t.num_rows
        _ns, ln, ok = compute(t)
        return (ln, pa.array([KIND_LITERAL] * n, pa.int8()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()), ok)

    return _bind_or_filter(rel, rel_vars, ln_arg, ln_value, optional)


def _pf_localname(rel, rel_vars, s, o, store, graph, optional):
    """jext:localname (localname.java): bound subject → row transform;
    unbound subject → enumerate every IRI occurrence in the graph."""
    s_bound = (not isinstance(s, Var)) or s.name in rel_vars
    if s_bound:
        def value_of(t):
            n = t.num_rows
            lex, kind, _, _ = _arg_tuple(s, t)
            ok = pc.and_(pc.is_valid(lex), pc.fill_null(
                pc.equal(kind, pa.scalar(KIND_IRI, pa.int8())), False))
            okl, ll = ok.to_pylist(), lex.to_pylist()
            ln = [split_iri(x)[1] if (h and x is not None) else None
                  for h, x in zip(okl, ll)]
            return (pa.array(ln, pa.large_string()),
                    pa.array([KIND_LITERAL] * n, pa.int8()),
                    pa.array([""] * n, pa.large_string()),
                    pa.array([""] * n, pa.large_string()), ok)

        return _bind_or_filter(rel, rel_vars, o, value_of, optional)
    from .sparql import _join_bindings

    lnv = o.name if isinstance(o, Var) else "__pfln"
    nodes = _all_nodes_rel(store, graph, s.name, lnv)
    nodes_vars = sorted({s.name, lnv})
    if not isinstance(o, Var):
        want = _const_tuple(o)
        if want[1] != KIND_LITERAL or want[2] not in ("", XSD_STRING) \
                or want[3]:
            import ray.data as rd

            return rd.from_arrow(pa.table(
                {v: pa.array([], pa.large_string())
                 for v in sorted(set(rel_vars) | {s.name})})), \
                sorted(set(rel_vars) | {s.name})
        nodes = nodes.map_batches(
            lambda t, _w=want[0]: t.filter(pc.equal(
                t[lnv].combine_chunks().cast(pa.large_string()), _w))
            if t.num_columns else t,
            batch_format="pyarrow")
        nodes = _project(nodes, [s.name, *meta_cols_of(s.name)])
        nodes_vars = [s.name]
    out, out_vars = _join_bindings(rel, rel_vars, nodes, nodes_vars,
                                   "inner")
    return out, out_vars


def _pf_labelsearch(rel, rel_vars, s, o, store, graph):
    """jext:labelSearch (labelSearch.java): rewrite to
    Join(input, Filter(regex(?lbl, pattern, "i"),
    BGP(subject rdfs:label ?lbl))), hidden label var projected away."""
    from .sparql import _join_bindings

    pat = _const_tuple(o) if not isinstance(o, Var) else None
    if pat is None or pat[1] != KIND_LITERAL or pat[3]:
        import ray.data as rd

        return rd.from_arrow(pa.table(
            {"__exists": pa.array([], pa.large_string())})), rel_vars
    hits = match_bgp(store, [(s, RDFS + "label", Var("__pflbl"))],
                     with_meta=True, graph=graph)
    hits = hits.map_batches(
        lambda t, _p=pat[0]: t.filter(pc.fill_null(
            pc.match_substring_regex(
                t["__pflbl"].combine_chunks().cast(pa.large_string()),
                _p, ignore_case=True), False))
        if t.num_columns else t,
        batch_format="pyarrow")
    svars = [s.name] if isinstance(s, Var) else []
    hits = _project(hits, svars + [m for v in svars
                                   for m in meta_cols_of(v)]
                    ) if svars else _project(hits, [])
    if not svars:
        hits = hits.map_batches(
            lambda t: pa.table({"__exists": pa.array(
                ["1"] * t.num_rows, pa.large_string())}),
            batch_format="pyarrow")
        return _join_bindings(rel, rel_vars, hits, [], "inner")
    return _join_bindings(rel, rel_vars, hits, svars, "inner")


def _pf_list(rel, rel_vars, s, iri, o, o_args, store, graph):
    """list:member / list:index / list:length over the rdf:first/rest
    structure (listMember/listIndex/listLength.java)."""
    from .sparql import _join_bindings

    lvar = s.name if isinstance(s, Var) else "__pfL"
    if iri == LIST + "index":
        if len(o_args or []) != 2:
            raise RDFParseError(
                "SPARQL: list:index object list needs 2 elements")
        iarg, marg = o_args
    elif iri == LIST + "member":
        iarg, marg = None, o
    else:
        iarg, marg = o, None  # length rides the index var slot

    ivar = (iarg.name if isinstance(iarg, Var) else "__pfI")
    mvar = (marg.name if isinstance(marg, Var) else "__pfM")
    index_rel, length_rel = _list_chain_rels(store, graph, lvar, ivar,
                                             mvar)
    if iri == LIST + "length":
        pf_rel = length_rel
        keep = [lvar, ivar]
    elif iri == LIST + "member":
        pf_rel = _project(index_rel, [lvar, mvar, *meta_cols_of(lvar),
                                      *meta_cols_of(mvar)])
        keep = [lvar, mvar]
    else:
        pf_rel = index_rel
        keep = [lvar, ivar, mvar]

    # constant args become filters on the PF relation
    def _const_filter(ds, v, const):
        def kernel(t: pa.Table, _c=const, _v=v) -> pa.Table:
            if t.num_columns == 0:
                return t
            got = _var_meta(t, _v)
            cw = _arg_tuple(_c, t)
            return t.filter(_eq_mask_tuples(got, cw))

        return ds.map_batches(kernel, batch_format="pyarrow")

    join_vars = []
    for v, arg in ((lvar, s), (ivar, iarg), (mvar, marg)):
        if v not in keep:
            continue
        if arg is None:
            continue
        if isinstance(arg, Var):
            join_vars.append(v)
        else:
            pf_rel = _const_filter(pf_rel, v, arg)
    pf_rel = _project(pf_rel, keep + [m for v in keep
                                      for m in meta_cols_of(v)])
    pf_vars = sorted(v for v, a in ((lvar, s), (ivar, iarg), (mvar, marg))
                     if v in keep and isinstance(a, Var))
    pf_rel = _project(pf_rel, pf_vars + [m for v in pf_vars
                                         for m in meta_cols_of(v)]) \
        if pf_vars else pf_rel.map_batches(
            lambda t: pa.table({"__exists": pa.array(
                ["1"] * t.num_rows, pa.large_string())}),
            batch_format="pyarrow")
    return _join_bindings(rel, rel_vars, pf_rel, pf_vars, "inner")


def _eq_mask_tuples(A, B):
    """sameValueAs over two (lex,kind,dt,lang) tuples (numeric value
    space or same term)."""
    same = _same_term_mask(A, B)
    num_re = r"^[+-]?((\d+(\.\d*)?)|(\.\d+))([eE][+-]?\d+)?$"
    an = pc.fill_null(pc.match_substring_regex(
        pc.fill_null(A[0], ""), num_re), False)
    bn = pc.fill_null(pc.match_substring_regex(
        pc.fill_null(B[0], ""), num_re), False)
    both_lit = pc.and_(
        pc.fill_null(pc.equal(A[1], pa.scalar(KIND_LITERAL, pa.int8())),
                     True),
        pc.fill_null(pc.equal(B[1], pa.scalar(KIND_LITERAL, pa.int8())),
                     True))
    av = pc.cast(pc.if_else(an, A[0], pa.scalar(None, pa.large_string())),
                 pa.float64())
    bv = pc.cast(pc.if_else(bn, B[0], pa.scalar(None, pa.large_string())),
                 pa.float64())
    numeq = pc.and_(both_lit, pc.fill_null(pc.equal(av, bv), False))
    return pc.or_(same, numeq)


def _pf_container(rel, rel_vars, s, o, store, graph):
    """rdfs:member (container.java): concrete triples ∪ typed-container
    rdf:_N members, joined into the relation."""
    from .sparql import _join_bindings

    cvar = s.name if isinstance(s, Var) else "__pfC"
    mvar = o.name if isinstance(o, Var) else "__pfM"
    pf_rel = _container_rel(store, graph, cvar, mvar)
    if not isinstance(s, Var):
        pf_rel = pf_rel.map_batches(
            lambda t, _c=_const_tuple(s): t.filter(_eq_mask_tuples(
                _var_meta(t, cvar), _arg_tuple_const(_c, t.num_rows)))
            if t.num_columns else t,
            batch_format="pyarrow")
    if not isinstance(o, Var):
        pf_rel = pf_rel.map_batches(
            lambda t, _c=_const_tuple(o): t.filter(_eq_mask_tuples(
                _var_meta(t, mvar), _arg_tuple_const(_c, t.num_rows)))
            if t.num_columns else t,
            batch_format="pyarrow")
    pf_vars = sorted(v for v, a in ((cvar, s), (mvar, o))
                     if isinstance(a, Var))
    pf_rel = _project(pf_rel, pf_vars + [m for v in pf_vars
                                         for m in meta_cols_of(v)]) \
        if pf_vars else pf_rel.map_batches(
            lambda t: pa.table({"__exists": pa.array(
                ["1"] * t.num_rows, pa.large_string())}),
            batch_format="pyarrow")
    return _join_bindings(rel, rel_vars, pf_rel, pf_vars, "inner")


def _arg_tuple_const(c, n):
    return (pa.array([c[0]] * n, pa.large_string()),
            pa.array([c[1]] * n, pa.int8()),
            pa.array([c[2]] * n, pa.large_string()),
            pa.array([c[3]] * n, pa.large_string()))


SIMPLE_PFS = frozenset({
    APF + "assign", APF + "str", APF + "concat", APF + "splitIRI",
    APF + "splitURI", JEXT + "uppercase", JEXT + "localname",
})


def compile_bgp_with_pfs(triples_ds, patterns, graph=None):
    """BGP evaluation with property functions: plain segments match
    normally, each PF transforms/joins the relation-so-far in pattern
    order (Jena splits the BGP the same way)."""
    from .bgp import _pattern_vars
    from .sparql import _join_bindings

    segments = split_pf_patterns(patterns)
    rel, rel_vars = None, []
    for plain, pf in segments:
        if plain:
            r = match_bgp(triples_ds, plain, distinct=False, graph=graph,
                          with_meta=True)
            rv = sorted(
                {v for pat in plain for v in _pattern_vars(pat)}
                | ({graph.name} if isinstance(graph, Var) else set()))
            if rel is None:
                rel, rel_vars = r, rv
            else:
                rel, rel_vars = _join_bindings(rel, rel_vars, r, rv,
                                               "inner")
        if pf is not None:
            rel, rel_vars = apply_pf(rel, rel_vars, pf, triples_ds,
                                     graph)
    if rel is None:
        rel, rel_vars = _unit_relation()
    return rel, rel_vars
