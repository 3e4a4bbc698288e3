"""ShEx validation — core subset as a distributed per-focus-node stage.

Parity: jena-shex (Shex.java schema parse, ShexValidator.java validate
with a shape map, ShexReport.java statuses; ShExC grammar
parser/ShExC.jj). Implemented subset — the triple-constraint core that
covers schema-shaped KG QA:

- shape declarations  <Label> { p1 VE card ; p2 VE card ; ... }  (EachOf)
- shape EXPRESSIONS (round 3): boolean combinations of shape atoms —
  ``<L> @<A> AND { ... }``, ``<L> @<A> OR @<B>``, ``<L> NOT @<A>``,
  parenthesised nesting — jena-shex ShapeExprAnd/Or/Not semantics
  (NOT binds tightest, then AND, then OR)
- value expressions:  ``.`` (wildcard), datatype IRI, node kinds
  IRI / BNODE / LITERAL / NONLITERAL, value sets ``[ <v1> "v2" ... ]``,
  shape references ``@<Other>`` (non-recursive)
- cardinalities:      ``?`` (0..1), ``+`` (1..*), ``*`` (0..*),
  ``{m}`` / ``{m,n}`` / ``{m,*}``, default exactly 1
- CLOSED shapes:      predicates outside the declared set are violations
- shape map:          ``<node>@<Shape>`` fixed entries and
  ``{FOCUS a <Class>}@<Shape>`` class selectors

Shape references are evaluated in dependency order of the ref graph's
strongly-connected components: acyclic refs run a full per-focus pass
first and their CONFORMING NODE SET is broadcast to the referring
shape's pass — one extra distributed pass per dependency level.
RECURSIVE references (round 3) are evaluated by greatest-fixpoint
iteration over the cyclic SCC — the ShEx spec's maximal-typing
(co-inductive) semantics, as jena-shex reaches via its stack of
in-progress assumptions (ValidationContext.java startValidate/
retractValidate): every candidate node is ASSUMED conformant, each
iteration re-runs the SCC's per-focus passes under the current
assumption sets, and nodes that fail drop out until the sets are
stable. Iterations are bounded by total node-drops. Negation through
a recursive cycle is rejected (non-stratified — also an error in the
spec). Partitioning assumption (documented): a conformance set is
focus-node-scale; at corpus scale swap the broadcast for a hash join
on the object column.

NOT in subset (documented): semantic actions, IMPORTs.

Execution shape (same as stages/shacl.py): the small schema + shape map
broadcast; data hash-grouped by subject so every focus node's triples
are co-located; groups validate vectorized-per-group. Report rows:
(focus, shape, status, reason) — ShexStatus.conformant/nonconformant.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

from ..model import KIND_BNODE, KIND_IRI, KIND_LITERAL, RDF_TYPE, RDFParseError

_UNBOUNDED = -1


@dataclass
class TripleConstraint:
    predicate: str
    value_expr: tuple  # ("any",) | ("datatype", iri) | ("kind", k) | ("values", {..})
    min_card: int = 1
    max_card: int = 1  # _UNBOUNDED = *


@dataclass
class Shape:
    label: str
    constraints: list[TripleConstraint] = field(default_factory=list)
    closed: bool = False


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<comment>\#[^\n]*) |
        (?P<iri><[^>\s]*>) |
        (?P<pname>[A-Za-z_][\w\-]*:[\w\-.]*|[A-Za-z_][\w\-]*:) |
        (?P<kw>(?:PREFIX|CLOSED|AND|OR|NOT|IRI|BNODE|LITERAL|NONLITERAL|a)\b) |
        (?P<string>"(?:[^"\\]|\\.)*") |
        (?P<card>[?*+]|\{\d+(?:,(?:\d+|\*))?\}) |
        (?P<punct>[{}()\[\];@.])
    )""",
    re.VERBOSE,
)


def _tokenize(text: str):
    pos = 0
    out = []
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            if text[pos:].strip() == "":
                break
            raise RDFParseError(f"ShExC: cannot tokenize at {text[pos:pos+24]!r}")
        pos = m.end()
        if m.lastgroup == "comment":
            continue
        out.append((m.lastgroup, m.group(m.lastgroup)))
    return out


class ShexSchema:
    def __init__(self, shapes: dict[str, Shape], prefixes: dict[str, str]):
        self.shapes = shapes
        self.prefixes = prefixes


def parse_shexc(text: str) -> ShexSchema:
    toks = _tokenize(text)
    prefixes: dict[str, str] = {}
    shapes: dict[str, Shape] = {}
    i = 0

    def expand(kind: str, val: str) -> str:
        if kind == "iri":
            return val[1:-1]
        if kind == "pname":
            pfx, _, local = val.partition(":")
            if pfx not in prefixes:
                raise RDFParseError(f"ShExC: unknown prefix {pfx!r}")
            return prefixes[pfx] + local
        raise RDFParseError(f"ShExC: expected IRI, got {val!r}")

    def parse_value_expr():
        # boolean combinators at the VALUE-EXPRESSION level too
        # (e.g. <p> NOT IRI, <p> IRI OR [<v>]): NOT > AND > OR
        nonlocal i
        arms = [parse_value_and()]
        while i < len(toks) and toks[i] == ("kw", "OR"):
            i += 1
            arms.append(parse_value_and())
        return arms[0] if len(arms) == 1 else ("or", tuple(arms))

    def parse_value_and():
        nonlocal i
        arms = [parse_value_not()]
        while i < len(toks) and toks[i] == ("kw", "AND"):
            i += 1
            arms.append(parse_value_not())
        return arms[0] if len(arms) == 1 else ("and", tuple(arms))

    def parse_value_not():
        nonlocal i
        if i < len(toks) and toks[i] == ("kw", "NOT"):
            i += 1
            return ("not", parse_value_not())
        return parse_value_atom()

    def parse_value_atom():
        nonlocal i
        kind, val = toks[i]
        if kind == "punct" and val == "(":
            i += 1
            e = parse_value_expr()
            if toks[i] != ("punct", ")"):
                raise RDFParseError("ShExC: expected ')' in value expression")
            i += 1
            return e
        if kind == "punct" and val == "@":
            i += 1
            k2, v2 = toks[i]
            i += 1
            return ("ref", expand(k2, v2))
        if kind == "punct" and val == ".":
            i += 1
            return ("any",)
        if kind == "kw" and val in ("IRI", "BNODE", "LITERAL", "NONLITERAL"):
            i += 1
            return ("kind", val)
        if kind == "punct" and val == "[":
            i += 1
            vals = set()
            while not (toks[i][0] == "punct" and toks[i][1] == "]"):
                k2, v2 = toks[i]
                if k2 == "string":
                    vals.add(("lit", v2[1:-1]))
                else:
                    vals.add(("iri", expand(k2, v2)))
                i += 1
            i += 1
            return ("values", frozenset(vals))
        if kind in ("iri", "pname"):
            i += 1
            return ("datatype", expand(kind, val))
        raise RDFParseError(f"ShExC: bad value expression at {val!r}")

    def parse_card():
        nonlocal i
        if i < len(toks) and toks[i][0] == "card":
            c = toks[i][1]
            i += 1
            if c == "?":
                return 0, 1
            if c == "+":
                return 1, _UNBOUNDED
            if c == "*":
                return 0, _UNBOUNDED
            body = c[1:-1]
            if "," in body:
                lo, hi = body.split(",")
                return int(lo), (_UNBOUNDED if hi == "*" else int(hi))
            return int(body), int(body)
        return 1, 1

    def parse_braced_shape(label: str) -> Shape:
        nonlocal i
        closed = False
        if toks[i] == ("kw", "CLOSED"):
            closed = True
            i += 1
        if toks[i] != ("punct", "{"):
            raise RDFParseError(f"ShExC: expected '{{' in shape {label!r}")
        i += 1
        shape = Shape(label=label, closed=closed)
        while toks[i] != ("punct", "}"):
            pkind, pval = toks[i]
            pred = RDF_TYPE if (pkind == "kw" and pval == "a") else expand(pkind, pval)
            i += 1
            ve = parse_value_expr()
            lo, hi = parse_card()
            shape.constraints.append(TripleConstraint(pred, ve, lo, hi))
            if toks[i] == ("punct", ";"):
                i += 1
        i += 1
        return shape

    # shape expressions: NOT binds tightest, then AND, then OR
    # (jena-shex ShapeExprAnd/Or/Not; atoms are @<ref>, [CLOSED] { ... },
    # or a parenthesised expression)
    def parse_shape_atom(label: str):
        nonlocal i
        kind, val = toks[i]
        if kind == "punct" and val == "(":
            i += 1
            e = parse_shape_or(label)
            if toks[i] != ("punct", ")"):
                raise RDFParseError(f"ShExC: expected ')' in shape {label!r}")
            i += 1
            return e
        if kind == "punct" and val == "@":
            i += 1
            k2, v2 = toks[i]
            i += 1
            return ("ref", expand(k2, v2))
        return ("shape", parse_braced_shape(label))

    def parse_shape_not(label: str):
        nonlocal i
        if i < len(toks) and toks[i] == ("kw", "NOT"):
            i += 1
            return ("not", parse_shape_not(label))
        return parse_shape_atom(label)

    def parse_shape_and(label: str):
        nonlocal i
        arms = [parse_shape_not(label)]
        while i < len(toks) and toks[i] == ("kw", "AND"):
            i += 1
            arms.append(parse_shape_not(label))
        return arms[0] if len(arms) == 1 else ("and", tuple(arms))

    def parse_shape_or(label: str):
        nonlocal i
        arms = [parse_shape_and(label)]
        while i < len(toks) and toks[i] == ("kw", "OR"):
            i += 1
            arms.append(parse_shape_and(label))
        return arms[0] if len(arms) == 1 else ("or", tuple(arms))

    while i < len(toks):
        kind, val = toks[i]
        if kind == "kw" and val == "PREFIX":
            pfx = toks[i + 1][1]
            if not pfx.endswith(":"):
                pfx = pfx.partition(":")[0] + ":"
            prefixes[pfx[:-1]] = toks[i + 2][1][1:-1]
            i += 3
            continue
        # shape declaration: <Label> <ShapeExpr>
        label = expand(kind, val)
        i += 1
        shapes[label] = parse_shape_or(label)
    return ShexSchema(shapes, prefixes)


@dataclass
class ShapeMapEntry:
    shape: str
    node: str | None = None       # fixed focus node
    target_class: str | None = None  # {FOCUS a <C>}@shape


def parse_shape_map(text: str, schema: ShexSchema) -> list[ShapeMapEntry]:
    """``<node>@<Shape>`` per line, or ``{FOCUS a <Class>}@<Shape>``."""
    entries = []
    for line in text.splitlines():
        line = line.strip().rstrip(",")
        if not line or line.startswith("#"):
            continue
        m = re.match(r"\{\s*FOCUS\s+a\s+<([^>]*)>\s*\}\s*@\s*<([^>]*)>", line)
        if m:
            entries.append(ShapeMapEntry(shape=m.group(2), target_class=m.group(1)))
            continue
        m = re.match(r"<([^>]*)>\s*@\s*<([^>]*)>", line)
        if m:
            entries.append(ShapeMapEntry(shape=m.group(2), node=m.group(1)))
            continue
        raise RDFParseError(f"shape map: cannot parse {line!r}")
    for e in entries:
        if e.shape not in schema.shapes:
            raise RDFParseError(f"shape map references unknown shape {e.shape!r}")
    return entries


def _matches_value(ve: tuple, o_kind: int, o_lex: str, o_dt: str,
                   conf_sets: dict | None = None) -> bool:
    tag = ve[0]
    if tag == "any":
        return True
    if tag == "ref":
        if conf_sets is None or ve[1] not in conf_sets:
            return False
        return o_kind != KIND_LITERAL and o_lex in conf_sets[ve[1]]
    if tag == "kind":
        k = ve[1]
        return (
            (k == "IRI" and o_kind == KIND_IRI)
            or (k == "BNODE" and o_kind == KIND_BNODE)
            or (k == "LITERAL" and o_kind == KIND_LITERAL)
            or (k == "NONLITERAL" and o_kind != KIND_LITERAL)
        )
    if tag == "datatype":
        return o_kind == KIND_LITERAL and o_dt == ve[1]
    if tag == "values":
        probe = ("lit", o_lex) if o_kind == KIND_LITERAL else ("iri", o_lex)
        return probe in ve[1]
    if tag == "not":
        return not _matches_value(ve[1], o_kind, o_lex, o_dt, conf_sets)
    if tag == "and":
        return all(
            _matches_value(a, o_kind, o_lex, o_dt, conf_sets) for a in ve[1]
        )
    if tag == "or":
        return any(
            _matches_value(a, o_kind, o_lex, o_dt, conf_sets) for a in ve[1]
        )
    return False


def _validate_group(g: pd.DataFrame, shape: Shape,
                    conf_sets: dict | None = None) -> list[str]:
    """Violation reasons for one focus node (empty = conformant)."""
    reasons = []
    declared = {c.predicate for c in shape.constraints}
    for c in shape.constraints:
        rows = g[g["p"] == c.predicate]
        ok = rows.apply(
            lambda r: _matches_value(
                c.value_expr, int(r["o_kind"]), r["o_lex"], r["o_datatype"],
                conf_sets,
            ),
            axis=1,
        ) if len(rows) else pd.Series([], dtype=bool)
        n_ok = int(ok.sum())
        if n_ok != len(rows):
            reasons.append(f"{c.predicate}: value violates {c.value_expr[0]}")
        if n_ok < c.min_card:
            reasons.append(f"{c.predicate}: cardinality {n_ok} < min {c.min_card}")
        if c.max_card != _UNBOUNDED and n_ok > c.max_card:
            reasons.append(f"{c.predicate}: cardinality {n_ok} > max {c.max_card}")
    if shape.closed:
        extra = sorted(set(g["p"]) - declared)
        for p in extra:
            reasons.append(f"CLOSED shape: undeclared predicate {p}")
    return reasons


def _conforms_expr(g: pd.DataFrame, expr: tuple,
                   conf_sets: dict | None = None) -> list[str]:
    """Violation reasons for one focus node against a shape EXPRESSION
    (empty = conformant). jena-shex ShapeExprAnd/Or/Not semantics."""
    tag = expr[0]
    if tag == "shape":
        return _validate_group(g, expr[1], conf_sets)
    if tag == "ref":
        focus_kind = int(g["s_kind"].iloc[0])
        focus = g["s_lex"].iloc[0]
        ok = (
            conf_sets is not None
            and focus_kind != KIND_LITERAL
            and focus in conf_sets.get(expr[1], frozenset())
        )
        return [] if ok else [f"@{expr[1]}: focus does not conform"]
    if tag == "and":
        out: list[str] = []
        for arm in expr[1]:
            out.extend(_conforms_expr(g, arm, conf_sets))
        return out
    if tag == "or":
        for arm in expr[1]:
            if not _conforms_expr(g, arm, conf_sets):
                return []
        return ["OR: no disjunct satisfied"]
    if tag == "not":
        inner = _conforms_expr(g, expr[1], conf_sets)
        return [] if inner else ["NOT: inner shape expression satisfied"]
    raise RDFParseError(f"ShEx: unknown shape expression {expr!r}")


def _ve_refs(ve: tuple) -> set:
    if ve[0] == "ref":
        return {ve[1]}
    if ve[0] == "not":
        return _ve_refs(ve[1])
    if ve[0] in ("and", "or"):
        out: set = set()
        for a in ve[1]:
            out |= _ve_refs(a)
        return out
    return set()


def _shape_refs(expr) -> set:
    """All @<ref> labels reachable in a shape expression (both expr-level
    refs and refs anywhere inside triple-constraint value expressions)."""
    tag = expr[0]
    if tag == "shape":
        out: set = set()
        for c in expr[1].constraints:
            out |= _ve_refs(c.value_expr)
        return out
    if tag == "ref":
        return {expr[1]}
    if tag in ("and", "or"):
        out: set = set()
        for arm in expr[1]:
            out |= _shape_refs(arm)
        return out
    if tag == "not":
        return _shape_refs(expr[1])
    raise RDFParseError(f"ShEx: unknown shape expression {expr!r}")


def _ve_refs_signed(ve: tuple, neg: bool) -> set:
    if ve[0] == "ref":
        return {(ve[1], neg)}
    if ve[0] == "not":
        return _ve_refs_signed(ve[1], not neg)
    if ve[0] in ("and", "or"):
        out: set = set()
        for a in ve[1]:
            out |= _ve_refs_signed(a, neg)
        return out
    return set()


def _shape_refs_signed(expr, neg: bool = False) -> set:
    """(label, under-odd-NOTs) pairs for every @<ref> in the expression —
    the polarity drives the stratified-negation check on cycles."""
    tag = expr[0]
    if tag == "shape":
        out: set = set()
        for c in expr[1].constraints:
            out |= _ve_refs_signed(c.value_expr, neg)
        return out
    if tag == "ref":
        return {(expr[1], neg)}
    if tag in ("and", "or"):
        out: set = set()
        for arm in expr[1]:
            out |= _shape_refs_signed(arm, neg)
        return out
    if tag == "not":
        return _shape_refs_signed(expr[1], not neg)
    raise RDFParseError(f"ShEx: unknown shape expression {expr!r}")


def _ref_sccs(schema: ShexSchema) -> list[list[str]]:
    """Strongly-connected components of the shape-reference graph, in
    dependency order (referenced-before-referring). Unknown refs raise."""
    deps: dict[str, set] = {}
    for label in sorted(schema.shapes):
        refs = _shape_refs(schema.shapes[label])
        for dep in refs:
            if dep not in schema.shapes:
                raise RDFParseError(f"ShEx: reference to unknown shape {dep!r}")
        deps[label] = refs
    # iterative Tarjan (schema graphs are tiny — driver-side)
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set = set()
    stack: list[str] = []
    sccs: list[list[str]] = []
    counter = [0]

    def strongconnect(v: str):
        work = [(v, iter(sorted(deps[v])))]
        index[v] = low[v] = counter[0]
        counter[0] += 1
        stack.append(v)
        on_stack.add(v)
        while work:
            node, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(sorted(deps[w]))))
                    advanced = True
                    break
                if w in on_stack:
                    low[node] = min(low[node], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])
            if low[node] == index[node]:
                scc = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    scc.append(w)
                    if w == node:
                        break
                sccs.append(sorted(scc))

    for label in sorted(schema.shapes):
        if label not in index:
            strongconnect(label)
    return sccs  # Tarjan emits components in reverse-topological order
                 # of the condensation = dependencies first


def _conforming_nodes(triples_ds, schema: ShexSchema, label: str,
                      conf_sets: dict) -> frozenset:
    """One distributed pass: the set of IRI subjects conforming to
    `label` (plus empty-group conformance handled analytically)."""
    import ray

    state_ref = ray.put((schema.shapes[label], dict(conf_sets)))

    def check(g: pd.DataFrame) -> pd.DataFrame:
        expr, refs = ray.get(state_ref)
        if int(g["s_kind"].iloc[0]) != KIND_IRI:
            return pd.DataFrame({"node": []}).astype(str)
        if _conforms_expr(g, expr, refs):
            return pd.DataFrame({"node": []}).astype(str)
        return pd.DataFrame({"node": [g["s_lex"].iloc[0]]})

    rows = (
        triples_ds.groupby(["s_kind", "s_lex"])
        .map_groups(check, batch_format="pandas")
        .take_all()
    )
    return frozenset(r["node"] for r in rows)


def _universe_nodes(triples_ds) -> frozenset:
    """All IRI subject nodes — the gfp starting assumption for recursive
    SCCs (same focus-node-scale broadcast assumption as conf sets)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def subj(t: pa.Table) -> pa.Table:
        x = t.filter(pc.equal(t["s_kind"], pa.scalar(KIND_IRI, pa.int8())))
        return pa.table(
            {"node": x["s_lex"].combine_chunks().cast(pa.large_string())}
        )

    rows = (
        triples_ds.map_batches(subj, batch_format="pyarrow")
        .groupby("node")
        .count()
        .take_all()
    )
    return frozenset(r["node"] for r in rows)


def _resolve_conf_sets(triples_ds, schema: ShexSchema) -> dict:
    """Conformance sets for every referenced shape, SCC by SCC.

    Acyclic SCCs: one distributed pass (the round-2 behavior). Cyclic
    SCCs: greatest-fixpoint iteration — assume every IRI subject
    conforms, re-run the component's passes under the assumptions, drop
    failures, repeat until stable (maximal typing; see module
    docstring). Negation into a cycle raises (non-stratified)."""
    referenced: set = set()
    for label in schema.shapes:
        referenced |= _shape_refs(schema.shapes[label])

    conf_sets: dict[str, frozenset] = {}
    universe: frozenset | None = None
    for scc in _ref_sccs(schema):
        cyclic = len(scc) > 1 or scc[0] in _shape_refs(schema.shapes[scc[0]])
        if not cyclic:
            label = scc[0]
            if label in referenced:
                conf_sets[label] = _conforming_nodes(
                    triples_ds, schema, label, conf_sets
                )
            continue
        in_scc = set(scc)
        for label in scc:
            for dep, neg in _shape_refs_signed(schema.shapes[label]):
                if neg and dep in in_scc:
                    raise RDFParseError(
                        f"ShEx: negated reference @{dep} inside recursive "
                        f"cycle {scc} (non-stratified)"
                    )
        if universe is None:
            universe = _universe_nodes(triples_ds)
        for label in scc:
            conf_sets[label] = universe
        while True:
            changed = False
            for label in scc:
                new = _conforming_nodes(triples_ds, schema, label, conf_sets)
                if new != conf_sets[label]:
                    conf_sets[label] = new
                    changed = True
            if not changed:
                break
    return conf_sets


def validate_shex(triples_ds, schema_text: str, shape_map_text: str):
    """ShEx validation report Dataset: (focus, shape, status, reason).

    Shape references run first, in dependency order — each referenced
    shape does one full per-focus pass and its conforming-node set is
    broadcast into the next level (see module docstring for the scale
    assumption)."""
    import ray

    schema = parse_shexc(schema_text)
    entries = parse_shape_map(shape_map_text, schema)

    conf_sets = _resolve_conf_sets(triples_ds, schema)

    state_ref = ray.put((schema, entries, conf_sets))

    def validate(g: pd.DataFrame) -> pd.DataFrame:
        schema_, entries_, refs = ray.get(state_ref)
        focus = g["s_lex"].iloc[0]
        if int(g["s_kind"].iloc[0]) != KIND_IRI:
            return pd.DataFrame(
                {"focus": [], "shape": [], "status": [], "reason": []}
            ).astype(str)
        types = set(g.loc[g["p"] == RDF_TYPE, "o_lex"])
        out = {"focus": [], "shape": [], "status": [], "reason": []}
        for e in entries_:
            applies = (e.node == focus) if e.node else (e.target_class in types)
            if not applies:
                continue
            reasons = _conforms_expr(g, schema_.shapes[e.shape], refs)
            out["focus"].append(focus)
            out["shape"].append(e.shape)
            out["status"].append("nonconformant" if reasons else "conformant")
            out["reason"].append("; ".join(reasons))
        return pd.DataFrame(out)

    return triples_ds.groupby(["s_kind", "s_lex"]).map_groups(
        validate, batch_format="pandas"
    )
