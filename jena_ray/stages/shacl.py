"""SHACL-core validation as a post-materialize stage.

Parity: jena-shacl (ShaclValidator.java:66-72); SURVEY §2.11 maps it to a
"per-focus-node map_groups" validation stage. Implemented subset of SHACL
core, enough for schema-shaped KG QA at scale:

- sh:NodeShape with sh:targetClass / sh:targetNode
- sh:property blocks: sh:path (IRI), sh:minCount, sh:maxCount,
  sh:datatype, sh:nodeKind (sh:IRI / sh:BlankNode / sh:Literal),
  sh:pattern, sh:minInclusive / sh:maxInclusive
- sh:class (round 3): cross-node — the class-member sets are computed by
  ONE distributed pass over the data (rdf:type scan for every class any
  sh:class names) and broadcast into the per-focus validation, the same
  conforming-set pattern as stages/shex.py shape refs. Partitioning
  assumption (documented): class extents are broadcast-scale; swap for a
  hash join on the object column at corpus scale.
- sh:or / sh:and / sh:not (round 3): logical constraint components over
  VALUE-level operand blocks inside a property shape
  (jena-shacl engine/constraint/ShOr/ShAnd/ShNot), RDF-list operands.
- sh:sparql (round 3): SPARQL-based constraints (SHACL §5;
  engine/SparqlConstraints.java, constraint/SparqlConstraint.java) —
  sh:select with $this, sh:message, sh:prefixes/sh:declare,
  sh:deactivated. Redesigned for scale: instead of the reference's
  per-focus-node query re-execution, each constraint query runs ONCE
  distributed through the ops/sparql front door with ?this free, and an
  inner hash join against the shape's distinct focus-node Dataset keeps
  exactly the targeted solutions; every surviving row is a violation.
- sh:node (round 3): cross-shape refs — each referenced node shape runs
  one distributed per-focus pass in dependency order and its
  (conforming, nonconforming, empty-conformance) verdict sets are
  broadcast into the referring validation (ShNode.java re-enters the
  validator; cyclic refs raise, as jena-shacl's re-entrancy check does).

Execution shape: the (small) shapes graph is parsed with our own Turtle
parser and broadcast; data triples are hash-grouped by subject so each
focus node's triples are co-located, then validated vectorized-per-group.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..model import KIND_BNODE, KIND_IRI, KIND_LITERAL, RDF_TYPE
from ..rdf.turtle import parse_turtle

SH = "http://www.w3.org/ns/shacl#"


@dataclass
class SparqlConstraint:
    """An sh:sparql SELECT constraint (SHACL §5, SPARQL-based
    Constraints; jena-shacl engine/constraint/SparqlConstraint.java).
    ``query`` is the full SELECT text with PREFIX lines already
    prepended from sh:prefixes/sh:declare and ``$var`` rewritten to
    ``?var``; every solution row is a violation for its ?this focus."""

    query: str
    message: str | None = None
    # "select": every solution row is a violation. "ask" (component
    # ASK validators): ``query`` is the body rewritten to
    # SELECT ?this ?value; a candidate (this, value) pair CONFORMS iff
    # it survives the pre-bound evaluation — misses are violations.
    form: str = "select"
    path: str | None = None  # property-shape components: the sh:path


@dataclass
class SparqlComponent:
    """A parameterized SPARQL constraint component (SHACL §6;
    jena-shacl parser/ConstraintComponents.java +
    engine/constraint/ConstraintComponentSPARQL.java:45-52,
    SparqlComponent.java). ``params``: (predicate IRI, variable name =
    the path's local name, optional?) declared via sh:parameter.
    Validators: the SELECT form (sh:SPARQLSelectValidator via
    sh:nodeValidator / sh:propertyValidator / generic sh:validator —
    every solution row is a violation) and the ASK form
    (sh:SPARQLAskValidator, sh:ask — per-(this, value) pre-binding,
    rewritten to SELECT ?this ?value and run ONCE over the candidate
    pair Dataset with pre-binding expressed as a join; pairs the body
    does not return are violations)."""

    name: str
    params: list  # [(pred_iri, var_name, optional)]
    node_select: tuple | None = None  # (query_text, message|None)
    prop_select: tuple | None = None
    # ASK validators (sh:SPARQLAskValidator, sh:ask): stored as the
    # rewritten SELECT ?this ?value body (see SparqlConstraint.form)
    node_ask: tuple | None = None
    prop_ask: tuple | None = None


@dataclass
class PropertyShape:
    path: str
    min_count: int | None = None
    max_count: int | None = None
    datatype: str | None = None
    node_kind: str | None = None
    pattern: str | None = None
    min_inclusive: float | None = None
    max_inclusive: float | None = None
    cls: str | None = None  # sh:class — value must be an instance of cls
    node: str | None = None  # sh:node — value must conform to that shape
    # logical constraint components; operands are value-level blocks
    ors: list = field(default_factory=list)   # list[list[PropertyShape]]
    ands: list = field(default_factory=list)  # list[list[PropertyShape]]
    nots: list = field(default_factory=list)  # list[PropertyShape]


@dataclass
class NodeShape:
    name: str
    target_classes: list[str] = field(default_factory=list)
    target_nodes: list[str] = field(default_factory=list)
    properties: list[PropertyShape] = field(default_factory=list)
    sparql: list[SparqlConstraint] = field(default_factory=list)
    # sh:targetNode TERMS (kind, lex, dt, lang) — ASK validators need
    # the value's term metadata (focus nodes may be literals)
    target_node_terms: list = field(default_factory=list)


RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _walk_list(spo, vals, head):
    """RDF collection (rdf:first/rdf:rest) → list of (kind, value) items."""
    items = []
    node = head
    while node and node[1] != RDF_NS + "nil":
        first = vals(node, RDF_NS + "first")
        if not first:
            break
        items.append(first[0])
        rest = vals(node, RDF_NS + "rest")
        node = rest[0] if rest else None
    return items


def parse_shapes(shapes_ttl: str, base: str = "") -> list[NodeShape]:
    triples = parse_turtle(shapes_ttl, base=base)
    spo: dict[tuple, dict[str, list]] = {}
    spo_full: dict[tuple, dict[str, list]] = {}
    for t in triples:
        spo.setdefault((t[0], t[1]), {}).setdefault(t[2], []).append(
            (t[3], t[4])
        )
        spo_full.setdefault((t[0], t[1]), {}).setdefault(t[2], []).append(
            (t[3], t[4], t[5], t[6])
        )

    def vals(node, p):
        return spo.get(node, {}).get(p, [])

    def fvals(node, p):
        return spo_full.get(node, {}).get(p, [])

    components = _parse_components(spo, vals)

    def parse_block(bnode) -> PropertyShape:
        """A value-level constraint block (the operand form of sh:or /
        sh:and / sh:not — jena-shacl parser/ConstraintComponents): the
        same facets as a property shape, without sh:path/counts."""
        ps = PropertyShape(path="")
        _fill_facets(ps, bnode, vals, parse_block)
        return ps

    def _fill_facets(ps, pnode, vals, parse_block):
        for key, attr, conv in [
            ("minInclusive", "min_inclusive", float),
            ("maxInclusive", "max_inclusive", float),
        ]:
            v = vals(pnode, SH + key)
            if v:
                setattr(ps, attr, conv(v[0][1]))
        for key, attr in [
            ("datatype", "datatype"),
            ("nodeKind", "node_kind"),
            ("pattern", "pattern"),
            ("class", "cls"),
            ("node", "node"),
        ]:
            v = vals(pnode, SH + key)
            if v:
                setattr(ps, attr, v[0][1])
        for key, attr in [("or", "ors"), ("and", "ands")]:
            for head in vals(pnode, SH + key):
                getattr(ps, attr).append(
                    [parse_block(item) for item in _walk_list(spo, vals, head)]
                )
        for neg in vals(pnode, SH + "not"):
            ps.nots.append(parse_block(neg))

    shapes = []
    for node, props in spo.items():
        if not any(v == SH + "NodeShape" for _, v in props.get(RDF_TYPE, [])):
            continue
        ns = NodeShape(name=node[1])
        ns.target_classes = [v for _, v in vals(node, SH + "targetClass")]
        ns.target_nodes = [v for _, v in vals(node, SH + "targetNode")]
        ns.target_node_terms = list(fvals(node, SH + "targetNode"))
        for pk, pv in vals(node, SH + "property"):
            pnode = (pk, pv)
            paths = vals(pnode, SH + "path")
            if not paths:
                continue
            ps = PropertyShape(path=paths[0][1])
            for key, attr in [("minCount", "min_count"), ("maxCount", "max_count")]:
                v = vals(pnode, SH + key)
                if v:
                    setattr(ps, attr, int(v[0][1]))
            _fill_facets(ps, pnode, vals, parse_block)
            ns.properties.append(ps)
            for comp in components:
                ns.sparql.extend(_instantiate_component(
                    comp, pnode, fvals, "prop", path=ps.path))
        for ck, cv in vals(node, SH + "sparql"):
            sc = _parse_sparql_constraint(spo, vals, (ck, cv))
            if sc is not None:
                ns.sparql.append(sc)
        for comp in components:
            ns.sparql.extend(_instantiate_component(comp, node, fvals, "node"))
        shapes.append(ns)
    return shapes


def _parse_components(spo, vals) -> list[SparqlComponent]:
    """sh:ConstraintComponent declarations → SparqlComponent list
    (parser/ConstraintComponents.java): sh:parameter blocks give the
    parameter predicates (variable name = the path IRI's local name,
    Parameter.getSparqlName), sh:nodeValidator / sh:propertyValidator /
    generic sh:validator give the SELECT validators. ASK validators are
    skipped (documented out — see SparqlComponent)."""
    # subclass-aware detection: a component may be typed with a class
    # that is rdfs:subClassOf* sh:ConstraintComponent within the shapes
    # graph (std/sparql/component/validator-001.ttl does exactly this)
    RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
    parents: dict[str, set] = {}
    for node, props in spo.items():
        for _, sup in props.get(RDFS_SUBCLASS, []):
            parents.setdefault(node[1], set()).add(sup)

    def _is_component_class(c: str, seen=None) -> bool:
        if c == SH + "ConstraintComponent":
            return True
        seen = seen or set()
        if c in seen:
            return False
        seen.add(c)
        return any(_is_component_class(p, seen)
                   for p in parents.get(c, ()))

    out = []
    for node, props in spo.items():
        if not any(_is_component_class(v)
                   for _, v in props.get(RDF_TYPE, [])):
            continue
        params = []
        for pk, pv in vals(node, SH + "parameter"):
            pnode = (pk, pv)
            path = vals(pnode, SH + "path")
            if not path:
                continue
            pred = path[0][1]
            var = pred.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
            opt = vals(pnode, SH + "optional")
            params.append((pred, var, bool(opt and opt[0][1] == "true")))
        if not params:
            continue
        comp = SparqlComponent(name=node[1], params=params)

        def select_of(vnode):
            sel = vals(vnode, SH + "select")
            if not sel:
                return None
            msg = vals(vnode, SH + "message")
            query = "\n".join(
                _prefix_lines(spo, vals, vnode) + [sel[0][1]])
            return (query, msg[0][1] if msg else None)

        def ask_of(vnode):
            """sh:ask body → SELECT ?this ?value text (the pre-binding-
            as-a-join execution evaluates it once over the candidate
            (this, value) pair Dataset; conformance = row survives)."""
            ask = vals(vnode, SH + "ask")
            if not ask:
                return None
            msg = vals(vnode, SH + "message")
            text = ask[0][1]
            m = re.search(r"\bASK\b", text, re.I)
            if m is None:
                return None
            body = text[m.end():].strip()
            query = "\n".join(
                _prefix_lines(spo, vals, vnode)
                + ["SELECT ?this ?value WHERE " + body])
            return (query, msg[0][1] if msg else None)

        for key, sel_attr, ask_attr in [
                ("nodeValidator", "node_select", "node_ask"),
                ("propertyValidator", "prop_select", "prop_ask"),
                ("validator", None, None)]:
            for vk, vv in vals(node, SH + key):
                got = select_of((vk, vv))
                got_ask = ask_of((vk, vv))
                if sel_attr is not None:
                    if got is not None:
                        setattr(comp, sel_attr, got)
                    if got_ask is not None:
                        setattr(comp, ask_attr, got_ask)
                else:  # generic validator: fills both unset slots
                    if got is not None:
                        if comp.node_select is None:
                            comp.node_select = got
                        if comp.prop_select is None:
                            comp.prop_select = got
                    if got_ask is not None:
                        if comp.node_ask is None:
                            comp.node_ask = got_ask
                        if comp.prop_ask is None:
                            comp.prop_ask = got_ask
        if (comp.node_select or comp.prop_select
                or comp.node_ask or comp.prop_ask):
            out.append(comp)
    return out


def _term_text(kind, lex, dt="", lang=""):
    """A parse-result term → SPARQL term text (for substituting a
    component parameter binding into the validator query)."""
    from ..model import XSD_STRING

    if kind == KIND_IRI:
        return f"<{lex}>"
    if kind == KIND_BNODE:
        return f"_:{lex}"
    esc = (lex.replace("\\", "\\\\").replace('"', '\\"')
           .replace("\n", "\\n").replace("\r", "\\r"))
    if lang:
        return f'"{esc}"@{lang}'
    if dt and dt != XSD_STRING:
        return f'"{esc}"^^<{dt}>'
    return f'"{esc}"'


def _instantiate_component(comp: SparqlComponent, node, fvals, kind: str,
                           path: str | None = None) -> list[SparqlConstraint]:
    """One SparqlConstraint per combination of the shape's parameter
    values (ConstraintComponentSPARQL: parameter bindings substituted
    into the component query as constants, $PATH as the property path;
    a shape missing a MANDATORY parameter does not invoke the
    component). Optional parameters referenced by the query but absent
    on the shape stay free — pair them with COALESCE in the validator."""
    import itertools

    form = "select"
    sel = comp.node_select if kind == "node" else comp.prop_select
    if sel is None:
        sel = comp.node_ask if kind == "node" else comp.prop_ask
        form = "ask"
    if sel is None:
        return []
    bindings: dict[str, list] = {}
    for pred, var, optional in comp.params:
        vs = fvals(node, pred)
        if not vs:
            if not optional:
                return []  # mandatory parameter missing: not invoked
            continue
        bindings[var] = vs
    if not bindings:
        return []
    query, msg = sel
    out = []
    keys = sorted(bindings)
    for combo in itertools.product(*(bindings[k] for k in keys)):
        qtext = query
        for k, term in zip(keys, combo):
            qtext = re.sub(r"[?$]" + re.escape(k) + r"\b",
                           _term_text(*term).replace("\\", "\\\\"), qtext)
        if path is not None:
            qtext = qtext.replace("$PATH", f"<{path}>")
        qtext = re.sub(r"\$([A-Za-z_]\w*)", r"?\1", qtext)
        out.append(SparqlConstraint(query=qtext, message=msg,
                                    form=form, path=path))
    return out


def _parse_sparql_constraint(spo, vals, cnode):
    """sh:sparql block → SparqlConstraint
    (engine/SparqlConstraints.parseSparqlConstraint +
    lib/ShLib.extractSPARQLQuery): sh:select holds the query text,
    sh:prefixes names a resource whose sh:declare blocks
    (sh:prefix/sh:namespace) become PREFIX lines, sh:deactivated true
    skips the constraint, ``$this``-style pre-bound variables are
    rewritten to plain ``?this`` (the engine runs the query ONCE with
    ?this free and semi-joins against the focus set, instead of
    re-executing per focus node)."""
    deact = vals(cnode, SH + "deactivated")
    if deact and deact[0][1] == "true":
        return None
    sel = vals(cnode, SH + "select")
    if not sel:
        raise ValueError("sh:sparql block without sh:select")
    query = sel[0][1]
    query = "\n".join(_prefix_lines(spo, vals, cnode)
                      + [re.sub(r"\$([A-Za-z_]\w*)", r"?\1", query)])
    msg = vals(cnode, SH + "message")
    return SparqlConstraint(query=query, message=msg[0][1] if msg else None)


def _prefix_lines(spo, vals, node) -> list[str]:
    """sh:prefixes → PREFIX lines (ShLib.extractSPARQLQuery): the named
    resource's sh:declare blocks carry sh:prefix / sh:namespace."""
    out = []
    for pk, pv in vals(node, SH + "prefixes"):
        for dk, dv in vals((pk, pv), SH + "declare"):
            dnode = (dk, dv)
            pfx = vals(dnode, SH + "prefix")
            ns_ = vals(dnode, SH + "namespace")
            if pfx and ns_:
                out.append(f"PREFIX {pfx[0][1]}: <{ns_[0][1]}>")
    return out


def _check_value(ps: PropertyShape, o_kind, o_lex, o_datatype, ctx):
    """Violations of ONE value against a (property or operand) shape's
    value-level facets, including the logical components. Empty list =
    the value conforms (jena-shacl engine/constraint/* per-value eval).
    ``ctx``: {"classes": cls → member set,
    "nodes": shape IRI → (conf, nonconf, empty_ok)}."""
    class_members = ctx["classes"]
    out = []
    if ps.node_kind == SH + "IRI" and o_kind != KIND_IRI:
        out.append(("nodeKind", "not an IRI"))
    if ps.node_kind == SH + "Literal" and o_kind != KIND_LITERAL:
        out.append(("nodeKind", "not a literal"))
    if ps.node_kind == SH + "BlankNode" and o_kind != KIND_BNODE:
        out.append(("nodeKind", "not a bnode"))
    if ps.datatype is not None and (
        o_kind != KIND_LITERAL or o_datatype != ps.datatype
    ):
        out.append(("datatype", f"expected {ps.datatype}"))
    if ps.pattern is not None and not re.search(ps.pattern, str(o_lex)):
        out.append(("pattern", f"!~ /{ps.pattern}/"))
    if ps.min_inclusive is not None or ps.max_inclusive is not None:
        try:
            x = float(o_lex)
        except (TypeError, ValueError):
            x = None
            out.append(("range", "not numeric"))
        if x is not None:
            if ps.min_inclusive is not None and x < ps.min_inclusive:
                out.append(("minInclusive", f"{x} < {ps.min_inclusive}"))
            if ps.max_inclusive is not None and x > ps.max_inclusive:
                out.append(("maxInclusive", f"{x} > {ps.max_inclusive}"))
    if ps.cls is not None and o_lex not in class_members.get(ps.cls, ()):
        out.append(("class", f"not an instance of {ps.cls}"))
    if ps.node is not None:
        conf, nonconf, empty_ok = ctx["nodes"][ps.node]
        ok = o_lex in conf or (
            empty_ok and o_lex not in conf and o_lex not in nonconf
        )
        if not ok:
            out.append(("node", f"value does not conform to {ps.node}"))
    for operands in ps.ors:
        if all(
            _check_value(op, o_kind, o_lex, o_datatype, ctx)
            for op in operands
        ):
            out.append(("or", "no sh:or operand conforms"))
    for operands in ps.ands:
        if any(
            _check_value(op, o_kind, o_lex, o_datatype, ctx)
            for op in operands
        ):
            out.append(("and", "an sh:and operand fails"))
    for neg in ps.nots:
        if not _check_value(neg, o_kind, o_lex, o_datatype, ctx):
            out.append(("not", "value conforms to the sh:not shape"))
    return out


def _validate_focus(group: pd.DataFrame, shapes: list[NodeShape], ctx):
    """All triples of ONE subject → violation rows."""
    focus = group["s_lex"].iloc[0]
    types = set(group.loc[group["p"] == RDF_TYPE, "o_lex"])
    out = []
    for shape in shapes:
        applies = focus in shape.target_nodes or bool(
            types.intersection(shape.target_classes)
        )
        if not applies:
            continue
        for ps in shape.properties:
            vals = group[group["p"] == ps.path]
            n = len(vals)
            if ps.min_count is not None and n < ps.min_count:
                out.append((focus, ps.path, "minCount",
                            f"{n} < {ps.min_count}"))
            if ps.max_count is not None and n > ps.max_count:
                out.append((focus, ps.path, "maxCount",
                            f"{n} > {ps.max_count}"))
            for _, row in vals.iterrows():
                out.extend(
                    (focus, ps.path, c, d)
                    for c, d in _check_value(
                        ps, row["o_kind"], row["o_lex"],
                        row["o_datatype"], ctx,
                    )
                )
    return out


def _walk_blocks(shapes: list[NodeShape]):
    """Every value-level constraint block reachable from the shapes
    (property shapes + logical operands, recursively)."""

    def walk(ps: PropertyShape):
        yield ps
        for operands in ps.ors:
            for op in operands:
                yield from walk(op)
        for operands in ps.ands:
            for op in operands:
                yield from walk(op)
        for neg in ps.nots:
            yield from walk(neg)

    for shape in shapes:
        for ps in shape.properties:
            yield from walk(ps)


def _collect_classes(shapes: list[NodeShape]) -> set[str]:
    """Every class an sh:class facet names, recursively through the
    logical operands."""
    return {ps.cls for ps in _walk_blocks(shapes) if ps.cls}


def _node_conf_sets(triples_ds, all_shapes: list[NodeShape], ctx) -> dict:
    """sh:node targets → (conforming subjects, nonconforming subjects,
    empty_ok) — one distributed per-focus pass per referenced shape,
    dependency-ordered (engine/constraint/ShNode.java re-enters the
    validator on the value node; here the value-side verdicts are
    precomputed and broadcast, the stages/shex.py conforming-set
    pattern). Cyclic sh:node references raise (jena-shacl detects
    re-entrant validation the same way)."""
    import ray

    by_name = {s.name: s for s in all_shapes}
    refs = {ps.node for ps in _walk_blocks(all_shapes) if ps.node}
    for r in refs:
        if r not in by_name:
            raise ValueError(f"sh:node reference to unknown shape {r!r}")

    # dependency order (referenced-before-referring); cycles raise
    order: list[str] = []
    state: dict[str, int] = {}

    def visit(name: str, chain: tuple):
        if name in chain:
            raise ValueError(f"cyclic sh:node references: {chain + (name,)}")
        if state.get(name) == 1:
            return
        deps = {ps.node for ps in _walk_blocks([by_name[name]]) if ps.node}
        for dep in sorted(deps):
            visit(dep, chain + (name,))
        state[name] = 1
        order.append(name)

    for r in sorted(refs):
        visit(r, ())

    out: dict[str, tuple] = {}
    for name in order:
        shape = by_name[name]
        empty_ok = all(
            not ps.min_count for ps in shape.properties
        )
        ref = ray.put((shape, {**ctx, "nodes": dict(out)}))

        def check(g: pd.DataFrame) -> pd.DataFrame:
            shape_, ctx_ = ray.get(ref)
            focus = g["s_lex"].iloc[0]
            probe = NodeShape(
                name=shape_.name, target_nodes=[focus],
                properties=shape_.properties,
            )
            bad = _validate_focus(g, [probe], ctx_)
            return pd.DataFrame(
                {"node": [focus], "ok": [0 if bad else 1]}
            )

        rows = (
            triples_ds.groupby("s_lex")
            .map_groups(check, batch_format="pandas")
            .take_all()
        )
        conf = frozenset(r["node"] for r in rows if r["ok"])
        nonconf = frozenset(r["node"] for r in rows if not r["ok"])
        out[name] = (conf, nonconf, empty_ok)
    return out


def _class_extents(triples_ds, classes: set[str]) -> dict[str, set]:
    """cls → set of instance IRIs, honoring rdfs:subClassOf closure in
    the data graph (SHACL "SHACL instance" semantics). ONE distributed
    filter pass over the data; the subClassOf triples (schema-scale) and
    the named classes' extents (broadcast-scale by the documented
    partitioning assumption) are collected."""
    if not classes:
        return {}
    RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"

    def _scan(pred_iri: str):
        def fn(t):
            import pyarrow.compute as pc

            return t.filter(pc.equal(t.column("p"), pred_iri)).select(
                ["s_lex", "o_lex"]
            )

        return fn

    subs = triples_ds.map_batches(
        _scan(RDFS_SUBCLASS), batch_format="pyarrow"
    ).take_all()
    # implies[t] = named classes that an instance of t belongs to
    parents: dict[str, set[str]] = {}
    for r in subs:
        parents.setdefault(r["s_lex"], set()).add(r["o_lex"])
    implies: dict[str, set[str]] = {}

    def ancestors(t, seen):
        if t in implies:
            return implies[t]
        seen.add(t)
        acc = {t}
        for p in parents.get(t, ()):
            if p not in seen:
                acc |= ancestors(p, seen)
            else:
                acc.add(p)
        implies[t] = acc
        return acc

    for t in set(parents) | classes:
        ancestors(t, set())
    typed = triples_ds.map_batches(
        _scan(RDF_TYPE), batch_format="pyarrow"
    ).take_all()
    members: dict[str, set] = {c: set() for c in classes}
    for r in typed:
        for c in implies.get(r["o_lex"], {r["o_lex"]}):
            if c in members:
                members[c].add(r["s_lex"])
    return members


def _focus_dataset(triples_ds, shape: NodeShape):
    """Distinct focus nodes of a shape as a 1-column Dataset (``this``):
    subjects rdf:type'd with a target class (one distributed filter
    pass) unioned with the explicit sh:targetNode list. Stays a Dataset
    end to end — the focus set of a targetClass over a 100 TB graph is
    not driver-sized."""
    import ray

    parts = []
    if shape.target_classes:
        classes = pa.array(shape.target_classes, pa.large_string())

        def scan(t: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.equal(t.column("p"), RDF_TYPE),
                pc.is_in(t.column("o_lex").cast(pa.large_string()),
                         value_set=classes),
            )
            return pa.table(
                {"this": t.filter(m).column("s_lex").combine_chunks()
                 .cast(pa.large_string())}
            )

        parts.append(triples_ds.map_batches(scan, batch_format="pyarrow"))
    if shape.target_nodes:
        parts.append(ray.data.from_arrow(pa.table(
            {"this": pa.array(shape.target_nodes, pa.large_string())}
        )))
    if not parts:
        return None
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def _sparql_violations(triples_ds, shapes: list[NodeShape]):
    """All sh:sparql constraint violations as ONE Dataset with the
    validate() schema, or None if no shape has SPARQL constraints.

    Execution shape (redesigned from jena-shacl's
    SparqlValidation.validate per-focus-node loop): each constraint
    query runs ONCE over the whole data Dataset with ?this as a free
    variable, then an inner hash join on ``this`` against the shape's
    distinct focus-node Dataset keeps exactly the solutions whose focus
    is targeted — every surviving row is a violation (SHACL §5.3)."""
    from ..util import compact_blocks

    per_constraint = []
    for shape in shapes:
        if not shape.sparql:
            continue
        focus = _focus_dataset(triples_ds, shape)
        if focus is None:
            continue
        # distinct focus keys with a marker (min = dedup)
        fkeys = compact_blocks(
            focus.map_batches(
                lambda t: t.append_column(
                    "__f", pa.array([1] * t.num_rows, pa.int8())
                ),
                batch_format="pyarrow",
            )
            .groupby("this")
            .min("__f")
            .map_batches(
                lambda t: pa.table(
                    {"this": t.column("this").combine_chunks()
                     .cast(pa.large_string()),
                     "__f": t.column(1).combine_chunks().cast(pa.int8())}
                )
                if t.num_columns
                else t,
                batch_format="pyarrow",
            )
        )
        for sc in shape.sparql:
            from ..ops.sparql import sparql_select

            if sc.form == "ask":
                pairs = _ask_pairs(triples_ds, shape, fkeys, sc.path)
                if pairs is None:
                    continue
                per_constraint.append(
                    _ask_violations(triples_ds, sc, pairs))
                continue
            res = compact_blocks(sparql_select(triples_ds, sc.query))
            if "this" not in res.schema().names:
                raise ValueError(
                    "sh:sparql SELECT must project $this: " + sc.query
                )
            n_parts = max(1, min(64, res.count() // 2_000_000))
            joined = res.join(
                fkeys, join_type="inner", num_partitions=n_parts,
                on=("this",),
            )
            msg = sc.message or "sh:sparql constraint violation"

            def to_viol(t: pa.Table, _msg=msg) -> pa.Table:
                n = t.num_rows
                names = t.schema.names
                if "path" in names:
                    path = pc.coalesce(
                        t.column("path").combine_chunks()
                        .cast(pa.large_string()),
                        pa.scalar("", pa.large_string()),
                    )
                else:
                    path = pa.array([""] * n, pa.large_string())
                return pa.table({
                    "focus": t.column("this").combine_chunks()
                    .cast(pa.large_string()),
                    "path": path,
                    "constraint": pa.array(["sparql"] * n,
                                           pa.large_string()),
                    "detail": pa.array([_msg] * n, pa.large_string()),
                })

            per_constraint.append(
                joined.map_batches(to_viol, batch_format="pyarrow")
            )
    if not per_constraint:
        return None
    out = per_constraint[0]
    for p in per_constraint[1:]:
        out = out.union(p)
    return out


def _ask_pairs(triples_ds, shape: NodeShape, fkeys, path: str | None):
    """Candidate (this, value) pairs for an ASK component constraint,
    with per-pair value TERM metadata. Node form (``path`` None): the
    value IS the focus node — sh:targetNode terms keep their parsed
    meta (focus nodes may be literals), class-targeted focus nodes are
    IRIs. Property form: one pair per path triple of a focus node —
    ONE distributed predicate filter + a hash join against the focus
    keys (never a per-focus loop)."""
    import ray.data as rd

    if path is not None:
        def scan(t: pa.Table) -> pa.Table:
            x = t.filter(pc.equal(t.column("p"), path))
            return pa.table({
                "this": x.column("s_lex").combine_chunks()
                .cast(pa.large_string()),
                "this__kind": x.column("s_kind").combine_chunks()
                .cast(pa.int8()),
                "value": x.column("o_lex").combine_chunks()
                .cast(pa.large_string()),
                "value__kind": x.column("o_kind").combine_chunks()
                .cast(pa.int8()),
                "value__dt": x.column("o_datatype").combine_chunks()
                .cast(pa.large_string()),
                "value__lang": x.column("o_lang").combine_chunks()
                .cast(pa.large_string()),
            })

        cand = triples_ds.map_batches(scan, batch_format="pyarrow")
        joined = cand.join(fkeys, join_type="inner", num_partitions=4,
                           on=("this",))
        return joined.map_batches(
            lambda t: t.select([c for c in t.schema.names if c != "__f"])
            if t.num_columns else t,
            batch_format="pyarrow")
    parts = []
    if shape.target_node_terms:
        ks = pa.array([k for k, *_ in shape.target_node_terms], pa.int8())
        lex = pa.array([x[1] for x in shape.target_node_terms],
                       pa.large_string())
        dts = pa.array([x[2] for x in shape.target_node_terms],
                       pa.large_string())
        lgs = pa.array([x[3] for x in shape.target_node_terms],
                       pa.large_string())
        parts.append(rd.from_arrow(pa.table({
            "this": lex, "this__kind": ks, "this__dt": dts,
            "this__lang": lgs, "value": lex, "value__kind": ks,
            "value__dt": dts, "value__lang": lgs})))
    if shape.target_classes:
        classes = pa.array(shape.target_classes, pa.large_string())

        def scan_cls(t: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.equal(t.column("p"), RDF_TYPE),
                pc.is_in(t.column("o_lex").cast(pa.large_string()),
                         value_set=classes))
            s = t.filter(m).column("s_lex").combine_chunks().cast(
                pa.large_string())
            n = len(s)
            meta_k = pa.array([KIND_IRI] * n, pa.int8())
            empty = pa.array([""] * n, pa.large_string())
            return pa.table({
                "this": s, "this__kind": meta_k, "this__dt": empty,
                "this__lang": empty, "value": s, "value__kind": meta_k,
                "value__dt": empty, "value__lang": empty})

        parts.append(triples_ds.map_batches(scan_cls,
                                            batch_format="pyarrow"))
    if not parts:
        return None
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def _ask_violations(triples_ds, sc: SparqlConstraint, pairs):
    """One ASK component constraint → violation rows: evaluate the
    rewritten SELECT ?this ?value body ONCE pre-bound over the pairs
    Dataset (pre-binding as a join); pairs that do NOT survive are the
    violations (anti marker join)."""
    from ..ops.sparql import _marker_semijoin, sparql_select_prebound

    conf = sparql_select_prebound(
        triples_ds, sc.query, pairs, ["this", "value"])
    viol = _marker_semijoin(
        pairs, ["this", "value"], conf, ["this", "value"],
        keep_matched=False)
    msg = sc.message or "sh:ask constraint violation"
    pth = sc.path or ""

    def to_viol(t: pa.Table) -> pa.Table:
        names = t.schema.names
        if t.num_columns == 0 or "this" not in names:
            return pa.table({
                "focus": pa.array([], pa.large_string()),
                "path": pa.array([], pa.large_string()),
                "constraint": pa.array([], pa.large_string()),
                "detail": pa.array([], pa.large_string())})
        n = t.num_rows
        return pa.table({
            "focus": t.column("this").combine_chunks()
            .cast(pa.large_string()),
            "path": pa.array([pth] * n, pa.large_string()),
            "constraint": pa.array(["sparql"] * n, pa.large_string()),
            "detail": pa.array([msg] * n, pa.large_string())})

    return viol.map_batches(to_viol, batch_format="pyarrow")


def validate(triples_ds, shapes_ttl: str, base: str = ""):
    """Violations Dataset (focus, path, constraint, detail)."""
    import ray

    shapes = parse_shapes(shapes_ttl, base=base)
    ctx = {
        "classes": _class_extents(triples_ds, _collect_classes(shapes)),
        "nodes": {},
    }
    ctx["nodes"] = _node_conf_sets(triples_ds, shapes, ctx)
    shapes_ref = ray.put((shapes, ctx))

    def check(group: pd.DataFrame) -> pd.DataFrame:
        sh, ctx_ = ray.get(shapes_ref)
        rows = _validate_focus(group, sh, ctx_)
        return pd.DataFrame(
            rows, columns=["focus", "path", "constraint", "detail"]
        )

    base = triples_ds.groupby("s_lex").map_groups(check, batch_format="pandas")
    sv = _sparql_violations(triples_ds, shapes)
    return base.union(sv) if sv is not None else base
