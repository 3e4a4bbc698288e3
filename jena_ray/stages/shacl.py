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
    # path: the predicate IRI, or a DISPLAY string when the shape uses
    # a path EXPRESSION (path_expr holds the ops/paths AST; value nodes
    # are then computed by a distributed eval_path lane instead of the
    # per-subject-group scan)
    path: str
    path_expr: object | None = None
    min_count: int | None = None
    max_count: int | None = None
    datatype: str | None = None
    node_kind: str | None = None
    pattern: str | None = None
    # range bounds: the bound TERM (lex, dt) — compared in the value
    # space the pair admits (numeric / dateTime with the XSD
    # timezone-comparability rule / none → violation)
    min_inclusive: tuple | None = None
    max_inclusive: tuple | None = None
    min_exclusive: tuple | None = None
    max_exclusive: tuple | None = None
    min_length: int | None = None
    max_length: int | None = None
    flags: str = ""  # sh:flags for sh:pattern (i/s/m)
    # sh:class — value must be a SHACL instance of EVERY listed class
    clss: list = field(default_factory=list)
    node: str | None = None  # sh:node — value must conform to that shape
    # embedded sh:property sub-shapes (operand blocks / inline sh:node
    # blocks may be full shapes); conformance is consulted via a
    # precomputed per-focus conf set keyed by ``ref``
    props: list = field(default_factory=list)
    ref: str | None = None
    # sh:in — allowed value terms [(kind, lex, dt, lang)]
    in_list: list | None = None
    # sh:languageIn — allowed language ranges (basic filtering match)
    language_in: list | None = None
    # sh:hasValue — some value must equal this term (kind, lex, dt, lang)
    has_value: tuple | None = None
    unique_lang: bool = False  # sh:uniqueLang
    # property-pair components: the OTHER predicate's values on the
    # same focus node (ShEquals/ShDisjoint/ShLessThan*)
    equals: str | None = None
    disjoint: str | None = None
    less_than: str | None = None
    less_than_eq: str | None = None
    # logical constraint components; operands are value-level blocks
    ors: list = field(default_factory=list)   # list[list[PropertyShape]]
    ands: list = field(default_factory=list)  # list[list[PropertyShape]]
    nots: list = field(default_factory=list)  # list[PropertyShape]
    xones: list = field(default_factory=list)  # sh:xone — exactly one
    # sh:qualifiedValueShape block + min/max counts (+ disjoint from
    # sibling qualified shapes of the same node shape)
    qualified: "PropertyShape | None" = None
    q_min: int | None = None
    q_max: int | None = None
    q_disjoint: bool = False


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
    # value-level facets declared DIRECTLY on the node shape, applied
    # to the focus node itself (sh:in, sh:datatype, ... at node level)
    self_block: "PropertyShape | None" = None
    # sh:targetSubjectsOf / sh:targetObjectsOf predicate IRIs
    target_subjects_of: list = field(default_factory=list)
    target_objects_of: list = field(default_factory=list)
    # implicit class target: the shape node is ALSO an rdfs:Class —
    # its SHACL instances are focus nodes (spec §2.1.3.1)
    implicit_class: bool = False
    closed: bool = False          # sh:closed
    ignored: list = field(default_factory=list)  # sh:ignoredProperties
    deactivated: bool = False     # sh:deactivated


RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _block_nonempty(ps: PropertyShape) -> bool:
    """Does a constraint block carry any value-level / pair / logical
    constraint? (Decides whether a node shape has self facets.)"""
    return bool(
        ps.datatype or ps.node_kind or ps.pattern or ps.clss or ps.node
        or ps.in_list is not None or ps.language_in is not None
        or ps.has_value or ps.ors or ps.ands or ps.nots or ps.xones
        or ps.props or ps.equals or ps.disjoint or ps.less_than
        or ps.less_than_eq
        or ps.min_inclusive is not None or ps.max_inclusive is not None
        or ps.min_exclusive is not None or ps.max_exclusive is not None
        or ps.min_length is not None or ps.max_length is not None)


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


def _walk_list_full(spo_full, fvals, head):
    """RDF collection → list of FULL terms (kind, lex, dt, lang)."""
    items = []
    node = head
    while node and node[1] != RDF_NS + "nil":
        first = fvals(node, RDF_NS + "first")
        if not first:
            break
        items.append(first[0])
        rest = fvals(node, RDF_NS + "rest")
        node = (rest[0][0], rest[0][1]) if rest else None
    return items


def parse_shapes(shapes_ttl: str, base: str = "") -> list[NodeShape]:
    triples = parse_turtle(shapes_ttl, base=base)
    # the shapes DOCUMENT's own prefix map backs the constraint queries
    # (jena prepends it before the sh:prefixes/sh:declare lines —
    # std/sparql/node/prefixes-001 relies on it; sh:declare wins)
    doc_prefixes = [
        f"PREFIX {m.group(1)}: <{m.group(2)}>"
        for m in re.finditer(
            r"@prefix\s+([A-Za-z][\w\-]*)?:\s*<([^>]*)>", shapes_ttl)
        if m.group(1)]
    return shapes_from_triples(triples, doc_prefixes)


def shapes_from_triples(triples, doc_prefixes=()) -> list[NodeShape]:
    """Shape parsing over an already-materialized triple list (7-tuples
    as produced by parse_turtle / the SHACLC compiler in rdf/shaclc.py)."""
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

    components = _parse_components(spo, vals, doc_prefixes)

    def parse_block(bnode, include_props: bool = True) -> PropertyShape:
        """A value-level constraint block (the operand form of sh:or /
        sh:and / sh:not / inline sh:node — jena-shacl
        parser/ConstraintComponents): the same facets as a property
        shape; ``include_props`` also parses embedded sh:property
        sub-shapes (operand blocks may be full shapes — and-001)."""
        ps = PropertyShape(path="")
        _fill_facets(ps, bnode, vals, parse_block,
                     include_props=include_props)
        return ps

    def _parse_path_expr(term):
        """sh:path expression (SHACL §2.3.1) → (ops/paths AST, display).
        IRI → (None, iri) — the fast per-subject-group lane; bnode →
        inverse / alternative / sequence (RDF list) / zeroOrMore /
        oneOrMore / zeroOrOne, composed from ops/paths nodes and
        evaluated by the distributed eval_path lane."""
        from ..ops import paths as _paths

        k, v = term
        if k != KIND_BNODE:
            return None, v

        def _sub(t):
            sub, disp = _parse_path_expr(t)
            return (sub if sub is not None else _paths.Link(disp)), disp

        # a path bnode may carry SEVERAL features at once (the "strange
        # path" fixtures attach an inversePath to a sequence list
        # node); jena's path parser takes the rdf-list SEQUENCE first
        # and ignores the rest — fixed priority, no union
        if vals(term, RDF_NS + "first"):  # RDF list → SequencePath
            items = _walk_list(spo, vals, term)
            parsed = [_sub(it) for it in items]
            return (_paths.Seq(*(s for s, _ in parsed)),
                    "(" + "/".join(d for _, d in parsed) + ")")
        inv = vals(term, SH + "inversePath")
        if inv:
            sub, disp = _sub(inv[0])
            return _paths.Inv(sub), f"^({disp})"
        for key, cls, sym in (("zeroOrMorePath", _paths.Star, "*"),
                              ("oneOrMorePath", _paths.Plus, "+"),
                              ("zeroOrOnePath", _paths.Opt, "?")):
            w = vals(term, SH + key)
            if w:
                sub, disp = _sub(w[0])
                return cls(sub), f"({disp}){sym}"
        alt = vals(term, SH + "alternativePath")
        if alt:
            items = _walk_list(spo, vals, alt[0])
            parsed = [_sub(it) for it in items]
            return (_paths.Alt(*(s for s, _ in parsed)),
                    "(" + "|".join(d for _, d in parsed) + ")")
        raise ValueError("unsupported sh:path expression")

    def _parse_prop(pnode) -> "PropertyShape | None":
        """sh:property block → PropertyShape (path + counts + facets);
        None when pathless or deactivated."""
        paths = vals(pnode, SH + "path")
        if not paths:
            return None
        pdeact = vals(pnode, SH + "deactivated")
        if pdeact and pdeact[0][1] == "true":
            return None
        expr, disp = _parse_path_expr(paths[0])
        ps = PropertyShape(path=disp, path_expr=expr)
        for key, attr in [("minCount", "min_count"),
                          ("maxCount", "max_count"),
                          ("qualifiedMinCount", "q_min"),
                          ("qualifiedMaxCount", "q_max")]:
            v = vals(pnode, SH + key)
            if v:
                setattr(ps, attr, int(v[0][1]))
        qv = vals(pnode, SH + "qualifiedValueShape")
        if qv:
            ps.qualified = parse_block(qv[0])
        qd = vals(pnode, SH + "qualifiedValueShapesDisjoint")
        ps.q_disjoint = bool(qd and qd[0][1] == "true")
        _fill_facets(ps, pnode, vals, parse_block)
        return ps

    def _fill_facets(ps, pnode, vals, parse_block, include_props=True):
        for key, attr in [
            ("minInclusive", "min_inclusive"),
            ("maxInclusive", "max_inclusive"),
            ("minExclusive", "min_exclusive"),
            ("maxExclusive", "max_exclusive"),
        ]:
            v = fvals(pnode, SH + key)
            if v:
                # the bound TERM (lex, dt) — numeric and dateTime value
                # spaces compare differently (_shacl_cmp)
                setattr(ps, attr, (v[0][1], v[0][2]))
        for key, attr in [
            ("minLength", "min_length"),
            ("maxLength", "max_length"),
        ]:
            v = vals(pnode, SH + key)
            if v:
                setattr(ps, attr, int(v[0][1]))
        fl = vals(pnode, SH + "flags")
        if fl:
            ps.flags = fl[0][1]
        for key, attr in [
            ("datatype", "datatype"),
            ("nodeKind", "node_kind"),
            ("pattern", "pattern"),
            ("equals", "equals"),
            ("disjoint", "disjoint"),
            ("lessThan", "less_than"),
            ("lessThanOrEquals", "less_than_eq"),
        ]:
            v = vals(pnode, SH + key)
            if v:
                setattr(ps, attr, v[0][1])
        ps.clss = [v for _, v in vals(pnode, SH + "class")]
        for k, v in vals(pnode, SH + "node"):
            if k == KIND_BNODE:
                # inline anonymous sh:node shape: value must conform to
                # the block — equivalent to a 1-operand sh:and
                ps.ands.append([parse_block((k, v))])
            else:
                ps.node = v
        if include_props:
            for pk, pv in vals(pnode, SH + "property"):
                sub = _parse_prop((pk, pv))
                if sub is not None:
                    ps.props.append(sub)
        for head in vals(pnode, SH + "in"):
            ps.in_list = _walk_list_full(spo_full, fvals, head)
        for head in vals(pnode, SH + "languageIn"):
            ps.language_in = [
                t[1] for t in _walk_list_full(spo_full, fvals, head)]
        hv = fvals(pnode, SH + "hasValue")
        if hv:
            ps.has_value = hv[0]
        ul = vals(pnode, SH + "uniqueLang")
        if ul and ul[0][1] == "true":
            ps.unique_lang = True
        for key, attr in [("or", "ors"), ("and", "ands"),
                          ("xone", "xones")]:
            for head in vals(pnode, SH + key):
                getattr(ps, attr).append(
                    [parse_block(item) for item in _walk_list(spo, vals, head)]
                )
        for neg in vals(pnode, SH + "not"):
            ps.nots.append(parse_block(neg))

    RDFS_CLASS = "http://www.w3.org/2000/01/rdf-schema#Class"
    TARGET_PREDS = ("targetClass", "targetNode", "targetSubjectsOf",
                    "targetObjectsOf")
    shapes = []
    for node, props in spo.items():
        types = {v for _, v in props.get(RDF_TYPE, [])}
        has_target = any(vals(node, SH + t) for t in TARGET_PREDS)
        # a shape needs no rdf:type — being the subject of a target
        # declaration suffices (spec §2.1; misc/severity-002's untyped
        # TestShape1, property/datatype-ill-formed's sh:PropertyShape)
        if SH + "NodeShape" not in types and not has_target:
            continue
        ns = NodeShape(name=node[1])
        if vals(node, SH + "path"):
            # a TOP-LEVEL property shape with its own targets: wrap it
            # as a node shape holding that one property
            deact0 = vals(node, SH + "deactivated")
            ns.deactivated = bool(deact0 and deact0[0][1] == "true")
            ns.target_classes = [
                v for _, v in vals(node, SH + "targetClass")]
            ns.target_nodes = [
                v for _, v in vals(node, SH + "targetNode")]
            ns.target_node_terms = list(fvals(node, SH + "targetNode"))
            ns.target_subjects_of = [
                v for _, v in vals(node, SH + "targetSubjectsOf")]
            ns.target_objects_of = [
                v for _, v in vals(node, SH + "targetObjectsOf")]
            ps0 = _parse_prop(node)
            if ps0 is not None:
                ns.properties.append(ps0)
                for ck, cv in vals(node, SH + "sparql"):
                    sc = _parse_sparql_constraint(
                        spo, vals, (ck, cv), doc_prefixes,
                        path=ps0.path)
                    if sc is not None:
                        ns.sparql.append(sc)
                for comp in components:
                    ns.sparql.extend(_instantiate_component(
                        comp, node, fvals, "prop", path=ps0.path))
            shapes.append(ns)
            continue
        deact = vals(node, SH + "deactivated")
        ns.deactivated = bool(deact and deact[0][1] == "true")
        ns.target_classes = [v for _, v in vals(node, SH + "targetClass")]
        ns.target_nodes = [v for _, v in vals(node, SH + "targetNode")]
        ns.target_node_terms = list(fvals(node, SH + "targetNode"))
        ns.target_subjects_of = [
            v for _, v in vals(node, SH + "targetSubjectsOf")]
        ns.target_objects_of = [
            v for _, v in vals(node, SH + "targetObjectsOf")]
        if RDFS_CLASS in types:
            # implicit class target (§2.1.3.1): the shape IS a class —
            # its instances are focus nodes
            ns.implicit_class = True
            ns.target_classes.append(node[1])
        cl = vals(node, SH + "closed")
        ns.closed = bool(cl and cl[0][1] == "true")
        for head in vals(node, SH + "ignoredProperties"):
            ns.ignored = [v for _, v in _walk_list(spo, vals, head)]
        # value-level facets DIRECTLY on the node shape apply to the
        # focus node itself (its sh:property blocks are the shape's
        # regular property shapes, parsed below — not self facets)
        self_blk = parse_block(node, include_props=False)
        if _block_nonempty(self_blk):
            ns.self_block = self_blk
        for pk, pv in vals(node, SH + "property"):
            pnode = (pk, pv)
            ps = _parse_prop(pnode)
            if ps is None:
                continue
            ns.properties.append(ps)
            for ck, cv in vals(pnode, SH + "sparql"):
                sc = _parse_sparql_constraint(
                    spo, vals, (ck, cv), doc_prefixes, path=ps.path)
                if sc is not None:
                    ns.sparql.append(sc)
            for comp in components:
                ns.sparql.extend(_instantiate_component(
                    comp, pnode, fvals, "prop", path=ps.path))
        for ck, cv in vals(node, SH + "sparql"):
            sc = _parse_sparql_constraint(spo, vals, (ck, cv),
                                          doc_prefixes)
            if sc is not None:
                ns.sparql.append(sc)
        for comp in components:
            ns.sparql.extend(_instantiate_component(comp, node, fvals, "node"))
        shapes.append(ns)
    return shapes


def _parse_components(spo, vals,
                      doc_prefixes=()) -> list[SparqlComponent]:
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
                list(doc_prefixes)
                + _prefix_lines(spo, vals, vnode) + [sel[0][1]])
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
                list(doc_prefixes)
                + _prefix_lines(spo, vals, vnode)
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


def _parse_sparql_constraint(spo, vals, cnode, doc_prefixes=(),
                             path: str | None = None):
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
    if path is not None:
        # a constraint on a PROPERTY shape: $PATH is the shape's path
        query = query.replace("$PATH", f"<{path}>")
    query = "\n".join(list(doc_prefixes)
                      + _prefix_lines(spo, vals, cnode)
                      + [re.sub(r"\$([A-Za-z_]\w*)", r"?\1", query)])
    msg = vals(cnode, SH + "message")
    return SparqlConstraint(query=query,
                            message=msg[0][1] if msg else None,
                            path=path)


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


_XSD = "http://www.w3.org/2001/XMLSchema#"
_XSD_PATTERNS = {
    _XSD + "integer": r"[+-]?\d+",
    _XSD + "int": r"[+-]?\d+",
    _XSD + "long": r"[+-]?\d+",
    _XSD + "short": r"[+-]?\d+",
    _XSD + "byte": r"[+-]?\d+",
    _XSD + "nonNegativeInteger": r"\+?\d+",
    _XSD + "positiveInteger": r"\+?\d+",
    _XSD + "decimal": r"[+-]?(\d+(\.\d*)?|\.\d+)",
    _XSD + "float": r"[+-]?((\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|INF|NaN)",
    _XSD + "double": r"[+-]?((\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|INF|NaN)",
    _XSD + "boolean": r"true|false|1|0",
    _XSD + "date": r"-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?",
    _XSD + "dateTime":
        r"-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?"
        r"(Z|[+-]\d{2}:\d{2})?",
}


_XSD_RANGES = {
    _XSD + "byte": (-128, 127),
    _XSD + "short": (-32768, 32767),
    _XSD + "int": (-2147483648, 2147483647),
    _XSD + "long": (-(2 ** 63), 2 ** 63 - 1),
    _XSD + "unsignedByte": (0, 255),
    _XSD + "unsignedShort": (0, 65535),
    _XSD + "unsignedInt": (0, 4294967295),
    _XSD + "unsignedLong": (0, 2 ** 64 - 1),
    _XSD + "nonNegativeInteger": (0, None),
    _XSD + "positiveInteger": (1, None),
    _XSD + "nonPositiveInteger": (None, 0),
    _XSD + "negativeInteger": (None, -1),
}


def _xsd_valid(lex: str, dt: str) -> bool:
    """Is the lexical form well-formed AND in range for the datatype?
    (sh:datatype requires D-validity — "aldi"^^xsd:integer and
    "300"^^xsd:byte are violations even though the declared datatype
    matches.) Unknown datatypes pass."""
    pat = _XSD_PATTERNS.get(dt)
    if pat is not None and re.fullmatch(pat, str(lex)) is None:
        return False
    rng = _XSD_RANGES.get(dt)
    if rng is not None:
        try:
            x = int(lex)
        except (TypeError, ValueError):
            return False
        lo, hi = rng
        if lo is not None and x < lo:
            return False
        if hi is not None and x > hi:
            return False
    return True


_DT_RE = re.compile(
    r"-?\d{4,}-\d{2}-\d{2}(T\d{2}:\d{2}:\d{2}(\.\d+)?)?"
    r"(?P<tz>Z|[+-]\d{2}:\d{2})?$")


def _shacl_cmp(o_kind, o_lex, o_dt, bound) -> int | None:
    """Compare a value node against a range-bound TERM (lex, dt):
    -1/0/1, or None when incomparable (non-literal value, value-space
    mismatch, or the XSD dateTime timezone rule — a zoned and an
    unzoned dateTime are incomparable, per the reference's
    minInclusive-002/003 expectations)."""
    if o_kind != KIND_LITERAL:
        return None
    b_lex, b_dt = bound
    try:
        a, b = float(o_lex), float(b_lex)
        return -1 if a < b else (1 if a > b else 0)
    except (TypeError, ValueError):
        pass
    ma, mb = _DT_RE.match(str(o_lex)), _DT_RE.match(str(b_lex))
    if ma and mb:
        if bool(ma.group("tz")) != bool(mb.group("tz")):
            return None  # zoned vs unzoned: indeterminate order
        from datetime import datetime

        def parse(m, s):
            s = str(s)
            if s.endswith("Z"):
                s = s[:-1] + "+00:00"
            if "T" not in s:
                s = s + "T00:00:00"
            return datetime.fromisoformat(s)

        try:
            a, b = parse(ma, o_lex), parse(mb, b_lex)
        except ValueError:
            return None
        return -1 if a < b else (1 if a > b else 0)
    return None


def _term_matches(term, o_kind, o_lex, o_datatype, o_lang) -> bool:
    """Does a value node equal a shapes-graph term (kind, lex, dt, lang)?
    Term equality with numeric value-space equality for typed numeric
    literals (NodeValue.sameValueAs's common cases)."""
    k, lex, dt, lang = (term + ("", ""))[:4]
    if k != o_kind:
        return False
    if k != KIND_LITERAL:
        return lex == o_lex
    if (lang or "") != (o_lang or ""):
        return False
    if lex == o_lex:
        return True
    try:
        return float(lex) == float(o_lex)
    except (TypeError, ValueError):
        return False


def _lang_in_range(lang: str, ranges) -> bool:
    """sh:languageIn: basic language-range filtering (RFC 4647 §3.3.1)."""
    if not lang:
        return False
    ll = lang.lower()
    for r in ranges:
        rl = str(r).lower()
        if rl == "*" or ll == rl or ll.startswith(rl + "-"):
            return True
    return False


def _check_value(ps: PropertyShape, o_kind, o_lex, o_datatype, ctx,
                 o_lang="", as_operand=False):
    """Violations of ONE value against a (property or operand) shape's
    value-level facets, including the logical components. Empty list =
    the value conforms (jena-shacl engine/constraint/* per-value eval).
    ``ctx``: {"classes": cls → member set,
    "nodes": shape IRI → (conf, nonconf, empty_ok)}."""
    class_members = ctx["classes"]
    out = []
    if ps.node_kind is not None:
        nk_ok = {
            SH + "IRI": o_kind == KIND_IRI,
            SH + "Literal": o_kind == KIND_LITERAL,
            SH + "BlankNode": o_kind == KIND_BNODE,
            SH + "BlankNodeOrIRI": o_kind in (KIND_BNODE, KIND_IRI),
            SH + "BlankNodeOrLiteral": o_kind in (KIND_BNODE, KIND_LITERAL),
            SH + "IRIOrLiteral": o_kind in (KIND_IRI, KIND_LITERAL),
        }.get(ps.node_kind, True)
        if not nk_ok:
            out.append(("nodeKind", f"not a {ps.node_kind}"))
    if ps.datatype is not None and (
        o_kind != KIND_LITERAL or o_datatype != ps.datatype
        or not _xsd_valid(o_lex, o_datatype)
    ):
        out.append(("datatype", f"expected (well-formed) {ps.datatype}"))
    if ps.pattern is not None:
        pat = ps.pattern
        inline = "".join(c for c in ps.flags if c in "ims")
        if inline:
            pat = f"(?{inline}){pat}"
        if not re.search(pat, str(o_lex)):
            out.append(("pattern", f"!~ /{ps.pattern}/"))
    for bound, op, name in (
            (ps.min_inclusive, (0, 1), "minInclusive"),
            (ps.max_inclusive, (-1, 0), "maxInclusive"),
            (ps.min_exclusive, (1,), "minExclusive"),
            (ps.max_exclusive, (-1,), "maxExclusive")):
        if bound is None:
            continue
        c = _shacl_cmp(o_kind, o_lex, o_datatype, bound)
        if c is None or c not in op:
            out.append((name, f"{o_lex!r} fails {name} {bound[0]!r}"))
    if ps.min_length is not None or ps.max_length is not None:
        # sh:minLength/maxLength apply to the node's string form;
        # blank nodes always fail (spec §4.4)
        if o_kind == KIND_BNODE:
            out.append(("minLength" if ps.min_length is not None
                        else "maxLength", "blank node"))
        else:
            ln = len(str(o_lex))
            if ps.min_length is not None and ln < ps.min_length:
                out.append(("minLength", f"{ln} < {ps.min_length}"))
            if ps.max_length is not None and ln > ps.max_length:
                out.append(("maxLength", f"{ln} > {ps.max_length}"))
    if ps.in_list is not None and not any(
            _term_matches(t, o_kind, o_lex, o_datatype, o_lang)
            for t in ps.in_list):
        out.append(("in", "value not in the sh:in list"))
    if ps.language_in is not None and not (
            o_kind == KIND_LITERAL
            and _lang_in_range(o_lang or "", ps.language_in)):
        out.append(("languageIn", "language tag not admitted"))
    for cls in ps.clss:
        if o_lex not in class_members.get(cls, ()):
            out.append(("class", f"not an instance of {cls}"))
    # sh:node (named ref) reports at the OUTER level; an embedded
    # sh:property sub-shape (ps.ref) is consulted as a boolean only
    # when this block is a LOGICAL OPERAND — a directly nested
    # property shape's violations pass through with their own
    # focus/path in _validate_focus (spec PropertyConstraintComponent)
    refs = [(ps.node, "node")]
    if as_operand and ps.ref is not None:
        refs.append((ps.ref, "propertyBlock"))
    for ref, label in refs:
        if ref is None:
            continue
        conf, nonconf, empty_ok = ctx["nodes"][ref]
        ok = o_lex in conf or (
            empty_ok and o_lex not in conf and o_lex not in nonconf
        )
        if not ok:
            out.append((label, f"value does not conform to {ref}"))
    for operands in ps.ors:
        if all(
            _check_value(op, o_kind, o_lex, o_datatype, ctx, o_lang, True)
            for op in operands
        ):
            out.append(("or", "no sh:or operand conforms"))
    for operands in ps.ands:
        if any(
            _check_value(op, o_kind, o_lex, o_datatype, ctx, o_lang, True)
            for op in operands
        ):
            out.append(("and", "an sh:and operand fails"))
    for operands in ps.xones:
        n_ok = sum(
            1 for op in operands
            if not _check_value(op, o_kind, o_lex, o_datatype, ctx,
                                o_lang, True)
        )
        if n_ok != 1:
            out.append(("xone", f"{n_ok} sh:xone operands conform"))
    for neg in ps.nots:
        if not _check_value(neg, o_kind, o_lex, o_datatype, ctx,
                            o_lang, True):
            out.append(("not", "value conforms to the sh:not shape"))
    return out


def _validate_focus(group: pd.DataFrame, shapes: list[NodeShape], ctx,
                    focus_kind=None):
    """All triples of ONE subject → violation rows. ``group`` may be
    EMPTY (a phantom focus node with no outgoing triples — targetNode /
    targetObjectsOf of a non-subject); the caller then passes the focus
    via ctx["_focus"] and its term kind via ``focus_kind``."""
    if len(group):
        focus = group["s_lex"].iloc[0]
        fkind = int(group["s_kind"].iloc[0]) if "s_kind" in group else KIND_IRI
        types = set(group.loc[group["p"] == RDF_TYPE, "o_lex"])
        preds = set(group["p"])
    else:
        focus = ctx["_focus"]
        fkind = focus_kind if focus_kind is not None else KIND_IRI
        types = set()
        preds = set()
    objects_of = ctx.get("objects_of", {})
    implies = ctx.get("implies", {})
    # SHACL-instance targeting: rdf:type/rdfs:subClassOf* closure
    types_closed = set(types)
    for t in types:
        types_closed |= implies.get(t, set())
    out = []
    for shape in shapes:
        if shape.deactivated:
            continue
        applies = (
            focus in shape.target_nodes
            or bool(types_closed.intersection(shape.target_classes))
            or any(p in preds for p in shape.target_subjects_of)
            or any(focus in objects_of.get(p, ())
                   for p in shape.target_objects_of)
        )
        if not applies:
            continue
        if shape.self_block is not None:
            # node-level value facets apply to the focus node itself
            sb = shape.self_block
            fterm = ctx.get("_focus_term") or (fkind, focus, "", "")
            out.extend(
                (focus, "", c, d)
                for c, d in _check_value(
                    sb, fterm[0], fterm[1], fterm[2], ctx, fterm[3])
            )
            if sb.has_value is not None and not _term_matches(
                    sb.has_value, fterm[0], fterm[1], fterm[2], fterm[3]):
                out.append((focus, "", "hasValue",
                            "focus node is not the required value"))
            # node-level pair components: value nodes = {focus}
            mine = {(fterm[0], fterm[1])}
            out.extend(_pair_checks(focus, "", mine, sb, group))
        if shape.closed:
            allowed = {ps.path for ps in shape.properties} | set(
                shape.ignored)
            extra = group[~group["p"].isin(allowed)] if len(group) else group
            for _, row in extra.iterrows():
                out.append((focus, row["p"], "closed",
                            f"predicate {row['p']} not allowed"))
        for ps in shape.properties:
            if ps.path_expr is not None:
                continue  # evaluated by the distributed path lane
            vals = group[group["p"] == ps.path] if len(group) else group
            n = len(vals)
            if ps.min_count is not None and n < ps.min_count:
                out.append((focus, ps.path, "minCount",
                            f"{n} < {ps.min_count}"))
            if ps.max_count is not None and n > ps.max_count:
                out.append((focus, ps.path, "maxCount",
                            f"{n} > {ps.max_count}"))
            if ps.has_value is not None and not any(
                    _term_matches(ps.has_value, row["o_kind"],
                                  row["o_lex"], row["o_datatype"],
                                  row["o_lang"])
                    for _, row in vals.iterrows()):
                out.append((focus, ps.path, "hasValue",
                            "required value missing"))
            if ps.qualified is not None and (
                    ps.q_min is not None or ps.q_max is not None):
                # count value nodes conforming to the qualified shape;
                # with qualifiedValueShapesDisjoint, values conforming
                # to a SIBLING qualified shape don't count (§4.5.5)
                siblings = ([q.qualified for q in shape.properties
                             if q is not ps and q.qualified is not None]
                            if ps.q_disjoint else [])

                def _qconf(row, blk):
                    return not _check_value(
                        blk, row["o_kind"], row["o_lex"],
                        row["o_datatype"], ctx, row["o_lang"], True)

                qn = sum(
                    1 for _, row in vals.iterrows()
                    if _qconf(row, ps.qualified)
                    and not any(_qconf(row, sib) for sib in siblings))
                if ps.q_min is not None and qn < ps.q_min:
                    out.append((focus, ps.path, "qualifiedMinCount",
                                f"{qn} < {ps.q_min}"))
                if ps.q_max is not None and qn > ps.q_max:
                    out.append((focus, ps.path, "qualifiedMaxCount",
                                f"{qn} > {ps.q_max}"))
            if ps.unique_lang and n:
                langs = [str(x) for x in vals["o_lang"] if x]
                for tag in sorted({x for x in langs if langs.count(x) > 1}):
                    out.append((focus, ps.path, "uniqueLang",
                                f"language {tag} used more than once"))
            if (ps.equals is not None or ps.disjoint is not None
                    or ps.less_than is not None
                    or ps.less_than_eq is not None):
                mine = {(r["o_kind"], r["o_lex"])
                        for _, r in vals.iterrows()}
                out.extend(_pair_checks(focus, ps.path, mine, ps, group))
            for _, row in vals.iterrows():
                out.extend(
                    (focus, ps.path, c, d)
                    for c, d in _check_value(
                        ps, row["o_kind"], row["o_lex"],
                        row["o_datatype"], ctx, row["o_lang"],
                    )
                )
            if ps.props and ps.ref is not None:
                # directly nested property shape: the inner violations
                # pass through with the VALUE node as their focus
                # (spec PropertyConstraintComponent; property-001)
                rows_map = ctx.get("block_rows", {}).get(ps.ref, {})
                for _, row in vals.iterrows():
                    v = row["o_lex"]
                    inner = rows_map.get(v)
                    if inner is None:
                        conf, nonconf, _e = ctx["nodes"][ps.ref]
                        inner = ([] if v in conf or v in nonconf
                                 else rows_map.get(None, []))
                    out.extend((v, r[0], r[1], r[2]) for r in inner)
    return out


def _shacl_lt(v, w, strict: bool) -> bool:
    """sh:lessThan / sh:lessThanOrEquals pairwise comparison: numeric
    when both parse as numbers, string order when neither does; a
    MIXED pair is incomparable and fails (lessThan-002: numbers vs
    strings are violations, not string-compared)."""
    def num(x):
        try:
            return float(x)
        except (TypeError, ValueError):
            return None

    a, b = num(v), num(w)
    if (a is None) != (b is None):
        return False  # incomparable value spaces
    if a is None:
        a, b = str(v), str(w)
    return a < b if strict else a <= b


def _pair_checks(focus, path_label, mine, ps: PropertyShape, group):
    """Property-pair components (ShEquals/ShDisjoint/ShLessThan*): the
    value-node set ``mine`` vs the objects of the paired predicate on
    the SAME focus node (co-located in the subject group). One result
    per differing/shared/failing value — matching jena-shacl's
    per-value result granularity."""
    out = []

    def others(pred):
        rows = group[group["p"] == pred] if len(group) else group
        return {(r["o_kind"], r["o_lex"]) for _, r in rows.iterrows()}

    if ps.equals is not None:
        theirs = others(ps.equals)
        for _, lex in sorted(mine - theirs):
            out.append((focus, path_label, "equals",
                        f"{lex} missing from <{ps.equals}>"))
        for _, lex in sorted(theirs - mine):
            out.append((focus, path_label, "equals",
                        f"{lex} missing from the value nodes"))
    if ps.disjoint is not None:
        theirs = others(ps.disjoint)
        for _, lex in sorted(mine & theirs):
            out.append((focus, path_label, "disjoint",
                        f"{lex} shared with <{ps.disjoint}>"))
    for pred, strict, name in ((ps.less_than, True, "lessThan"),
                               (ps.less_than_eq, False,
                                "lessThanOrEquals")):
        if pred is None:
            continue
        theirs = [lex for _, lex in others(pred)]
        # one result per failing (value, other) PAIR (spec §4.5.3)
        for _, v in sorted(mine):
            for w in sorted(theirs):
                if not _shacl_lt(v, w, strict):
                    out.append((focus, path_label, name,
                                f"{v} not {name} {w} of <{pred}>"))
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
        for operands in ps.xones:
            for op in operands:
                yield from walk(op)
        for neg in ps.nots:
            yield from walk(neg)
        for sub in ps.props:
            yield from walk(sub)
        if ps.qualified is not None:
            yield from walk(ps.qualified)

    for shape in shapes:
        if shape.self_block is not None:
            yield from walk(shape.self_block)
        for ps in shape.properties:
            yield from walk(ps)


def _collect_classes(shapes: list[NodeShape]) -> set[str]:
    """Every class an sh:class facet names, recursively through the
    logical operands."""
    return {c for ps in _walk_blocks(shapes) for c in ps.clss}


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
    # lift operand / inline blocks that embed sh:property sub-shapes
    # into synthetic probe shapes — their per-focus conformance is a
    # conf set consulted by _check_value via blk.ref (and-001's
    # full-shape operands)
    aux: dict[str, NodeShape] = {}
    for blk in _walk_blocks(all_shapes):
        if blk.props and blk.ref is None:
            blk.ref = f"__blk_{len(aux)}"
            aux[blk.ref] = NodeShape(name=blk.ref, properties=blk.props)
    by_name.update(aux)
    refs = {ps.node for ps in _walk_blocks(all_shapes) if ps.node} | set(aux)
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
        deps = {ps.node for ps in _walk_blocks([by_name[name]])
                if ps.node}
        deps |= {ps.ref for ps in _walk_blocks([by_name[name]])
                 if ps.ref}
        for dep in sorted(deps):
            visit(dep, chain + (name,))
        state[name] = 1
        order.append(name)

    for r in sorted(refs):
        visit(r, ())

    out: dict[str, tuple] = {}
    block_rows: dict[str, dict] = {}
    for name in order:
        shape = by_name[name]
        empty_ok = all(
            not ps.min_count for ps in shape.properties
        )
        want_rows = name in aux  # directly nested property shapes
        ref = ray.put((shape, {**ctx, "nodes": dict(out),
                               "block_rows": dict(block_rows)},
                       want_rows))

        def check(g: pd.DataFrame) -> pd.DataFrame:
            import json

            shape_, ctx_, want = ray.get(ref)
            focus = g["s_lex"].iloc[0]
            probe = NodeShape(
                name=shape_.name, target_nodes=[focus],
                properties=shape_.properties,
                self_block=shape_.self_block,
            )
            bad = _validate_focus(g, [probe], ctx_)
            return pd.DataFrame(
                {"node": [focus], "ok": [0 if bad else 1],
                 "rows": [json.dumps([list(r[1:]) for r in bad])
                          if want and bad else ""]}
            )

        rows = (
            triples_ds.groupby("s_lex")
            .map_groups(check, batch_format="pandas")
            .take_all()
        )
        conf = frozenset(r["node"] for r in rows if r["ok"])
        nonconf = frozenset(r["node"] for r in rows if not r["ok"])
        out[name] = (conf, nonconf, empty_ok)
        if want_rows:
            import json

            per_focus = {r["node"]: json.loads(r["rows"])
                         for r in rows if r["rows"]}
            # template rows for value nodes with NO subject group
            # (inner minCounts still fire for them)
            probe0 = NodeShape(name=name, target_nodes=["\x00"],
                               properties=shape.properties,
                               self_block=shape.self_block)
            empty0 = pd.DataFrame(columns=[
                "s_kind", "s_lex", "p", "o_kind", "o_lex",
                "o_datatype", "o_lang"])
            tmpl = _validate_focus(
                empty0, [probe0],
                {**ctx, "nodes": dict(out),
                 "block_rows": dict(block_rows), "_focus": "\x00"})
            per_focus[None] = [list(r[1:]) for r in tmpl]
            block_rows[name] = per_focus
    return out, block_rows


def _class_extents(triples_ds, classes: set[str]) -> tuple[dict, dict]:
    """(cls → set of instance IRIs, type → ancestor classes), honoring
    rdfs:subClassOf closure in the data graph (SHACL "SHACL instance"
    semantics — the implies map also drives targetClass applicability
    over subclass instances). ONE distributed filter pass over the
    data; the subClassOf triples (schema-scale) and the named classes'
    extents (broadcast-scale by the documented partitioning assumption)
    are collected."""
    if not classes:
        classes = set()
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
    members: dict[str, set] = {c: set() for c in classes}
    if classes:
        typed = triples_ds.map_batches(
            _scan(RDF_TYPE), batch_format="pyarrow"
        ).take_all()
        for r in typed:
            for c in implies.get(r["o_lex"], {r["o_lex"]}):
                if c in members:
                    members[c].add(r["s_lex"])
    return members, implies


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
        if not shape.sparql or shape.deactivated:
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

            def to_viol(t: pa.Table, _msg=msg,
                        _pth=sc.path or "") -> pa.Table:
                n = t.num_rows
                names = t.schema.names
                if "path" in names:
                    path = pc.coalesce(
                        t.column("path").combine_chunks()
                        .cast(pa.large_string()),
                        pa.scalar("", pa.large_string()),
                    )
                else:
                    path = pa.array([_pth] * n, pa.large_string())
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


def _objects_of_sets(triples_ds, shapes: list[NodeShape]) -> dict:
    """sh:targetObjectsOf predicate → frozenset of (object lex) + the
    phantom candidates' term kinds: ONE distributed predicate filter;
    the named predicates' object sets are broadcast-scale by the
    documented partitioning assumption."""
    preds = {p for s in shapes for p in s.target_objects_of}
    if not preds:
        return {}
    pv = pa.array(sorted(preds), pa.large_string())

    def scan(t: pa.Table) -> pa.Table:
        x = t.filter(pc.is_in(t.column("p").cast(pa.large_string()),
                              value_set=pv))
        return pa.table({
            "p": x.column("p").combine_chunks().cast(pa.large_string()),
            "o": x.column("o_lex").combine_chunks()
            .cast(pa.large_string()),
            "k": x.column("o_kind").combine_chunks().cast(pa.int8()),
            "dt": x.column("o_datatype").combine_chunks()
            .cast(pa.large_string()),
            "lg": x.column("o_lang").combine_chunks()
            .cast(pa.large_string()),
        })

    out: dict[str, dict] = {p: {} for p in preds}
    for r in triples_ds.map_batches(scan, batch_format="pyarrow").take_all():
        out[r["p"]][r["o"]] = (int(r["k"]), r["o"], r["dt"] or "",
                               r["lg"] or "")
    return {p: m for p, m in out.items()}


def _phantom_focus_rows(triples_ds, shapes: list[NodeShape], ctx):
    """Focus nodes that never occur as SUBJECTS (targetNode literals,
    targetObjectsOf objects with no outgoing triples) still get
    validated — against the empty description. Candidates are
    broadcast-scale (explicit target lists / named-predicate object
    sets); one distributed scan finds which already have subject
    groups."""
    import ray.data as rd

    cands: dict[str, tuple] = {}  # lex → full term (kind, lex, dt, lang)
    for s in shapes:
        if s.deactivated:
            continue
        for t in s.target_node_terms:
            cands[t[1]] = (t[0], t[1], t[2], t[3])
        for p in s.target_objects_of:
            for o, term in ctx.get("objects_of", {}).get(p, {}).items():
                cands[o] = term
    if not cands:
        return None
    cv = pa.array(sorted(cands), pa.large_string())

    def seen_scan(t: pa.Table) -> pa.Table:
        s = t.column("s_lex").combine_chunks().cast(pa.large_string())
        return pa.table({"s": pc.unique(s.filter(
            pc.is_in(s, value_set=cv)))})

    seen = {r["s"] for r in triples_ds.map_batches(
        seen_scan, batch_format="pyarrow").take_all()}
    empty = pd.DataFrame(columns=[
        "s_kind", "s_lex", "p", "o_kind", "o_lex", "o_datatype",
        "o_lang"])
    rows = []
    for focus, term in cands.items():
        if focus in seen:
            continue
        rows.extend(_validate_focus(
            empty, shapes,
            {**ctx, "_focus": focus, "_focus_term": term},
            focus_kind=term[0]))
    if not rows:
        return None
    return rd.from_arrow(pa.table({
        "focus": pa.array([r[0] for r in rows], pa.large_string()),
        "path": pa.array([r[1] for r in rows], pa.large_string()),
        "constraint": pa.array([r[2] for r in rows], pa.large_string()),
        "detail": pa.array([r[3] for r in rows], pa.large_string()),
    }))


def _path_shape_violations(triples_ds, shapes: list[NodeShape], ctx):
    """Property shapes whose sh:path is an EXPRESSION (inverse /
    sequence / alternative / closure): value nodes are computed by ONE
    distributed ops/paths eval per shape (seeded with the focus set),
    counts by a groupby on the start column, value facets by a
    map_batches pass over the (focus, value) pairs joined with a
    node-term-metadata relation. The focus list is collected to the
    driver to seed the closure — explicit-target lists are small; a
    targetClass focus set is broadcast-scale by the same documented
    assumption as the sparql-constraint lane."""
    import ray
    import ray.data as rd

    from ..ops import paths as _paths

    per = []
    edges = None
    meta_ds = None
    for shape in shapes:
        if shape.deactivated:
            continue
        pps = [ps for ps in shape.properties if ps.path_expr is not None]
        if not pps:
            continue
        focus = _focus_dataset(triples_ds, shape)
        if focus is None:
            continue
        focus_list = sorted({r["this"] for r in focus.take_all()})
        if edges is None:
            def to_edges(t: pa.Table) -> pa.Table:
                return pa.table({
                    "s": t.column("s_lex").combine_chunks()
                    .cast(pa.large_string()),
                    "p": t.column("p").combine_chunks()
                    .cast(pa.large_string()),
                    "o": t.column("o_lex").combine_chunks()
                    .cast(pa.large_string())})

            edges = triples_ds.map_batches(to_edges,
                                           batch_format="pyarrow")

            def to_meta(t: pa.Table) -> pa.Table:
                return pa.table({
                    "end": t.column("o_lex").combine_chunks()
                    .cast(pa.large_string()),
                    "__k": pc.cast(
                        t.column("o_kind").combine_chunks(), pa.int64())})

            meta_ds = (triples_ds.map_batches(to_meta,
                                              batch_format="pyarrow")
                       .groupby("end")
                       .max("__k")
                       .map_batches(
                           lambda t: pa.table({
                               "end": t.column(0).combine_chunks()
                               .cast(pa.large_string()),
                               "__k": t.column(1).combine_chunks()
                               .cast(pa.int8())})
                           if t.num_columns else t,
                           batch_format="pyarrow"))
            # keep dt/lang via a second pass only when a facet needs
            # them — kind suffices for nodeKind/class/hasValue
        for ps in pps:
            pairs = _paths.eval_path(edges, ps.path_expr,
                                     seeds=focus_list)
            counts = {r["start"]: r["count()"]
                      for r in pairs.groupby("start").count().take_all()}
            rows = []
            for f in focus_list:
                n = counts.get(f, 0)
                if ps.min_count is not None and n < ps.min_count:
                    rows.append((f, ps.path, "minCount",
                                 f"{n} < {ps.min_count}"))
                if ps.max_count is not None and n > ps.max_count:
                    rows.append((f, ps.path, "maxCount",
                                 f"{n} > {ps.max_count}"))
            if ps.has_value is not None:
                hv_lex = ps.has_value[1]
                havers = {r["start"] for r in pairs.map_batches(
                    lambda t, _v=hv_lex: t.filter(
                        pc.equal(t.column("end"), _v))
                    if t.num_columns else t,
                    batch_format="pyarrow").take_all()}
                for f in focus_list:
                    if f not in havers:
                        rows.append((f, ps.path, "hasValue",
                                     "required value missing"))
            if rows:
                per.append(rd.from_arrow(pa.table({
                    "focus": pa.array([r[0] for r in rows],
                                      pa.large_string()),
                    "path": pa.array([r[1] for r in rows],
                                     pa.large_string()),
                    "constraint": pa.array([r[2] for r in rows],
                                           pa.large_string()),
                    "detail": pa.array([r[3] for r in rows],
                                       pa.large_string())})))
            if _block_nonempty(ps):
                # value-level facets over the pair relation: join the
                # value column with the node-term-metadata relation,
                # then check per batch with the broadcast block
                n_parts = 4
                joined = pairs.join(
                    meta_ds, join_type="left_outer",
                    num_partitions=n_parts, on=("end",))
                blk_ref = ray.put((ps, ctx))

                def vkernel(t: pa.Table) -> pa.Table:
                    from ..model import KIND_IRI as _KI

                    ps_, ctx_ = ray.get(blk_ref)
                    focus_o: list = []
                    con: list = []
                    det: list = []
                    if t.num_columns and "start" in t.schema.names:
                        ks = (t.column("__k").to_pylist()
                              if "__k" in t.schema.names
                              else [None] * t.num_rows)
                        starts = t.column("start").to_pylist()
                        ends = t.column("end").to_pylist()
                        for f, v, k in zip(starts, ends, ks):
                            kk = _KI if k is None else int(k)
                            for c, d in _check_value(
                                    ps_, kk, v, "", ctx_, ""):
                                focus_o.append(f)
                                con.append(c)
                                det.append(d)
                    return pa.table({
                        "focus": pa.array(focus_o, pa.large_string()),
                        "path": pa.array([ps_.path] * len(focus_o),
                                         pa.large_string()),
                        "constraint": pa.array(con, pa.large_string()),
                        "detail": pa.array(det, pa.large_string())})

                per.append(joined.map_batches(vkernel,
                                              batch_format="pyarrow"))
    if not per:
        return None
    out = per[0]
    for p in per[1:]:
        out = out.union(p)
    return out


def validate(triples_ds, shapes_ttl: str, base: str = ""):
    """Violations Dataset (focus, path, constraint, detail)."""
    return validate_shapes(triples_ds, parse_shapes(shapes_ttl, base=base))


def validate_shapes(triples_ds, shapes: list[NodeShape]):
    """validate() over pre-parsed shapes (Turtle or SHACLC front end)."""
    import ray
    members, implies = _class_extents(
        triples_ds, _collect_classes(shapes))
    ctx = {
        "classes": members,
        "implies": implies,
        "nodes": {},
        "objects_of": {},
    }
    ctx["objects_of"] = {
        p: m for p, m in _objects_of_sets(triples_ds, shapes).items()}
    ctx["nodes"], ctx["block_rows"] = _node_conf_sets(
        triples_ds, shapes, ctx)
    shapes_ref = ray.put((shapes, ctx))

    def check(group: pd.DataFrame) -> pd.DataFrame:
        sh, ctx_ = ray.get(shapes_ref)
        rows = _validate_focus(group, sh, ctx_)
        return pd.DataFrame(
            rows, columns=["focus", "path", "constraint", "detail"]
        )

    base = triples_ds.groupby("s_lex").map_groups(check, batch_format="pandas")
    out = base
    ph = _phantom_focus_rows(triples_ds, shapes, ctx)
    if ph is not None:
        out = out.union(ph)
    pv = _path_shape_violations(triples_ds, shapes, ctx)
    if pv is not None:
        out = out.union(pv)
    sv = _sparql_violations(triples_ds, shapes)
    return out.union(sv) if sv is not None else out
