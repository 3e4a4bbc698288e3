"""W3C SPARQL test-suite manifest reader + result-set comparison.

Counterpart of the reference's manifest-driven SPARQL runner
(jena-arq/src/test/java/org/apache/jena/arq/junit/sparql/
SparqlTests.java + QueryEvalTest.java) for the vendored
rdf-tests-cg/sparql/ suites. The manifest is Turtle, bootstrap-parsed
with our own parser; expected results are SPARQL-XML (.srx), JSON
(.srj) or Turtle graphs (CONSTRUCT golden).

Comparison semantics (documented weakening vs ResultSetCompare.java):
the engine's SELECT projection yields lexical forms without datatype
metadata, so terms compare in VALUE SPACE — numeric-typed literals
numerically, everything else by lexical form; blank nodes match under
a consistent bijection (backtracking, result sets are test-sized).
"""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from ..model import KIND_IRI, RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE
from .turtle import parse_turtle

MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
UT = "http://www.w3.org/2009/sparql/tests/test-update#"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
XSD = "http://www.w3.org/2001/XMLSchema#"

# mfx: is the reference's own test vocabulary (testing/ARQ manifests;
# arq/junit/manifest/ManifestEntry.java) — mfx:TestQuery is a plain
# query-evaluation test run with ARQ's extended syntax admitted
MFX = "http://jena.hpl.hp.com/2005/05/test-manifest-extra#"
EVAL_TYPES = {MF + "QueryEvaluationTest", MFX + "TestQuery"}
UPDATE_EVAL_TYPES = {MF + "UpdateEvaluationTest", UT + "UpdateEvaluationTest"}
SYNTAX_POS = {MF + "PositiveSyntaxTest", MF + "PositiveSyntaxTest11"}
SYNTAX_NEG = {MF + "NegativeSyntaxTest", MF + "NegativeSyntaxTest11"}
SYNTAX_UPDATE_POS = {MF + "PositiveUpdateSyntaxTest11"}
SYNTAX_UPDATE_NEG = {MF + "NegativeUpdateSyntaxTest11"}

_NUMERIC_DTS = {
    XSD + s
    for s in ("integer", "decimal", "double", "float", "long", "int",
              "short", "byte", "nonNegativeInteger", "positiveInteger",
              "nonPositiveInteger", "negativeInteger", "unsignedLong",
              "unsignedInt", "unsignedShort", "unsignedByte")
}


@dataclass
class SparqlTest:
    name: str
    kind: str            # "eval" | "update" | "syntax+" | "syntax-" | type IRI
    query: str           # absolute path to the .rq/.ru file
    data: list = field(default_factory=list)        # default-graph files
    graph_data: list = field(default_factory=list)  # named-graph files
    result: str | None = None
    regimes: list = field(default_factory=list)  # sd:entailmentRegime
    # update-evaluation tests: named-graph inputs/goldens carry labels
    graph_data_labeled: list = field(default_factory=list)  # (file, label)
    result_data: list = field(default_factory=list)         # golden default
    result_graph_data: list = field(default_factory=list)   # (file, label)


def read_sparql_manifest(manifest_path: str) -> list[SparqlTest]:
    manifest_path = os.path.abspath(manifest_path)
    dir_path = os.path.dirname(manifest_path)
    base = "file://" + manifest_path
    triples = parse_turtle(
        open(manifest_path, encoding="utf-8").read(), base=base)

    idx: dict[tuple, dict[str, list[tuple]]] = {}
    for t in triples:
        idx.setdefault((t[0], t[1]), {}).setdefault(t[2], []).append(
            (t[3], t[4]))

    def get1(node, p):
        v = idx.get(node, {}).get(p)
        return v[0] if v else None

    def getall(node, p):
        return idx.get(node, {}).get(p, [])

    def to_path(iri: str) -> str:
        if iri.startswith("file://"):
            return iri[len("file://"):]
        return os.path.join(dir_path, iri.rsplit("/", 1)[-1])

    root = (KIND_IRI, base)
    if MF + "entries" not in idx.get(root, {}):
        for node, props in idx.items():
            if MF + "entries" in props:
                root = node
                break

    out: list[SparqlTest] = []
    node = get1(root, MF + "entries")
    while node is not None and not (node[0] == KIND_IRI and node[1] == RDF_NIL):
        entry = get1(node, RDF_FIRST)
        node = get1(node, RDF_REST)
        if entry is None:
            break
        ttype = get1(entry, RDF_TYPE)
        action = get1(entry, MF + "action")
        if action is None:
            continue
        if ttype is None:
            # the reference's runner defaults untyped manifest entries
            # with a qt:query action to query-evaluation tests
            # (testing/ARQ/OrderBy etc.; SparqlTests.java)
            if get1(action, QT + "query") is None:
                continue
            ttype = (KIND_IRI, MF + "QueryEvaluationTest")
        t = ttype[1]
        name_t = get1(entry, MF + "name")
        name = name_t[1] if name_t else entry[1].rsplit("#", 1)[-1]
        if t in EVAL_TYPES:
            q = get1(action, QT + "query")
            if q is None:
                continue
            data = [to_path(o) for _, o in getall(action, QT + "data")]
            gdata = [to_path(o) for _, o in getall(action, QT + "graphData")]
            res = get1(entry, MF + "result")
            SD = "http://www.w3.org/ns/sparql-service-description#"
            regimes = []
            reg = get1(action, SD + "entailmentRegime")
            while reg is not None:
                first = get1(reg, RDF_FIRST)
                if first is None:
                    # a single IRI rather than a list
                    regimes.append(reg[1].rsplit("/", 1)[-1])
                    break
                regimes.append(first[1].rsplit("/", 1)[-1])
                reg = get1(reg, RDF_REST)
                if reg is not None and reg[0] == KIND_IRI \
                        and reg[1] == RDF_NIL:
                    break
            out.append(SparqlTest(
                name=name, kind="eval", query=to_path(q[1]), data=data,
                graph_data=gdata,
                result=to_path(res[1]) if res else None,
                regimes=regimes,
            ))
        elif t in UPDATE_EVAL_TYPES:
            req = get1(action, UT + "request")
            if req is None:
                continue

            def labeled(node_props, parent):
                out = []
                for _, gd in [(None, o) for o in parent]:
                    gfile = get1(gd, UT + "graph")
                    glabel = get1(gd, RDFS_LABEL)
                    if gfile is not None:
                        out.append((to_path(gfile[1]),
                                    glabel[1] if glabel else ""))
                return out

            data = [to_path(o[1])
                    for o in idx.get(action, {}).get(UT + "data", [])]
            gdata = labeled(None, [
                (o[0], o[1])
                for o in idx.get(action, {}).get(UT + "graphData", [])])
            res = get1(entry, MF + "result")
            rdata, rgdata = [], []
            if res is not None:
                rdata = [to_path(o[1])
                         for o in idx.get(res, {}).get(UT + "data", [])]
                rgdata = labeled(None, [
                    (o[0], o[1])
                    for o in idx.get(res, {}).get(UT + "graphData", [])])
            out.append(SparqlTest(
                name=name, kind="update", query=to_path(req[1]),
                data=data, graph_data_labeled=gdata,
                result_data=rdata, result_graph_data=rgdata,
            ))
        elif t in SYNTAX_POS or t in SYNTAX_NEG:
            out.append(SparqlTest(
                name=name,
                kind="syntax+" if t in SYNTAX_POS else "syntax-",
                query=to_path(action[1]),
            ))
        elif t in SYNTAX_UPDATE_POS or t in SYNTAX_UPDATE_NEG:
            out.append(SparqlTest(
                name=name,
                kind="usyntax+" if t in SYNTAX_UPDATE_POS else "usyntax-",
                query=to_path(action[1]),
            ))
        else:
            out.append(SparqlTest(name=name, kind=t, query=""))
    return out


# --- expected-result readers ------------------------------------------------

_SRX_NS = "{http://www.w3.org/2005/sparql-results#}"


def read_srx(text: str):
    """SPARQL-XML results → ("ask", bool) or ("rows", vars, solutions)
    where a solution maps var → (type, value, datatype, lang)."""
    root = ET.fromstring(text)
    boolean = root.find(_SRX_NS + "boolean")
    if boolean is not None:
        return ("ask", boolean.text.strip() == "true")
    head = root.find(_SRX_NS + "head")
    vars_ = [v.get("name") for v in head.findall(_SRX_NS + "variable")] \
        if head is not None else []
    sols = []
    results = root.find(_SRX_NS + "results")
    for res in (results.findall(_SRX_NS + "result") if results is not None
                else []):
        sol = {}
        for b in res.findall(_SRX_NS + "binding"):
            var = b.get("name")
            for child in b:
                term = _srx_term(child)
                if term is not None:
                    sol[var] = term
        sols.append(sol)
    return ("rows", vars_, sols)


def _srx_term(child):
    tag = child.tag.replace(_SRX_NS, "")
    if tag == "uri":
        return ("uri", child.text or "", None, None)
    if tag == "bnode":
        return ("bnode", child.text or "", None, None)
    if tag == "literal":
        return (
            "literal", child.text or "",
            child.get("datatype"),
            child.get("{http://www.w3.org/XML/1998/namespace}lang"),
        )
    if tag == "triple":  # RDF 1.2 triple term (SPARQL 1.2 results-XML)
        parts = {}
        for pos in ("subject", "predicate", "object"):
            el = child.find(_SRX_NS + pos)
            if el is None or len(el) == 0:
                return None
            parts[pos] = _srx_term(el[0])
        return ("triple", parts, None, None)
    return None


def read_srj(text: str):
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        # jena's tolerant SRJ reader accepts UNQUOTED member names —
        # several hand-written goldens use them (ARQ Lateral
        # lateral-4/5.srj `z: {...}`); quote bare keys and retry
        import re as _re

        fixed = _re.sub(r"([,{\[]\s*)([A-Za-z_]\w*)(\s*:)",
                        r'\1"\2"\3', text)
        # ... and bare identifiers as ARRAY values (lateral-5.srj's
        # `"vars": [ "s", "o", z ]`)
        fixed = _re.sub(
            r"([,\[]\s*)(?!true\b|false\b|null\b)([A-Za-z_]\w*)(\s*[,\]])",
            r'\1"\2"\3', fixed)
        doc = json.loads(fixed)
    if "boolean" in doc:
        return ("ask", bool(doc["boolean"]))
    vars_ = doc.get("head", {}).get("vars", [])
    sols = []
    for b in doc.get("results", {}).get("bindings", []):
        sol = {}
        for var, term in b.items():
            sol[var] = _srj_term(term)
        sols.append(sol)
    return ("rows", vars_, sols)


def _srj_term(term: dict):
    t = term.get("type")
    if t == "uri":
        return ("uri", term.get("value", ""), None, None)
    if t == "bnode":
        return ("bnode", term.get("value", ""), None, None)
    if t == "triple":  # RDF 1.2 triple term (SPARQL 1.2 results-JSON)
        val = term.get("value", {})
        return ("triple", {
            "subject": _srj_term(val.get("subject", {})),
            "predicate": _srj_term(val.get("predicate", {})),
            "object": _srj_term(val.get("object", {})),
        }, None, None)
    return ("literal", term.get("value", ""),
            term.get("datatype"), term.get("xml:lang"))


RS = "http://www.w3.org/2001/sw/DataAccess/tests/result-set#"


def read_rs_ttl(path: str):
    """DAWG RDF result-set vocabulary (.ttl / .rdf goldens of the
    sparql10 suite; ResultSetFormat rs: namespace) → same shape as
    read_srx."""
    from ..model import KIND_BNODE, KIND_IRI as K_IRI, KIND_LITERAL

    if path.endswith(".rdf"):
        from .rdfxml import parse_rdfxml

        triples = parse_rdfxml(open(path, encoding="utf-8").read(),
                               base="file://" + path)
    else:
        triples = parse_turtle(open(path, encoding="utf-8").read(),
                               base="file://" + path)
    idx: dict[tuple, dict[str, list[tuple]]] = {}
    for t in triples:
        idx.setdefault((t[0], t[1]), {}).setdefault(t[2], []).append(t)

    rset = None
    for node, props in idx.items():
        if any(o[4] == RS + "ResultSet" for o in props.get(RDF_TYPE, [])):
            rset = node
            break
    if rset is None:
        raise ValueError(f"no rs:ResultSet in {path}")
    props = idx[rset]
    if RS + "boolean" in props:
        return ("ask", props[RS + "boolean"][0][4] == "true")
    vars_ = sorted(o[4] for o in props.get(RS + "resultVariable", []))
    sols = []
    indexes = []
    for sol_t in props.get(RS + "solution", []):
        sol_node = (sol_t[3], sol_t[4])
        idx_t = idx.get(sol_node, {}).get(RS + "index")
        indexes.append(float(idx_t[0][4]) if idx_t else None)
        sol = {}
        for b_t in idx.get(sol_node, {}).get(RS + "binding", []):
            b_node = (b_t[3], b_t[4])
            var_t = idx.get(b_node, {}).get(RS + "variable")
            val_t = idx.get(b_node, {}).get(RS + "value")
            if not var_t or not val_t:
                continue
            v = var_t[0][4]
            o_kind, o_lex, o_dt, o_lang = (
                val_t[0][3], val_t[0][4], val_t[0][5], val_t[0][6])
            if o_kind == K_IRI:
                sol[v] = ("uri", o_lex, None, None)
            elif o_kind == KIND_BNODE:
                sol[v] = ("bnode", o_lex, None, None)
            else:
                sol[v] = ("literal", o_lex, o_dt or None, o_lang or None)
        sols.append(sol)
    if sols and all(i is not None for i in indexes):
        # rs:index records the ORDER BY order of the golden result
        sols = [s for _, s in sorted(zip(indexes, sols),
                                     key=lambda p: p[0])]
    return ("rows", vars_, sols)


def read_tsv_results(text: str):
    """SPARQL 1.1 TSV results (RowSetReaderTSV): header of ?vars, one
    encoded term per cell (<iri>, "lit"[@lang|^^<dt>], _:b, bare
    numbers), empty cell = unbound."""
    lines = [ln for ln in text.split("\n") if ln != ""]
    vars_ = [h.lstrip("?$") for h in lines[0].split("\t")]
    sols = []
    for ln in lines[1:]:
        sol = {}
        for var, cell in zip(vars_, ln.split("\t")):
            if cell == "":
                continue
            if cell.startswith("<") and cell.endswith(">"):
                sol[var] = ("uri", cell[1:-1], None, None)
            elif cell.startswith("_:"):
                sol[var] = ("bnode", cell[2:], None, None)
            elif cell.startswith('"'):
                body, _, suffix = cell[1:].rpartition('"')
                dt = lang = None
                if suffix.startswith("@"):
                    lang = suffix[1:]
                elif suffix.startswith("^^<") and suffix.endswith(">"):
                    dt = suffix[3:-1]
                body = (body.replace("\\t", "\t").replace("\\n", "\n")
                        .replace("\\r", "\r").replace('\\"', '"')
                        .replace("\\\\", "\\"))
                sol[var] = ("literal", body, dt, lang)
            else:  # bare numeric shorthand
                dt = (XSD + "double" if "e" in cell.lower()
                      else XSD + "decimal" if "." in cell
                      else XSD + "integer")
                sol[var] = ("literal", cell, dt, None)
        sols.append(sol)
    return ("rows", vars_, sols)


def read_expected(path: str):
    if path.endswith(".tsv"):
        return read_tsv_results(open(path, encoding="utf-8").read())
    if path.endswith(".srx"):
        return read_srx(open(path, encoding="utf-8").read())
    if path.endswith(".srj"):
        return read_srj(open(path, encoding="utf-8").read())
    if path.endswith((".ttl", ".rdf", ".n3")):
        # .n3 goldens in the ARQ corpus are Turtle-compatible
        return read_rs_ttl(path)
    raise ValueError(f"unsupported result format: {path}")


# --- comparison -------------------------------------------------------------


def _num(s) -> float | None:
    try:
        return float(s)
    except (TypeError, ValueError):
        return None


def _tt_comp_matches(exp, comp, bmap: dict) -> bool:
    """One expected term vs one PARSED triple-term component tuple
    (kind, lex, dt, lang) — recursive for nested triple terms; bnodes
    thread the same bijection as top-level terms."""
    from ..model import (KIND_BNODE, KIND_IRI, KIND_LITERAL,
                         KIND_TRIPLE_TERM, XSD_STRING)

    typ, value, dt, lang = exp
    kind, lex, cdt, clang = comp
    if typ == "triple":
        if kind != KIND_TRIPLE_TERM:
            return False
        from .tripleterm import parse_tt

        try:
            s_, p_, o_ = parse_tt(lex)
        except Exception:
            return False
        return (_tt_comp_matches(value["subject"], s_, bmap)
                and _tt_comp_matches(value["predicate"], p_, bmap)
                and _tt_comp_matches(value["object"], o_, bmap))
    if typ == "uri":
        return kind == KIND_IRI and lex == value
    if typ == "bnode":
        if kind != KIND_BNODE:
            return False
        if value in bmap:
            return bmap[value] == lex
        if lex in bmap.values():
            return False
        bmap[value] = lex
        return True
    if kind != KIND_LITERAL:
        return False
    if (lang or "").lower() != (clang or "").lower():
        return False
    if dt in _NUMERIC_DTS:
        ev, gv = _num(value), _num(lex)
        if ev is not None and gv is not None:
            return ev == gv
    dn = "" if dt in (None, "", XSD_STRING) else dt
    cn = "" if cdt in (None, "", XSD_STRING) else cdt
    return lex == value and dn == cn


def _term_matches(exp, got, bmap: dict) -> bool:
    """One expected term vs one engine value (lexical), under the
    current bnode bijection."""
    if exp is None:
        return got is None
    if got is None:
        return False
    typ, value, dt, _lang = exp
    g = str(got)
    if typ == "triple":
        from ..model import KIND_TRIPLE_TERM

        return _tt_comp_matches(exp, (KIND_TRIPLE_TERM, g, "", ""), bmap)
    if typ == "uri":
        return g == value
    if typ == "bnode":
        if value in bmap:
            return bmap[value] == g
        if g in bmap.values():
            return False
        bmap[value] = g
        return True
    if dt in _NUMERIC_DTS:
        ev, gv = _num(value), _num(got)
        if ev is None:  # ill-formed numeric literal → lexical comparison
            return g == value
        if gv is None:
            return False
        return ev == gv or abs(ev - gv) <= 1e-9 * max(abs(ev), abs(gv))
    if dt == XSD + "boolean":
        norm = {"true": "true", "1": "true", "false": "false", "0": "false"}
        return norm.get(g.lower()) == norm.get(value.lower())
    return g == value


def solutions_match_ordered(expected: list[dict], got: list[dict],
                            vars_: list[str]) -> bool:
    """Sequence equality of solution mappings (ORDER BY queries — the
    reference's ResultSetCompare ordered variant). The fixed pairing
    leaves no backtracking: the bnode bijection grows greedily."""
    if len(expected) != len(got):
        return False
    bmap: dict = {}
    for exp, g in zip(expected, got):
        for v in vars_:
            if not _term_matches(exp.get(v), g.get(v), bmap):
                return False
        for v in vars_:
            if v not in exp and g.get(v) is not None:
                return False
    return True


def solutions_match(expected: list[dict], got: list[dict],
                    vars_: list[str]) -> bool:
    """Multiset equality of solution mappings, with bnode labels matched
    under one consistent bijection (backtracking over the pairing —
    result sets are test-sized)."""
    if len(expected) != len(got):
        return False

    def backtrack(remaining_exp, remaining_got, bmap):
        if not remaining_exp:
            return True
        exp = remaining_exp[0]
        for i, g in enumerate(remaining_got):
            trial = dict(bmap)
            ok = True
            for v in vars_:
                if not _term_matches(exp.get(v), g.get(v), trial):
                    ok = False
                    break
            # engine rows must not bind vars the expected solution lacks
            if ok:
                for v in vars_:
                    if v not in exp and g.get(v) is not None:
                        ok = False
                        break
            if ok and backtrack(
                remaining_exp[1:],
                remaining_got[:i] + remaining_got[i + 1:],
                trial,
            ):
                return True
        return False

    return backtrack(expected, got, {})
