"""SHACL Compact Syntax (SHACLC) reader.

Reference: jena-shacl shaclc/shaclc.jj (grammar) +
compact/reader/ShaclCompactParser.java (triple-emission semantics);
test corpus jena-shacl/src/test/files/shaclc-valid/ (32 .shaclc
fixtures, each with a golden .ttl — tests/test_shaclc.py checks graph
isomorphism against every one).

Strategy mirrors Jena's: the compact document COMPILES TO TRIPLES
(`shaclc_to_triples`), then the ordinary shape parser consumes them
(`stages/shacl.shapes_from_triples`) — so SHACLC documents validate
through the exact same distributed stage as Turtle shape graphs, with
full support for nested shapes, shapeClass, node/property `|`
alternatives, `!` negation, shape refs `@x`, arrays, and the SPARQL
path subset (sequence / alternative / inverse / * + ?).

Grammar → triple mapping highlights (ShaclCompactParser.java):
  shape IRI [-> t...] {..}   IRI rdf:type sh:NodeShape (+sh:targetClass)
  shapeClass IRI {..}        + rdf:type rdfs:Class (implicit class target)
  param=value                sh:<param> value on the context shape
  path type [n..m] atoms     bnode property shape; a bare IRI atom is
                             sh:datatype when the IRI is an RDF datatype
                             (XSD namespace or rdf:langString/HTML/JSON/
                             XMLLiteral — ShLib.isDatatype), else sh:class
  a|b alternatives           sh:or RDF list; single operand pulls up
  !x                         bnode + sh:not
  nested { ... }             fresh bnode + sh:node (no rdf:type)
  @Shape / @<iri>            sh:node reference
  BASE/IMPORTS               <base> rdf:type owl:Ontology + owl:imports
                             (subject urn:x-base:default without BASE)
"""

from __future__ import annotations

import re

from ..model import KIND_BNODE, KIND_IRI, KIND_LITERAL, RDFParseError

SH = "http://www.w3.org/ns/shacl#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"

_IMPLICIT = {
    "xsd": XSD_NS,
    "rdf": RDF_NS,
    "rdfs": RDFS_NS,
    "sh": SH,
    "owl": OWL_NS,
}

_NODE_KINDS = frozenset({
    "IRI", "Literal", "BlankNode",
    "BlankNodeOrIRI", "BlankNodeOrLiteral", "IRIOrLiteral",
})

# nodeParam / propertyParam keyword sets (shaclc.jj)
_NODE_PARAMS = frozenset({
    "targetNode", "targetObjectsOf", "targetSubjectsOf", "targetClass",
    "deactivated", "severity", "message",
    "class", "datatype", "nodeKind",
    "minExclusive", "minInclusive", "maxExclusive", "maxInclusive",
    "minLength", "maxLength", "pattern", "flags", "languageIn",
    "equals", "disjoint",
    "closed", "ignoredProperties", "hasValue", "in",
})
_PROP_PARAMS = frozenset({
    "deactivated", "severity", "message",
    "class", "datatype", "nodeKind",
    "minExclusive", "minInclusive", "maxExclusive", "maxInclusive",
    "minLength", "maxLength", "pattern", "flags", "languageIn",
    "uniqueLang",
    "equals", "disjoint", "lessThan", "lessThanOrEquals",
    "qualifiedValueShape", "qualifiedMinCount", "qualifiedMaxCount",
    "qualifiedValueShapesDisjoint",
    "closed", "ignoredProperties", "hasValue", "in",
    "group", "order", "name", "description",
})

# ShLib.isDatatype: the XSD namespace plus the rdf datatypes
_RDF_DATATYPES = frozenset({
    RDF_NS + "langString", RDF_NS + "HTML",
    RDF_NS + "JSON", RDF_NS + "XMLLiteral",
})


def _is_datatype(iri: str) -> bool:
    return iri.startswith(XSD_NS) or iri in _RDF_DATATYPES


_TOKEN = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<iriref><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<string>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"
               |'''(?:[^'\\]|\\.|'(?!''))*'''
               |"(?:[^"\\\n]|\\.)*"
               |'(?:[^'\\\n]|\\.)*')
    | (?P<at>@)
    | (?P<double>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
    | (?P<decimal>[+-]?\d*\.\d+)
    | (?P<integer>[+-]?\d+)
    | (?P<pname>(?:[A-Za-z_][\w.\-]*)?:(?:[\w\-:%](?:[\w.\-:%]*[\w\-:%])?)?)
    | (?P<ident>[A-Za-z][\w\-]*)
    | (?P<punct>->|\.\.|\^\^|[{}\[\]().|!^/=*?+])
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= len(s):
            raise RDFParseError("SHACLC: dangling backslash in string")
        e = s[i + 1]
        if e in _ESCAPES:
            out.append(_ESCAPES[e])
            i += 2
        elif e == "u":
            out.append(chr(int(s[i + 2:i + 6], 16)))
            i += 6
        elif e == "U":
            out.append(chr(int(s[i + 2:i + 10], 16)))
            i += 10
        else:
            raise RDFParseError(f"SHACLC: bad escape \\{e}")
    return "".join(out)


def _tokenize(text: str):
    toks = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            raise RDFParseError(
                f"SHACLC: cannot parse at {text[pos:pos + 32]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append((kind, m.group(0)))
    toks.append(("eof", ""))
    return toks


class _Parser:
    """Recursive-descent SHACLC parser emitting parse_turtle-shaped
    7-tuples: (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang)."""

    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.triples: list[tuple] = []
        self.prefixes = dict(_IMPLICIT)
        self.base: str | None = None
        self.imports: list[str] = []
        self._bn = 0

    # -- token helpers -------------------------------------------------
    def peek(self, ahead: int = 0):
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val: str | None = None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise RDFParseError(
                f"SHACLC: expected {val or kind}, got {v!r}")
        return v

    def at_punct(self, val: str) -> bool:
        k, v = self.peek()
        return k == "punct" and v == val

    def eat_punct(self, val: str) -> bool:
        if self.at_punct(val):
            self.i += 1
            return True
        return False

    # -- term helpers --------------------------------------------------
    def bnode(self):
        self._bn += 1
        return (KIND_BNODE, f"shc{self._bn}")

    def emit(self, s, p, o):
        """s: (kind, lex); p: iri str; o: (kind, lex[, dt, lang])."""
        dt = o[2] if len(o) > 2 else ""
        lang = o[3] if len(o) > 3 else ""
        self.triples.append((s[0], s[1], p, o[0], o[1], dt, lang))

    def rdf_list(self, items: list[tuple]) -> tuple:
        """RDF collection triples; returns the head term."""
        head: tuple = (KIND_IRI, RDF_NS + "nil")
        for it in reversed(items):
            cell = self.bnode()
            self.emit(cell, RDF_NS + "first", it)
            self.emit(cell, RDF_NS + "rest", head)
            head = cell
        return head

    def resolve(self, iriref: str) -> str:
        iri = _unescape_iri(iriref[1:-1])
        if self.base and not re.match(r"^[A-Za-z][\w+.\-]*:", iri):
            from .iri import resolve
            return resolve(self.base, iri)
        return iri

    def expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise RDFParseError(f"SHACLC: unknown prefix {pfx!r}")
        return self.prefixes[pfx] + local

    def parse_iri(self) -> str:
        k, v = self.next()
        if k == "iriref":
            return self.resolve(v)
        if k == "pname":
            return self.expand_pname(v)
        raise RDFParseError(f"SHACLC: expected IRI, got {v!r}")

    def at_iri(self) -> bool:
        return self.peek()[0] in ("iriref", "pname")

    # -- document ------------------------------------------------------
    def parse(self) -> list[tuple]:
        while True:
            k, v = self.peek()
            if k == "ident" and v == "BASE":
                self.next()
                kk, vv = self.next()
                if kk != "iriref":
                    raise RDFParseError("SHACLC: BASE needs an IRIREF")
                self.base = vv[1:-1]
            elif k == "ident" and v == "IMPORTS":
                self.next()
                self.imports.append(self.parse_iri())
            elif k == "ident" and v == "PREFIX":
                self.next()
                kk, vv = self.next()
                if kk != "pname" or not vv.endswith(":"):
                    raise RDFParseError(
                        f"SHACLC: bad PREFIX declaration {vv!r}")
                kk2, vv2 = self.next()
                if kk2 != "iriref":
                    raise RDFParseError("SHACLC: PREFIX needs an IRIREF")
                self.prefixes[vv[:-1]] = self.resolve(vv2)
            else:
                break
        # ontology header (rBase/rImports + ShaclCompactParser.finish):
        # always present in jena's output graph
        onto = (KIND_IRI, self.base if self.base else "urn:x-base:default")
        self.emit(onto, RDF_NS + "type", (KIND_IRI, OWL_NS + "Ontology"))
        for imp in self.imports:
            self.emit(onto, OWL_NS + "imports", (KIND_IRI, imp))
        while True:
            k, v = self.peek()
            if k == "eof":
                break
            if k == "ident" and v == "shape":
                self.next()
                self.node_shape()
            elif k == "ident" and v == "shapeClass":
                self.next()
                self.shape_class()
            else:
                raise RDFParseError(
                    f"SHACLC: expected shape/shapeClass, got {v!r}")
        return self.triples

    def node_shape(self):
        shape = (KIND_IRI, self.parse_iri())
        self.emit(shape, RDF_NS + "type", (KIND_IRI, SH + "NodeShape"))
        if self.eat_punct("->"):
            while self.at_iri():
                self.emit(shape, SH + "targetClass",
                          (KIND_IRI, self.parse_iri()))
        self.shape_body(shape)

    def shape_class(self):
        shape = (KIND_IRI, self.parse_iri())
        self.emit(shape, RDF_NS + "type", (KIND_IRI, SH + "NodeShape"))
        self.emit(shape, RDF_NS + "type", (KIND_IRI, RDFS_NS + "Class"))
        self.shape_body(shape)

    def shape_body(self, shape):
        self.expect("punct", "{")
        while not self.eat_punct("}"):
            self.constraint(shape)

    # -- constraints ---------------------------------------------------
    def _starts_node_value(self) -> bool:
        k, v = self.peek()
        if k == "punct" and v == "!":
            k, v = self.peek(1)
        return k == "ident" and v in _NODE_PARAMS and (
            self.peek(1)[1] == "=" or self.peek(2)[1] == "=")

    def constraint(self, shape):
        acc_start = len(self.triples)
        k, v = self.peek()
        if k == "at":
            # node-level shape ref (jena extension)
            self.next()
            self.emit(shape, SH + "node", (KIND_IRI, self._shape_ref_iri()))
        elif self._starts_node_value():
            while self._starts_node_value():
                self.node_or(shape, acc_start)
        else:
            self.property_shape(shape)
        self.expect("punct", ".")

    def node_or(self, shape, acc_start):
        alts = []
        while True:
            b = self.bnode()
            sub_start = len(self.triples)
            self.node_not(b)
            alts.append((b, sub_start))
            if not self.eat_punct("|"):
                break
        if len(alts) == 1:
            b, sub_start = alts[0]
            self._rewrite_subj(sub_start, b, shape)
        else:
            head = self.rdf_list([b for b, _ in alts])
            self.emit(shape, SH + "or", head)

    def node_not(self, ctx):
        if self.eat_punct("!"):
            nb = self.bnode()
            self.node_value(nb)
            self.emit(ctx, SH + "not", nb)
        else:
            self.node_value(ctx)

    def node_value(self, ctx):
        k, v = self.next()
        if k != "ident" or v not in _NODE_PARAMS:
            raise RDFParseError(f"SHACLC: bad node param {v!r}")
        self.expect("punct", "=")
        self._param_value(ctx, v)

    def _param_value(self, ctx, param):
        if self.at_punct("["):
            self.next()
            items = []
            while not self.eat_punct("]"):
                items.append(self.iri_or_literal())
            self.emit(ctx, SH + param, self.rdf_list(items))
        else:
            self.emit(ctx, SH + param, self.iri_or_literal())

    def iri_or_literal(self) -> tuple:
        k, v = self.peek()
        if k in ("iriref", "pname"):
            return (KIND_IRI, self.parse_iri())
        if k == "string":
            self.next()
            if v.startswith(('"""', "'''")):
                lex = _unescape(v[3:-3])
            else:
                lex = _unescape(v[1:-1])
            nk, nv = self.peek()
            if nk == "at" and self.peek(1)[0] == "ident":
                self.next()
                _, tag = self.next()
                # continue hyphenated subtags glued by the tokenizer
                return (KIND_LITERAL, lex, RDF_NS + "langString", tag)
            if nk == "punct" and nv == "^^":
                self.next()
                return (KIND_LITERAL, lex, self.parse_iri(), "")
            return (KIND_LITERAL, lex, XSD_NS + "string", "")
        if k == "integer":
            self.next()
            return (KIND_LITERAL, v, XSD_NS + "integer", "")
        if k == "decimal":
            self.next()
            return (KIND_LITERAL, v, XSD_NS + "decimal", "")
        if k == "double":
            self.next()
            return (KIND_LITERAL, v, XSD_NS + "double", "")
        if k == "ident" and v in ("true", "false"):
            self.next()
            return (KIND_LITERAL, v, XSD_NS + "boolean", "")
        raise RDFParseError(f"SHACLC: expected IRI or literal, got {v!r}")

    # -- property shapes -----------------------------------------------
    def property_shape(self, shape):
        path_term = self.parse_path()
        pbn = self.bnode()
        self.emit(shape, SH + "property", pbn)
        self.emit(pbn, SH + "path", path_term)
        while True:
            if self.at_punct("["):
                self.property_count(pbn)
            elif self.at_punct("."):
                break
            else:
                self.property_or(pbn)

    def property_count(self, pbn):
        self.expect("punct", "[")
        lo = self.expect("integer")
        self.expect("punct", "..")
        k, v = self.next()
        if k == "integer":
            hi = v
        elif k == "punct" and v == "*":
            hi = None
        else:
            raise RDFParseError(f"SHACLC: bad max count {v!r}")
        self.expect("punct", "]")
        if int(lo) > 0:
            self.emit(pbn, SH + "minCount",
                      (KIND_LITERAL, lo, XSD_NS + "integer", ""))
        if hi is not None and int(hi) > 0:
            self.emit(pbn, SH + "maxCount",
                      (KIND_LITERAL, hi, XSD_NS + "integer", ""))

    def property_or(self, pbn):
        alts = []
        while True:
            b = self.bnode()
            sub_start = len(self.triples)
            self.property_not(b)
            alts.append((b, sub_start))
            if not self.eat_punct("|"):
                break
        if len(alts) == 1:
            b, sub_start = alts[0]
            self._rewrite_subj(sub_start, b, pbn)
        else:
            head = self.rdf_list([b for b, _ in alts])
            self.emit(pbn, SH + "or", head)

    def property_not(self, ctx):
        if self.eat_punct("!"):
            nb = self.bnode()
            self.property_atom(nb)
            self.emit(ctx, SH + "not", nb)
        else:
            self.property_atom(ctx)

    def property_atom(self, ctx):
        k, v = self.peek()
        if k == "ident" and v in _NODE_KINDS:
            self.next()
            self.emit(ctx, SH + "nodeKind", (KIND_IRI, SH + v))
            return
        if k == "at":
            self.next()
            self.emit(ctx, SH + "node", (KIND_IRI, self._shape_ref_iri()))
            return
        if k == "punct" and v == "{":
            nested = self.bnode()
            self.emit(ctx, SH + "node", nested)
            self.shape_body(nested)
            return
        if k == "ident" and v in _PROP_PARAMS and self.peek(1)[1] == "=":
            self.next()
            self.next()
            self._param_value(ctx, v)
            return
        if k in ("iriref", "pname"):
            iri = self.parse_iri()
            p = "datatype" if _is_datatype(iri) else "class"
            self.emit(ctx, SH + p, (KIND_IRI, iri))
            return
        raise RDFParseError(f"SHACLC: bad property atom at {v!r}")

    def _shape_ref_iri(self) -> str:
        k, v = self.next()
        if k == "iriref":
            return self.resolve(v)
        if k == "pname":
            return self.expand_pname(v)
        raise RDFParseError(f"SHACLC: bad shape ref @{v!r}")

    def _rewrite_subj(self, start: int, frm: tuple, to: tuple):
        """Single-operand pull-up (ShaclCompactParser.rewriteSubj)."""
        for j in range(start, len(self.triples)):
            t = self.triples[j]
            if t[0] == frm[0] and t[1] == frm[1]:
                self.triples[j] = (to[0], to[1]) + t[2:]

    # -- paths (SPARQL path subset: no negation / property sets) -------
    def _starts_path(self) -> bool:
        k, v = self.peek()
        return k in ("iriref", "pname") or (
            k == "punct" and v in ("(", "^"))

    def parse_path(self) -> tuple:
        members = [self.path_sequence()]
        while self.at_punct("|") and self._path_alt_continues():
            self.next()
            members.append(self.path_sequence())
        if len(members) == 1:
            return members[0]
        b = self.bnode()
        self.emit(b, SH + "alternativePath", self.rdf_list(members))
        return b

    def _path_alt_continues(self) -> bool:
        k, v = self.peek(1)
        return k in ("iriref", "pname") or (
            k == "punct" and v in ("(", "^"))

    def path_sequence(self) -> tuple:
        elts = [self.path_elt_or_inverse()]
        while self.eat_punct("/"):
            elts.append(self.path_elt_or_inverse())
        if len(elts) == 1:
            return elts[0]
        return self.rdf_list(elts)

    def path_elt_or_inverse(self) -> tuple:
        if self.eat_punct("^"):
            b = self.bnode()
            self.emit(b, SH + "inversePath", self.path_elt())
            return b
        return self.path_elt()

    def path_elt(self) -> tuple:
        prim = self.path_primary()
        for mod, pred in (("*", "zeroOrMorePath"), ("+", "oneOrMorePath"),
                          ("?", "zeroOrOnePath")):
            if self.at_punct(mod):
                self.next()
                b = self.bnode()
                self.emit(b, SH + pred, prim)
                return b
        return prim

    def path_primary(self) -> tuple:
        if self.eat_punct("("):
            p = self.parse_path()
            self.expect("punct", ")")
            return p
        return (KIND_IRI, self.parse_iri())


def _unescape_iri(s: str) -> str:
    if "\\" not in s:
        return s
    return re.sub(
        r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})",
        lambda m: chr(int(m.group(1) or m.group(2), 16)), s)


def shaclc_to_triples(text: str) -> tuple[list[tuple], dict[str, str]]:
    """SHACLC document → (7-tuple triples, prefix map). The graph is
    isomorphic to what jena's ShaclcParser streams for the same input
    (tests/test_shaclc.py proves this against all 32 golden .ttl)."""
    p = _Parser(text)
    triples = p.parse()
    return triples, p.prefixes


def parse_shaclc(text: str):
    """SHACLC document → NodeShape list via the shared triple-level
    shape parser (stages/shacl.shapes_from_triples)."""
    from ..stages.shacl import shapes_from_triples

    triples, prefixes = shaclc_to_triples(text)
    doc_prefixes = [f"PREFIX {k}: <{v}>" for k, v in prefixes.items()]
    return shapes_from_triples(triples, doc_prefixes)


def validate_shaclc(triples_ds, shaclc_text: str):
    """SHACLC document → the same distributed validation stage as
    Turtle shapes (stages/shacl.validate_shapes)."""
    from ..stages.shacl import validate_shapes

    return validate_shapes(triples_ds, parse_shaclc(shaclc_text))
