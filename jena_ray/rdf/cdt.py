"""CDT composite-datatype literals — the fork's cdt:List / cdt:Map.

Parity: jena-arq/src/main/java/org/apache/jena/cdt/
(CompositeDatatypeList.java:35, CompositeDatatypeMap.java:38, lexical
parser ParserForCDTLiterals.java; SPARQL test corpus
jena-arq/testing/SPARQL-CDTs/). Lexical forms:

    "[1, 'x', <http://e/a>, [2, 3]]"^^cdt:List
    "{'k': 1, <http://e/p>: 'v'}"^^cdt:Map

Values are nested lists/maps of RDF terms. We parse to nested Python
structures of term tuples, provide the canonical lexical form (stable
ordering for maps), value-space equality keys, and the core list/map
functions (concat, size, get) as vectorizable kernels.
"""

from __future__ import annotations

import re

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    XSD_NS,
    XSD_STRING,
    RDF_LANGSTRING,
    RDFParseError,
)
from . import grammar as g
from .escapes import escape_string, unescape_iri, unescape_string

CDT_NS = "http://w3id.org/awslabs/neptune/SPARQL-CDTs/"
CDT_LIST = CDT_NS + "List"
CDT_MAP = CDT_NS + "Map"

_TOKEN_SPEC = [
    ("WS", r"[ \t\r\n]+"),
    ("IRIREF", g.IRIREF),
    ("STRING2", g.STRING_LITERAL_QUOTE),
    ("STRING1", g.STRING_LITERAL_SINGLE_QUOTE),
    ("LANGTAG", g.LANGTAG),
    ("DTYPE", r"\^\^"),
    ("DOUBLE", g.DOUBLE),
    ("DECIMAL", g.DECIMAL),
    ("INTEGER", g.INTEGER),
    ("BOOL", r"true|false"),
    ("NULL", r"null"),
    ("PUNCT", r"[][{}:,]"),
]
_SCANNER = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _TOKEN_SPEC), re.S)


def _tokenize(text: str):
    pos, out = 0, []
    while pos < len(text):
        m = _SCANNER.match(text, pos)
        if m is None:
            raise RDFParseError(f"bad CDT literal at {text[pos:pos+20]!r}")
        if m.lastgroup != "WS":
            out.append((m.lastgroup, m.group(0)))
        pos = m.end()
    out.append(("EOF", ""))
    return out


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, ch):
        k, v = self.next()
        if (k, v) != ("PUNCT", ch):
            raise RDFParseError(f"CDT: expected {ch!r}, got {v!r}")

    def value(self):
        k, v = self.peek()
        if (k, v) == ("PUNCT", "["):
            return self.list_()
        if (k, v) == ("PUNCT", "{"):
            return self.map_()
        self.next()
        if k == "IRIREF":
            return (KIND_IRI, unescape_iri(v[1:-1]), "", "")
        if k in ("STRING2", "STRING1"):
            lex = unescape_string(v[1:-1])
            nk, nv = self.peek()
            if nk == "LANGTAG":
                self.next()
                return (KIND_LITERAL, lex, RDF_LANGSTRING, nv[1:])
            if nk == "DTYPE":
                self.next()
                dk, dv = self.next()
                if dk != "IRIREF":
                    raise RDFParseError("CDT: datatype must be an IRI")
                return (KIND_LITERAL, lex, unescape_iri(dv[1:-1]), "")
            return (KIND_LITERAL, lex, XSD_STRING, "")
        if k == "INTEGER":
            return (KIND_LITERAL, v, XSD_NS + "integer", "")
        if k == "DECIMAL":
            return (KIND_LITERAL, v, XSD_NS + "decimal", "")
        if k == "DOUBLE":
            return (KIND_LITERAL, v, XSD_NS + "double", "")
        if k == "BOOL":
            return (KIND_LITERAL, v, XSD_NS + "boolean", "")
        if k == "NULL":
            return None
        raise RDFParseError(f"CDT: unexpected token {v!r}")

    def list_(self):
        self.expect("[")
        out = []
        if self.peek() == ("PUNCT", "]"):
            self.next()
            return out
        while True:
            out.append(self.value())
            k, v = self.next()
            if (k, v) == ("PUNCT", "]"):
                return out
            if (k, v) != ("PUNCT", ","):
                raise RDFParseError(f"CDT list: expected ',' or ']', got {v!r}")

    def map_(self):
        self.expect("{")
        out = {}
        if self.peek() == ("PUNCT", "}"):
            self.next()
            return out
        while True:
            key = self.value()
            if key is None or isinstance(key, (list, dict)):
                raise RDFParseError("CDT map: key must be an atomic term")
            self.expect(":")
            out[key] = self.value()
            k, v = self.next()
            if (k, v) == ("PUNCT", "}"):
                return out
            if (k, v) != ("PUNCT", ","):
                raise RDFParseError(f"CDT map: expected ',' or '}}', got {v!r}")


def parse_cdt_list(lex: str):
    p = _P(_tokenize(lex))
    out = p.list_()
    if p.peek()[0] != "EOF":
        raise RDFParseError("CDT: trailing content after list")
    return out


def parse_cdt_map(lex: str):
    p = _P(_tokenize(lex))
    out = p.map_()
    if p.peek()[0] != "EOF":
        raise RDFParseError("CDT: trailing content after map")
    return out


def _fmt_term(t) -> str:
    if t is None:
        return "null"
    if isinstance(t, list):
        return format_cdt_list(t)
    if isinstance(t, dict):
        return format_cdt_map(t)
    kind, lex, dt, lang = t
    if kind == KIND_IRI:
        return f"<{lex}>"
    if kind == KIND_BNODE:
        return f"_:{lex}"
    if dt in (XSD_NS + "integer", XSD_NS + "decimal", XSD_NS + "double",
              XSD_NS + "boolean") and lex:
        return lex  # shorthand form is canonical
    body = '"' + escape_string(lex) + '"'
    if lang:
        return body + "@" + lang
    if dt and dt != XSD_STRING:
        return body + f"^^<{dt}>"
    return body


def format_cdt_list(values) -> str:
    return "[" + ", ".join(_fmt_term(v) for v in values) + "]"


def format_cdt_map(mapping) -> str:
    # canonical: entries sorted by formatted key (maps are unordered)
    items = sorted(((_fmt_term(k), v) for k, v in mapping.items()))
    return "{" + ", ".join(f"{k}: {_fmt_term(v)}" for k, v in items) + "}"


def canonical_cdt(lex: str, datatype: str) -> str:
    """Canonical lexical form (parse → stable re-serialization)."""
    if datatype == CDT_LIST:
        return format_cdt_list(parse_cdt_list(lex))
    if datatype == CDT_MAP:
        return format_cdt_map(parse_cdt_map(lex))
    return lex


# --- core functions (cdt:concat / cdt:size / cdt:get analogs) --------------


def cdt_concat(*lexes: str) -> str:
    out = []
    for lex in lexes:
        out.extend(parse_cdt_list(lex))
    return format_cdt_list(out)


def cdt_size(lex: str, datatype: str = CDT_LIST) -> int:
    if datatype == CDT_MAP:
        return len(parse_cdt_map(lex))
    return len(parse_cdt_list(lex))


def cdt_get(lex: str, index_or_key, datatype: str = CDT_LIST):
    if datatype == CDT_MAP:
        return parse_cdt_map(lex).get(index_or_key)
    values = parse_cdt_list(lex)
    i = int(index_or_key)
    if not 1 <= i <= len(values):  # 1-based per the CDT spec
        raise RDFParseError(f"cdt:get index {i} out of range")
    return values[i - 1]


def register(datatype_registry) -> None:
    """Hook into the canonicalization surface (TypeMapper analog)."""
    from ..functions.registry import DatatypeEntry

    datatype_registry.register(
        DatatypeEntry(
            iri=CDT_LIST,
            parse=parse_cdt_list,
            canonical=lambda lex: canonical_cdt(lex, CDT_LIST),
            value_key=lambda lex: "cdtl:" + canonical_cdt(lex, CDT_LIST),
        )
    )
    datatype_registry.register(
        DatatypeEntry(
            iri=CDT_MAP,
            parse=parse_cdt_map,
            canonical=lambda lex: canonical_cdt(lex, CDT_MAP),
            value_key=lambda lex: "cdtm:" + canonical_cdt(lex, CDT_MAP),
        )
    )
