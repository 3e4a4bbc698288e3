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
    ("BNODE", g.BLANK_NODE_LABEL),
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
        if k == "BNODE":
            return (KIND_BNODE, v[2:], "", "")
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


_NUM_DTS = {XSD_NS + s for s in (
    "integer", "decimal", "double", "float", "int", "long", "short",
    "byte", "nonNegativeInteger", "positiveInteger",
    "nonPositiveInteger", "negativeInteger", "unsignedLong",
    "unsignedInt", "unsignedShort", "unsignedByte")}


def _elem_cmp(e1, e2) -> int:
    """Element comparison for the CDT less-than semantics
    (NodeValue.compare + sameValueAs fallback inside
    CompositeDatatypeList.compare, sortOrderingCompare=false):
    -1/0/1, raising ValueError when the pair is not comparable."""
    e1, e2 = _norm_composite(e1), _norm_composite(e2)
    if e1 is None and e2 is None:
        return 0  # null vs null: advance
    if e1 is None or e2 is None:
        raise ValueError("null is not comparable to a value")
    if isinstance(e1, list) and isinstance(e2, list):
        return _list_cmp(e1, e2)
    if isinstance(e1, dict) and isinstance(e2, dict):
        return _map_cmp(e1, e2)
    if isinstance(e1, (list, dict)) or isinstance(e2, (list, dict)):
        raise ValueError("composite vs non-composite")
    k1, l1, d1, g1 = e1
    k2, l2, d2, g2 = e2
    if k1 == KIND_BNODE or k2 == KIND_BNODE:
        raise ValueError("blank nodes in lists cannot be compared")
    if k1 == KIND_IRI or k2 == KIND_IRI:
        if k1 == k2 and l1 == l2:
            return 0  # same IRI (sameValueAs) → advance
        raise ValueError("IRIs have no < order")
    num1 = d1 in _NUM_DTS
    num2 = d2 in _NUM_DTS
    if num1 and num2:
        f1, f2 = float(l1), float(l2)
        return (f1 > f2) - (f1 < f2)
    if d1 == XSD_NS + "boolean" and d2 == XSD_NS + "boolean":
        b1, b2 = l1 in ("true", "1"), l2 in ("true", "1")
        return (b1 > b2) - (b1 < b2)
    s1 = d1 in ("", XSD_STRING) and not g1
    s2 = d2 in ("", XSD_STRING) and not g2
    if s1 and s2:
        return (l1 > l2) - (l1 < l2)
    if g1 and g2:  # lang literals: same tag → lexical order
        if g1.lower() == g2.lower():
            return (l1 > l2) - (l1 < l2)
        raise ValueError("different language tags")
    # incomparable value spaces: sameValueAs fallback (identical term
    # → advance), else error
    if (k1, l1, d1, (g1 or "").lower()) == (k2, l2, d2, (g2 or "").lower()):
        return 0
    raise ValueError("not comparable")


def _list_cmp(v1: list, v2: list) -> int:
    if not v1 or not v2:
        if v1:
            return 1
        if v2:
            return -1
        return 0
    for a, b in zip(v1, v2):
        c = _elem_cmp(a, b)
        if c:
            return c
    return (len(v1) > len(v2)) - (len(v1) < len(v2))


def _key_sort_key(k):
    """CDTKeySorter: IRIs first (by IRI), then literals by (datatype,
    lexical, lang); plain literals sort as xsd:string."""
    kind, lex, dt, lang = k
    if kind == KIND_IRI:
        return (0, lex, "", "")
    if not dt and not lang:
        dt = XSD_STRING
    if lang:
        dt = RDF_LANGSTRING
    return (1, dt, lex, lang or "")


def _map_cmp(m1: dict, m2: dict) -> int:
    if not m1 or not m2:
        if m1:
            return 1
        if m2:
            return -1
        return 0
    ks1 = sorted(m1, key=_key_sort_key)
    ks2 = sorted(m2, key=_key_sort_key)
    for k1, k2 in zip(ks1, ks2):
        s1, s2 = _key_sort_key(k1), _key_sort_key(k2)
        if s1 != s2:
            return -1 if s1 < s2 else 1
        c = _elem_cmp(m1[k1], m2[k2])
        if c:
            return c
    return (len(m1) > len(m2)) - (len(m1) < len(m2))


def _norm_composite(e):
    """A literal term typed cdt:List / cdt:Map IS the composite value
    (nested literals given in lexical form, e.g. '[2]'^^cdt:List)."""
    if isinstance(e, tuple) and e[0] == KIND_LITERAL:
        if e[2] == CDT_LIST:
            return parse_cdt_list(e[1])
        if e[2] == CDT_MAP:
            return parse_cdt_map(e[1])
    return e


def _elem_same(e1, e2) -> bool:
    """sameValueAs for CDT elements: True / False, raising ValueError
    when unknown (e.g. distinct blank-node labels)."""
    e1, e2 = _norm_composite(e1), _norm_composite(e2)
    if e1 is None and e2 is None:
        return True
    if e1 is None or e2 is None:
        return False
    if isinstance(e1, list) and isinstance(e2, list):
        return _list_same(e1, e2)
    if isinstance(e1, dict) and isinstance(e2, dict):
        return _map_same(e1, e2)
    if isinstance(e1, (list, dict)) or isinstance(e2, (list, dict)):
        return False
    k1, l1, d1, g1 = e1
    k2, l2, d2, g2 = e2
    if k1 == KIND_BNODE or k2 == KIND_BNODE:
        if k1 != k2:
            return False  # a bnode is never the same value as a non-bnode
        if l1 == l2:
            return True  # same label within the compared literals
        raise ValueError("distinct blank nodes: unknown")
    if k1 != k2:
        return False
    if k1 == KIND_IRI:
        return l1 == l2
    num1, num2 = d1 in _NUM_DTS, d2 in _NUM_DTS
    if num1 and num2:
        return float(l1) == float(l2)
    if num1 != num2:
        return False
    if g1 or g2:
        return (g1 or "").lower() == (g2 or "").lower() and l1 == l2
    dd1 = "" if d1 == XSD_STRING else d1
    dd2 = "" if d2 == XSD_STRING else d2
    if dd1 != dd2:
        return False
    if dd1 == "":
        return l1 == l2
    if d1 == XSD_NS + "boolean":
        return (l1 in ("true", "1")) == (l2 in ("true", "1"))
    # unknown datatype: identical term → same, else unknown
    if l1 == l2:
        return True
    raise ValueError("unknown datatype values")


def _list_same(v1: list, v2: list) -> bool:
    if len(v1) != len(v2):
        return False
    for a, b in zip(v1, v2):
        if not _elem_same(a, b):
            return False
    return True


def _map_same(m1: dict, m2: dict) -> bool:
    if len(m1) != len(m2):
        return False

    def tkey(k):
        kind, lex, dt, lang = k
        if kind == KIND_LITERAL and dt == XSD_STRING and not lang:
            dt = ""
        if lang:
            dt = RDF_LANGSTRING
        return (kind, lex, dt, (lang or "").lower())

    i2 = {tkey(k): v for k, v in m2.items()}
    for k, v in m1.items():
        kk = tkey(k)
        if kk not in i2:
            return False  # map keys are TERM-identified
        if not _elem_same(v, i2[kk]):
            return False
    return True


def cdt_same_value(lex1: str, lex2: str, datatype: str) -> bool:
    """Value-space equality of two CDT literals (sameValueAs:
    element-wise for lists, term-keyed entry-wise for maps); raises
    when the answer is unknown (distinct blank nodes / unknown
    datatypes) or a lexical is ill-formed."""
    if datatype == CDT_MAP:
        return _map_same(parse_cdt_map(lex1), parse_cdt_map(lex2))
    return _list_same(parse_cdt_list(lex1), parse_cdt_list(lex2))


def cdt_compare(lex1: str, lex2: str, datatype: str) -> int:
    """-1/0/1 per the CDT less-than semantics
    (CompositeDatatypeList.compare / CompositeDatatypeMap.compare with
    sortOrderingCompare=false). Raises when the pair is not comparable
    or a lexical is ill-formed (→ SPARQL type error)."""
    if datatype == CDT_MAP:
        return _map_cmp(parse_cdt_map(lex1), parse_cdt_map(lex2))
    return _list_cmp(parse_cdt_list(lex1), parse_cdt_list(lex2))


def scope_cdt_bnodes(lex: str, datatype: str, scope: str) -> str:
    """Rewrite blank-node labels INSIDE a CDT literal's lexical form
    with a document/query scope prefix (the fork's Turtle/SPARQL
    parsers resolve ``_:b`` inside cdt:List/cdt:Map lexicals against
    the SAME label map as graph bnodes — labels are document-scoped,
    so two files' ``_:b`` are different bnodes; bnodes-turtle-15..19).
    Returns the canonical lexical of the rewritten value; ill-formed
    lexicals are returned unchanged (they stay type errors)."""

    def walk(e):
        if e is None:
            return None
        if isinstance(e, list):
            return [walk(x) for x in e]
        if isinstance(e, dict):
            return {k: walk(v) for k, v in e.items()}
        k, lx, dt, lg = e
        if k == KIND_BNODE:
            return (k, scope + lx, dt, lg)
        if dt == CDT_LIST:
            return (k, scope_cdt_bnodes(lx, CDT_LIST, scope), dt, lg)
        if dt == CDT_MAP:
            return (k, scope_cdt_bnodes(lx, CDT_MAP, scope), dt, lg)
        return e

    if "_:" not in lex:
        return lex
    try:
        if datatype == CDT_MAP:
            return format_cdt_map(
                {k: walk(v) for k, v in parse_cdt_map(lex).items()})
        return format_cdt_list([walk(e) for e in parse_cdt_list(lex)])
    except ValueError:
        return lex


def cdt_sort_key(lex: str, datatype: str) -> str:
    """Order-preserving SORT KEY for a CDT literal under the ORDER BY
    semantics (CompositeDatatypeList/Map.compare with
    sortOrderingCompare=true): bytewise key order == the comparator's
    order for the cases it defines. Encoding per element class
    (null < bnode < IRI < numeric < boolean < string < lang-tagged <
    other-typed < nested list < nested map), element-wise
    concatenation with a low terminator (prefix lists sort first — the
    size rule), and the canonical LEXICAL form appended after the
    terminator (the comparator's equal-elements tie-break). Mixed
    literal value spaces get a deterministic class order where jena
    reports CMP_INDETERMINATE — a sort resolves those arbitrarily
    anyway. Ill-formed lexicals raise (type error, same as
    cdt_compare)."""
    import struct

    from ..model import KIND_BNODE, KIND_IRI, XSD_NS, XSD_STRING

    def numenc(f: float) -> str:
        bits = struct.unpack(">Q", struct.pack(">d", f))[0]
        if bits & (1 << 63):
            bits ^= 0xFFFFFFFFFFFFFFFF
        else:
            bits |= 1 << 63
        return format(bits, "016x")

    def enc_term(e) -> str:
        if e is None:
            return "\x03"
        if isinstance(e, list):
            return "\x0b" + enc_list(e)
        if isinstance(e, dict):
            return "\x0c" + enc_map(e)
        k, lx, dt, lg = e
        if k == KIND_BNODE:
            return "\x04" + lx + "\x00"
        if k == KIND_IRI:
            return "\x05" + lx + "\x00"
        if dt == CDT_LIST:
            return "\x0b" + enc_list(parse_cdt_list(lx))
        if dt == CDT_MAP:
            return "\x0c" + enc_map(parse_cdt_map(lx))
        if dt in _NUM_DTS:
            try:
                return "\x06" + numenc(float(lx))
            except ValueError:
                pass
        if dt == XSD_NS + "boolean":
            return "\x07" + ("1" if lx in ("true", "1") else "0")
        if not lg and dt in ("", XSD_STRING):
            return "\x08" + lx + "\x00"
        if lg:
            return "\x09" + lg.lower() + "\x00" + lx + "\x00"
        return "\x0a" + dt + "\x00" + lx + "\x00"

    def enc_key(kk) -> str:
        # mirrors _key_sort_key's (CDTKeySorter) component order
        knd, dt_or_lex, lx2, lg2 = _key_sort_key(kk)
        if knd == 0:
            return "\x03" + dt_or_lex + "\x00"
        return ("\x04" + dt_or_lex + "\x00" + lx2 + "\x00"
                + lg2 + "\x00")

    def enc_list(v: list) -> str:
        return "".join(enc_term(e) for e in v) + "\x01"

    def enc_map(m: dict) -> str:
        parts = []
        for kk in sorted(m, key=_key_sort_key):
            parts.append(enc_key(kk) + enc_term(m[kk]))
        return "".join(parts) + "\x01"

    if datatype == CDT_MAP:
        return enc_map(parse_cdt_map(lex)) + "\x02" + lex
    return enc_list(parse_cdt_list(lex)) + "\x02" + lex


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
