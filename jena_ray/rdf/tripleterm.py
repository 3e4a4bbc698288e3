"""RDF 1.2 triple-term value operations over the engine's serialized
form (KIND_TRIPLE_TERM rows carry the inner triple as a space-joined
N-Triples term string in the lex column, e.g. ``<s> <p> "1"^^<dt>``).

Reference semantics: jena-core graph/Node_Triple.java (term identity),
jena-arq expr/NodeValue.java sameValueAs/compare extended to triple
terms per SPARQL 1.2 §17.4.1.7-1.9 — `=` is component-wise VALUE
equality, `<` compares the first unequal component in an ordered value
space (type error otherwise), and ORDER BY sorts triple terms after
all literals, component-wise (s, p, o) with the BindingComparator
term order inside each component.

All functions here are scalar (one term pair per call); the callers
gate them behind a kind==KIND_TRIPLE_TERM mask so only triple-term
rows pay the python cost (same pattern as rdf/cdt.py structural ops).
"""

from __future__ import annotations

import struct

from ..model import (KIND_BNODE, KIND_IRI, KIND_LITERAL, KIND_TRIPLE_TERM,
                     RDFParseError, XSD_NS, XSD_STRING)
from .cdt import _elem_same
from .ntriples import _parse_term12, _skip_ws, format_term_raw

_NUM_DTS = {XSD_NS + s for s in (
    "integer", "decimal", "double", "float", "int", "long", "short",
    "byte", "nonNegativeInteger", "positiveInteger", "negativeInteger",
    "nonPositiveInteger", "unsignedInt", "unsignedLong", "unsignedShort",
    "unsignedByte")}


import re as _re

# the engine's internal bnode labels (fresh-label '!aN', doc scopes
# 'file.ttl#label') are serialized VERBATIM into triple-term lexicals
# (format_term_raw keeps label identity for isomorphism); accept any
# non-whitespace label here — strictness belongs to the file parsers
_LOOSE_BNODE = _re.compile(r"_:(\S+)")


def _comp(lex: str, pos: int, position: str):
    pos = _skip_ws(lex, pos)
    if lex.startswith("<<(", pos):
        if position != "object":
            raise RDFParseError("triple term only allowed in object position")
        start = pos + 3
        _, p2 = _comp(lex, start, "subject")
        _, p2 = _comp(lex, p2, "predicate")
        _, p2 = _comp(lex, p2, "object")
        p2 = _skip_ws(lex, p2)
        if not lex.startswith(")>>", p2):
            raise RDFParseError(f"unterminated triple term in {lex!r}")
        return (KIND_TRIPLE_TERM, lex[start:p2].strip(), "", ""), p2 + 3
    if lex.startswith("_:", pos):
        if position == "predicate":
            raise RDFParseError("bnode predicate in triple term")
        m = _LOOSE_BNODE.match(lex, pos)
        return (KIND_BNODE, m.group(1), "", ""), m.end()
    return _parse_term12(lex, pos, position)


def parse_tt(lex: str):
    """Serialized inner triple → ((s_kind, s_lex, '', ''),
    (KIND_IRI, p, '', ''), (o_kind, o_lex, o_dt, o_lang)). Raises
    RDFParseError on malformed input."""
    s, pos = _comp(lex, 0, "subject")
    p, pos = _comp(lex, pos, "predicate")
    o, pos = _comp(lex, pos, "object")
    if lex[_skip_ws(lex, pos):]:
        raise RDFParseError(f"trailing content in triple term: {lex!r}")
    return s, p, o


def scope_tt_bnodes(lex: str, scope: str) -> str:
    """Prefix every blank-node label inside a serialized triple term
    with a document scope (the same label scoping the harness applies
    to top-level bnode columns) — canonical re-serialization."""
    s, p, o = parse_tt(lex)

    def f(c):
        if c[0] == KIND_BNODE:
            return (KIND_BNODE, scope + c[1], c[2], c[3])
        if c[0] == KIND_TRIPLE_TERM:
            return (KIND_TRIPLE_TERM, scope_tt_bnodes(c[1], scope), "", "")
        return c

    return serialize_tt(f(s), p, f(o))


def serialize_tt(s, p, o) -> str:
    """Component term tuples → the engine's serialized inner form
    (inverse of parse_tt; matches rdf/turtle._triple_term)."""
    return " ".join((format_term_raw(s[0], s[1], "", ""),
                     format_term_raw(KIND_IRI, p[1], "", ""),
                     format_term_raw(o[0], o[1], o[2], o[3])))


def _norm(e):
    """The serializer writes plain literals bare and the parser reads
    them back as xsd:string — fold to the cdt comparator's plain
    convention so value semantics line up."""
    if e[0] == KIND_LITERAL and e[2] == XSD_STRING and not e[3]:
        return (e[0], e[1], "", "")
    return e


def _comp_same(a, b) -> bool:
    """sameValueAs for one component pair; raises ValueError when the
    answer is unknown (distinct bnode labels / unknown datatypes)."""
    if a[0] == KIND_TRIPLE_TERM or b[0] == KIND_TRIPLE_TERM:
        if a[0] != b[0]:
            return False
        return tt_same_value(a[1], b[1])
    return _elem_same(_norm(a), _norm(b))


def tt_same_value(lex1: str, lex2: str) -> bool:
    """`=` on two triple terms: component-wise value equality
    (SPARQL 1.2: TRIPLE terms are equal iff subjects, predicates and
    objects are pairwise equal). Raises ValueError when unknown."""
    if lex1 == lex2:
        return True
    s1, p1, o1 = parse_tt(lex1)
    s2, p2, o2 = parse_tt(lex2)
    return (_comp_same(s1, s2) and p1[1] == p2[1]
            and _comp_same(o1, o2))


def _lit_cmp_op(a, b) -> int:
    """Operator `<` on two literal components — only where SPARQL
    defines an order (numeric, string, boolean, dateTime); raises
    ValueError otherwise."""
    _, l1, d1, g1 = a
    _, l2, d2, g2 = b
    if g1 or g2:
        raise ValueError("lang-tagged literals have no operator order")
    n1, n2 = d1 in _NUM_DTS, d2 in _NUM_DTS
    if n1 and n2:
        v1, v2 = float(l1), float(l2)
        return (v1 > v2) - (v1 < v2)
    if d1 in ("", XSD_STRING) and d2 in ("", XSD_STRING):
        return (l1 > l2) - (l1 < l2)
    if d1 == d2 == XSD_NS + "boolean":
        v1, v2 = l1 in ("true", "1"), l2 in ("true", "1")
        return (v1 > v2) - (v1 < v2)
    if d1 == d2 and d1 in (XSD_NS + "dateTime", XSD_NS + "date"):
        from .literals import canonical_lexical

        c1 = canonical_lexical(l1, d1)
        c2 = canonical_lexical(l2, d2)
        return (c1 > c2) - (c1 < c2)
    raise ValueError("no common ordered value space")


def _comp_cmp_op(a, b) -> int:
    if _comp_same(a, b):
        return 0
    if a[0] == KIND_TRIPLE_TERM and b[0] == KIND_TRIPLE_TERM:
        return tt_compare_op(a[1], b[1])
    if a[0] == KIND_LITERAL and b[0] == KIND_LITERAL:
        return _lit_cmp_op(a, b)
    raise ValueError("incomparable components")


def tt_compare_op(lex1: str, lex2: str) -> int:
    """Operator `<` / `>` on two triple terms: the first component
    pair that is not value-equal decides, and must itself be
    operator-orderable; raises ValueError otherwise (type error)."""
    s1, p1, o1 = parse_tt(lex1)
    s2, p2, o2 = parse_tt(lex2)
    c = _comp_cmp_op(s1, s2)
    if c:
        return c
    if p1[1] != p2[1]:
        raise ValueError("IRI predicates have no operator order")
    return _comp_cmp_op(o1, o2)


def _numenc(f: float) -> str:
    bits = struct.unpack(">Q", struct.pack(">d", f))[0]
    if bits & (1 << 63):
        bits ^= 0xFFFFFFFFFFFFFFFF
    else:
        bits |= 1 << 63
    return format(bits, "016x")


def _enc_component(e) -> str:
    """Order-preserving encode of one component under the ORDER BY
    term order (BindingComparator: bnode < IRI < literal(numeric by
    value < other by lexical) < triple term)."""
    k, lx, dt, lg = e
    if k == KIND_BNODE:
        return "\x03" + lx + "\x00"
    if k == KIND_IRI:
        return "\x04" + lx + "\x00"
    if k == KIND_TRIPLE_TERM:
        return "\x06" + tt_sort_key(lx) + "\x00"
    if dt in _NUM_DTS:
        try:
            return "\x05\x01" + _numenc(float(lx))
        except ValueError:
            pass
    return "\x05\x02" + lx + "\x00"


def tt_sort_key(lex: str) -> str:
    """Total-order SORT KEY for ORDER BY: bytewise key order follows
    the component-wise (s, p, o) comparison; the raw lexical appended
    after a separator is the deterministic tie-break."""
    s, p, o = parse_tt(lex)
    return (_enc_component(s) + _enc_component((KIND_IRI, p[1], "", ""))
            + _enc_component(o) + "\x02" + lex)


__all__ = ["parse_tt", "serialize_tt", "tt_same_value", "tt_compare_op",
           "tt_sort_key"]
