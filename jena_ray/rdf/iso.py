"""Graph / dataset isomorphism up to blank-node bijection.

The W3C eval tests compare the parsed graph against a golden N-Triples /
N-Quads file by bnode-bijection isomorphism; the reference implements this
as a backtracking matcher (sparql/util/IsoMatcher.java:50-97 →
sparql/util/iso/IsoAlgTuple.java:45-206). Same approach here with
signature pruning — worst-case exponential, fine at test sizes.

Tuples are (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang[, g]); the graph
name g is "" for the default graph, "_:label" for a blank-node graph, else
an IRI. One bijection spans all positions (subject, object, graph name).
"""

from __future__ import annotations

import re
from collections import Counter

from ..model import KIND_BNODE, KIND_TRIPLE_TERM
from . import grammar as g_

_G_BNODE = "\x00gb:"  # internal marker for bnode graph labels

# --- structured triple terms (RDF 1.2) -------------------------------------
# A KIND_TRIPLE_TERM object's o_lex is a serialized inner triple; bnode
# labels inside participate in the SAME bijection as top-level bnodes, so
# the serialized form is parsed into a nested structure for matching.

_TWS = re.compile(r"[ \t]*")
_TIRI = re.compile(g_.IRIREF)
_TBN = re.compile(r"_:[^ \t)]+")
_TLIT = re.compile(
    g_.STRING_LITERAL_QUOTE + r"(?:\^\^" + g_.IRIREF + "|" + g_.LANGTAG + ")?"
)


def _tt_term(s: str, pos: int):
    pos = _TWS.match(s, pos).end()
    if s.startswith("<<(", pos):
        pos += 3
        t1, pos = _tt_term(s, pos)
        t2, pos = _tt_term(s, pos)
        t3, pos = _tt_term(s, pos)
        pos = _TWS.match(s, pos).end()
        if not s.startswith(")>>", pos):
            raise ValueError("bad tt")
        return ("T", t1, t2, t3), pos + 3
    m = _TIRI.match(s, pos)
    if m:
        return ("I", m.group(0)), m.end()
    m = _TBN.match(s, pos)
    if m:
        return ("B", m.group(0)[2:]), m.end()
    m = _TLIT.match(s, pos)
    if m:
        return ("L", m.group(0)), m.end()
    raise ValueError(f"bad tt term at {s[pos:pos+20]!r}")


def _tt_struct(inner: str):
    try:
        t1, pos = _tt_term(inner, 0)
        t2, pos = _tt_term(inner, pos)
        t3, pos = _tt_term(inner, pos)
        return ("T", t1, t2, t3)
    except ValueError:
        return ("L", inner)  # unparseable: compare verbatim


def remap_triple_term_bnodes(inner: str, mapper) -> str:
    """Rewrite every ``_:label`` inside a serialized triple term through
    ``mapper(label) -> new_label``, preserving all other tokens verbatim.
    Used by readers to keep doc-scoped bnode relabeling consistent between
    asserted triples and the reified terms that reference the same nodes
    (reference: riot LabelToNode applies to ALL node positions).
    Unparseable input is returned unchanged."""
    st = _tt_struct(inner)
    if st[0] != "T":
        return inner

    def ser(t):
        if t[0] == "T":
            return "<<( " + " ".join(ser(x) for x in t[1:]) + " )>>"
        if t[0] == "B":
            return "_:" + mapper(t[1])
        return t[1]

    return " ".join(ser(x) for x in st[1:])


def _struct_bnodes(st):
    if st[0] == "B":
        yield st[1]
    elif st[0] == "T":
        for sub in st[1:]:
            yield from _struct_bnodes(sub)


def _struct_apply(st, m: dict):
    if st[0] == "B":
        lab = m.get(st[1])
        return None if lab is None else ("B", lab)
    if st[0] == "T":
        subs = [_struct_apply(s, m) for s in st[1:]]
        if any(s is None for s in subs):
            return None
        return ("T", *subs)
    return st


def _norm(t: tuple) -> tuple:
    """(s_kind, s_lex, p, o_kind, o_lex_or_struct, o_dt, o_lang, g_norm)."""
    g = t[7] if len(t) > 7 else ""
    if g.startswith("_:"):
        g = _G_BNODE + g[2:]
    o_lex = t[4]
    if t[3] == KIND_TRIPLE_TERM:
        o_lex = _tt_struct(o_lex)
    return (t[0], t[1], t[2], t[3], o_lex, t[5], t[6], g)


def _bnodes_of(t: tuple):
    if t[0] == KIND_BNODE:
        yield t[1]
    if t[3] == KIND_BNODE:
        yield t[4]
    elif t[3] == KIND_TRIPLE_TERM:
        yield from _struct_bnodes(t[4])
    if t[7].startswith(_G_BNODE):
        yield t[7][len(_G_BNODE):]


def _has_bnode(t: tuple) -> bool:
    return any(True for _ in _bnodes_of(t))


def _signature(triples: list[tuple], label: str) -> Counter:
    sig: Counter = Counter()
    for t in triples:
        o_has_bn = (
            t[3] == KIND_BNODE
            or (t[3] == KIND_TRIPLE_TERM and any(True for _ in _struct_bnodes(t[4])))
        )
        if t[0] == KIND_BNODE and t[1] == label:
            other = ("B",) if o_has_bn else (t[3], t[4], t[5], t[6])
            sig[("S", t[2], other)] += 1
        if t[3] == KIND_BNODE and t[4] == label:
            other = ("B",) if t[0] == KIND_BNODE else t[:2]
            sig[("O", t[2], other)] += 1
        if t[3] == KIND_TRIPLE_TERM and label in set(_struct_bnodes(t[4])):
            sig[("TT", t[2])] += 1
        if t[7] == _G_BNODE + label:
            sig[("G", t[2])] += 1
    return sig


def _apply(t: tuple, m: dict) -> tuple | None:
    s_lex, o_lex, g = t[1], t[4], t[7]
    if t[0] == KIND_BNODE:
        s_lex = m.get(s_lex)
        if s_lex is None:
            return None
    if t[3] == KIND_BNODE:
        o_lex = m.get(o_lex)
        if o_lex is None:
            return None
    elif t[3] == KIND_TRIPLE_TERM:
        o_lex = _struct_apply(o_lex, m)
        if o_lex is None:
            return None
    if g.startswith(_G_BNODE):
        lab = m.get(g[len(_G_BNODE):])
        if lab is None:
            return None
        g = _G_BNODE + lab
    return (t[0], s_lex, t[2], t[3], o_lex, t[5], t[6], g)


def graph_iso(a: list[tuple], b: list[tuple]) -> bool:
    a = list(set(_norm(t) for t in a))
    b = list(set(_norm(t) for t in b))
    if len(a) != len(b):
        return False

    ground_a = Counter(t for t in a if not _has_bnode(t))
    ground_b = Counter(t for t in b if not _has_bnode(t))
    if ground_a != ground_b:
        return False
    rest_a = [t for t in a if _has_bnode(t)]
    rest_b = [t for t in b if _has_bnode(t)]
    if len(rest_a) != len(rest_b):
        return False
    if not rest_a:
        return True

    bn_a = sorted({l for t in rest_a for l in _bnodes_of(t)})
    bn_b = sorted({l for t in rest_b for l in _bnodes_of(t)})
    if len(bn_a) != len(bn_b):
        return False

    sig_a = {l: _signature(rest_a, l) for l in bn_a}
    sig_b = {l: _signature(rest_b, l) for l in bn_b}
    candidates = {la: [lb for lb in bn_b if sig_b[lb] == sig_a[la]] for la in bn_a}
    if any(not c for c in candidates.values()):
        return False

    order = sorted(bn_a, key=lambda l: len(candidates[l]))
    set_b = set(rest_b)

    def backtrack(i: int, m: dict, used: set) -> bool:
        if i == len(order):
            return Counter(_apply(t, m) for t in rest_a) == Counter(rest_b)
        la = order[i]
        for lb in candidates[la]:
            if lb in used:
                continue
            m[la] = lb
            used.add(lb)
            ok = True
            for t in rest_a:
                labs = list(_bnodes_of(t))
                if labs and all(l in m for l in labs):
                    if _apply(t, m) not in set_b:
                        ok = False
                        break
            if ok and backtrack(i + 1, m, used):
                return True
            del m[la]
            used.discard(lb)
        return False

    return backtrack(0, {}, set())
