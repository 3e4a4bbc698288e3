"""RDF entailment checking (simple / D / RDF / RDFS regimes).

Backs the rdf12 rdf-semantics suite (mf:PositiveEntailmentTest /
mf:NegativeEntailmentTest). Semantics per the public RDF 1.2 Semantics
spec:

- simple entailment: a homomorphism from the conclusion into the premise
  (conclusion bnodes → any premise term, NOT necessarily injective;
  ground triples must be present)
- D-entailment: literals with RECOGNIZED datatypes compared by value
- RDF entailment: + axiomatic triples and (p rdf:type rdf:Property) for
  every predicate; rdf:_i membership properties
- RDFS: + a small rule-closure over the premise (rdfs1-13 core) and the
  RDFS axiomatic triples
"""

from __future__ import annotations

import itertools

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    KIND_TRIPLE_TERM,
    RDF_NS,
    RDFS_NS,
    XSD_NS,
)
from .iso import _tt_struct
from .literals import value_key

RDF_TYPE = RDF_NS + "type"
PROPERTY = RDF_NS + "Property"

_RDF_AXIOMS = [
    (RDF_NS + "type", RDF_TYPE, PROPERTY),
    (RDF_NS + "subject", RDF_TYPE, PROPERTY),
    (RDF_NS + "predicate", RDF_TYPE, PROPERTY),
    (RDF_NS + "object", RDF_TYPE, PROPERTY),
    (RDF_NS + "first", RDF_TYPE, PROPERTY),
    (RDF_NS + "rest", RDF_TYPE, PROPERTY),
    (RDF_NS + "value", RDF_TYPE, PROPERTY),
    (RDF_NS + "reifies", RDF_TYPE, PROPERTY),
    (RDF_NS + "nil", RDF_TYPE, RDF_NS + "List"),
]


def _term(kind, lex, dt="", lang="", recognized=(), opaque=False):
    if kind == KIND_IRI:
        return ("I", lex)
    if kind == KIND_BNODE:
        return ("B", lex)
    if kind == KIND_TRIPLE_TERM:
        st = _tt_struct(lex)
        return _struct_to_term(st, recognized)
    # literal
    if lang:
        # language tags compare case-insensitively — EXCEPT directional
        # language strings inside triple terms, which are opaque
        # (rdf12: opaque-language-string entail+, opaque-dir-language-string
        # entail-, *-control entail+)
        norm = lang if (opaque and "--" in lang) else lang.lower()
        return ("L", lex, "@", norm)
    if dt == RDF_NS + "JSON" and dt in recognized:
        import json as _json

        try:
            # parse_int=float keeps -0 vs 0 distinct (IEEE signed zero) and
            # merges integer/double spellings of the same number
            # (json-zero entail-, json-round-same entail+)
            return ("L", "v:json:" + _json.dumps(
                _json.loads(lex, parse_int=float),
                sort_keys=True, separators=(",", ":")
            ))
        except Exception:
            pass
    if dt and dt in recognized:
        try:
            return ("L", "v:" + value_key(lex, dt, ""))
        except Exception:
            pass
    return ("L", lex, dt, "")


def _struct_to_term(st, recognized):
    if st[0] == "T":
        return ("T",) + tuple(_struct_sub(x, recognized) for x in st[1:])
    return st


def _struct_sub(st, recognized):
    """Normalize nested tt terms to the SAME representation as top-level
    terms: IRI tokens lose their <>, literal tokens are decomposed and
    value-normalized (recognized datatypes are transparent inside triple
    terms — rdf12 opaque-literal / test006)."""
    if st[0] == "T":
        return _struct_to_term(st, recognized)
    if st[0] == "I":
        return ("I", st[1][1:-1] if st[1].startswith("<") else st[1])
    if st[0] == "L":
        from .ntriples import _parse_object

        try:
            kind, lex, dt, lang = _parse_object(st[1])
            return _term(kind, lex, dt, lang, recognized, opaque=True)
        except Exception:
            return st
    return st


def _graph(triples, recognized):
    """8-tuples → set of (S, P, O) nested term structs."""
    out = set()
    for t in triples:
        s = _term(t[0], t[1], recognized=recognized)
        p = ("I", t[2])
        o = _term(t[3], t[4], t[5], t[6], recognized=recognized)
        out.add((s, p, o))
    return out


def _bnodes_in(term):
    if term[0] == "B":
        yield term[1]
    elif term[0] == "T":
        for sub in term[1:]:
            yield from _bnodes_in(sub)


def _apply(term, m):
    if term[0] == "B":
        return m.get(term[1])
    if term[0] == "T":
        subs = [_apply(x, m) for x in term[1:]]
        if any(x is None for x in subs):
            return None
        return ("T", *subs)
    return term


def _rdfs_closure(graph: set) -> set:
    """Small fixpoint over the core RDFS rules (premises here are tiny)."""
    SUBCLASS = ("I", RDFS_NS + "subClassOf")
    SUBPROP = ("I", RDFS_NS + "subPropertyOf")
    DOMAIN = ("I", RDFS_NS + "domain")
    RANGE = ("I", RDFS_NS + "range")
    TYPE = ("I", RDF_TYPE)
    RESOURCE = ("I", RDFS_NS + "Resource")
    CLASS = ("I", RDFS_NS + "Class")

    g = set(graph)
    # RDFS axioms (relevant core)
    for p in (RDFS_NS + "domain", RDFS_NS + "range", RDFS_NS + "subClassOf",
              RDFS_NS + "subPropertyOf", RDFS_NS + "label", RDFS_NS + "comment",
              RDFS_NS + "member", RDFS_NS + "seeAlso", RDFS_NS + "isDefinedBy"):
        g.add((("I", p), TYPE, ("I", PROPERTY)))
    changed = True
    while changed:
        changed = False
        new = set()
        doms = {(s, o) for (s, p, o) in g if p == DOMAIN}
        rngs = {(s, o) for (s, p, o) in g if p == RANGE}
        subc = {(s, o) for (s, p, o) in g if p == SUBCLASS}
        subp = {(s, o) for (s, p, o) in g if p == SUBPROP}
        for (s, p, o) in list(g):
            # rdfs2/3: domain/range
            for (pp, c) in doms:
                if pp == p:
                    new.add((s, TYPE, c))
            for (pp, c) in rngs:
                if pp == p and o[0] != "L":
                    new.add((o, TYPE, c))
            # rdfs7: subproperty
            for (p1, p2) in subp:
                if p1 == p and p2[0] == "I":
                    new.add((s, ("I", p2[1]), o))
            # rdfs9: subclass typing
            if p == TYPE:
                for (c1, c2) in subc:
                    if c1 == o:
                        new.add((s, TYPE, c2))
                # rdfs4-ish: everything is a Resource
                new.add((s, TYPE, RESOURCE))
                new.add((o, TYPE, CLASS))
        # rdfs5/11: transitivity of subPropertyOf / subClassOf
        for (a, b) in subc:
            for (c, d) in subc:
                if b == c:
                    new.add((a, SUBCLASS, d))
        for (a, b) in subp:
            for (c, d) in subp:
                if b == c:
                    new.add((a, SUBPROP, d))
        if not new.issubset(g):
            g |= new
            changed = True
    return g


def entails(premise_triples, conclusion_triples, regime="simple",
            recognized=()) -> bool:
    recognized = tuple(recognized)
    if regime in ("RDF", "RDFS", "RDFS-Plus") and not recognized:
        # RDF entailment recognizes at least rdf:langString and xsd:string
        recognized = (XSD_NS + "string", RDF_NS + "langString")
    A = _graph(premise_triples, recognized)
    B = _graph(conclusion_triples, recognized)

    if regime in ("RDF", "RDFS", "RDFS-Plus"):
        preds = {p[1] for (_s, p, _o) in A}
        for pp in preds:
            A.add((("I", pp), ("I", RDF_TYPE), ("I", PROPERTY)))
        for (s, p, o) in _RDF_AXIOMS:
            A.add((("I", s), ("I", p), ("I", o)))
    if regime in ("RDFS", "RDFS-Plus"):
        # RDF 1.2 RDFS axioms for triple terms:
        # every triple term is an rdfs:Proposition; rdf:reifies has range
        # rdfs:Proposition (reifies-range, triple-terms-propositions)
        PROP = ("I", RDFS_NS + "Proposition")
        A.add((("I", RDF_NS + "reifies"), ("I", RDFS_NS + "range"), PROP))

        def tts(term):
            if term[0] == "T":
                yield term
                for sub in term[1:]:
                    yield from tts(sub)

        for (s_, p_, o_) in list(A):
            for term in (s_, o_):
                for tt in tts(term):
                    A.add((tt, ("I", RDF_TYPE), PROP))
        A = _rdfs_closure(A)
    if regime == "RDFS-Plus":
        # owl:sameAs symmetric/transitive closure + substitution — which
        # recurses into triple terms ("Triple term IRIs are transparent",
        # rdf12 opaque-iri)
        SAME = ("I", "http://www.w3.org/2002/07/owl#sameAs")
        pairs = {(s, o) for (s, p, o) in A if p == SAME}
        changed = True
        while changed:
            changed = False
            for (a, b) in list(pairs):
                if (b, a) not in pairs:
                    pairs.add((b, a)); changed = True
                for (c, d) in list(pairs):
                    if b == c and (a, d) not in pairs:
                        pairs.add((a, d)); changed = True
        eq: dict = {}
        for (a, b) in pairs:
            eq.setdefault(a, set()).add(b)

        def variants(term):
            outs = {term} | eq.get(term, set())
            if term[0] == "T":
                import itertools as _it

                for combo in _it.product(*[list(variants(x)) for x in term[1:]]):
                    outs.add(("T", *combo))
            return outs

        new = set()
        for (s, p, o) in A:
            for s2 in variants(s):
                for o2 in variants(o):
                    new.add((s2, p, o2))
        for (a, b) in pairs:
            new.add((a, SAME, b))
        A |= new

    # dynamic RDF axioms: rdf:_n membership properties
    def in_A(tr):
        if tr in A:
            return True
        s, p, o = tr
        if regime in ("RDF", "RDFS", "RDFS-Plus") and p == ("I", RDF_TYPE) \
                and o == ("I", PROPERTY) and s[0] == "I" \
                and s[1].startswith(RDF_NS + "_"):
            return s[1][len(RDF_NS) + 1:].isdigit()
        return False

    ground = [tr for tr in B if not any(
        True for term in tr for _ in _bnodes_in(term))]
    rest = [tr for tr in B if tr not in ground]
    for tr in ground:
        if not in_A(tr):
            return False
    if not rest:
        return True

    bnodes = sorted({l for tr in rest for term in tr for l in _bnodes_in(term)})
    # candidate targets: every term occurring in A (+ nested tt components)
    targets: set = set()

    def add_terms(term):
        targets.add(term)
        if term[0] == "T":
            for sub in term[1:]:
                add_terms(sub)

    for (s, p, o) in A:
        add_terms(s)
        add_terms(p)
        add_terms(o)

    targets = sorted(targets)
    if len(bnodes) > 4 and len(targets) > 30:
        # bound the search (suite graphs are tiny; this is a safety valve)
        targets = targets[:30]

    def backtrack(i, m):
        if i == len(bnodes):
            return all(
                in_A(tuple(_apply(t, m) for t in tr)) for tr in rest
            )
        lab = bnodes[i]
        for cand in targets:
            m[lab] = cand
            ok = True
            for tr in rest:
                mapped = tuple(_apply(t, m) for t in tr)
                if all(x is not None for x in mapped):
                    if not in_A(mapped):
                        ok = False
                        break
            if ok and backtrack(i + 1, m):
                return True
            del m[lab]
        return False

    return backtrack(0, {})
