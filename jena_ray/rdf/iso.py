"""Graph isomorphism up to blank-node bijection.

The W3C eval tests compare the parsed graph against a golden N-Triples
graph by bnode-bijection isomorphism; the reference implements this as a
backtracking matcher (sparql/util/IsoMatcher.java:50-97 →
sparql/util/iso/IsoAlgTuple.java:45-206). Same approach here with
signature pruning — worst-case exponential, fine at test sizes.

Triples are 7/8-tuples (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang[, g]);
bnodes are (kind == KIND_BNODE) positions.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from ..model import KIND_BNODE


def _norm(t: tuple) -> tuple:
    return tuple(t[:7])


def _bnodes_of(t: tuple):
    if t[0] == KIND_BNODE:
        yield t[1]
    if t[3] == KIND_BNODE:
        yield t[4]


def _signature(triples: list[tuple], label: str) -> Counter:
    """Structure summary of one bnode: incident predicates/roles/ground terms."""
    sig: Counter = Counter()
    for t in triples:
        s_b = t[0] == KIND_BNODE and t[1] == label
        o_b = t[3] == KIND_BNODE and t[4] == label
        if s_b:
            other = ("B",) if t[3] == KIND_BNODE else t[3:7]
            sig[("S", t[2], other)] += 1
        if o_b:
            other = ("B",) if t[0] == KIND_BNODE else t[:2]
            sig[("O", t[2], other)] += 1
    return sig


def graph_iso(a: list[tuple], b: list[tuple]) -> bool:
    a = [_norm(t) for t in a]
    b = [_norm(t) for t in b]
    # set semantics (a Graph is a set of triples)
    a = list(set(a))
    b = list(set(b))
    if len(a) != len(b):
        return False

    def has_bnode(t):
        return t[0] == KIND_BNODE or t[3] == KIND_BNODE

    ground_a = Counter(t for t in a if not has_bnode(t))
    ground_b = Counter(t for t in b if not has_bnode(t))
    if ground_a != ground_b:
        return False
    rest_a = [t for t in a if has_bnode(t)]
    rest_b = [t for t in b if has_bnode(t)]
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
    candidates = {
        la: [lb for lb in bn_b if sig_b[lb] == sig_a[la]] for la in bn_a
    }
    if any(not c for c in candidates.values()):
        return False

    # order most-constrained-first
    order = sorted(bn_a, key=lambda l: len(candidates[l]))
    set_b = set(rest_b)
    by_shape_b: dict[tuple, set] = defaultdict(set)
    for t in rest_b:
        by_shape_b[(t[0], t[2], t[3])].add(t)

    def apply_map(t: tuple, m: dict) -> tuple | None:
        s_lex, o_lex = t[1], t[4]
        if t[0] == KIND_BNODE:
            s_lex = m.get(s_lex)
            if s_lex is None:
                return None
        if t[3] == KIND_BNODE:
            o_lex = m.get(o_lex)
            if o_lex is None:
                return None
        return (t[0], s_lex, t[2], t[3], o_lex, t[5], t[6])

    def backtrack(i: int, m: dict, used: set) -> bool:
        if i == len(order):
            mapped = Counter(apply_map(t, m) for t in rest_a)
            return mapped == Counter(rest_b)
        la = order[i]
        for lb in candidates[la]:
            if lb in used:
                continue
            m[la] = lb
            used.add(lb)
            # prune: every fully-mapped triple of a must exist in b
            ok = True
            for t in rest_a:
                labs = list(_bnodes_of(t))
                if all(l in m for l in labs):
                    mt = apply_map(t, m)
                    if mt not in set_b:
                        ok = False
                        break
            if ok and backtrack(i + 1, m, used):
                return True
            del m[la]
            used.discard(lb)
        return False

    return backtrack(0, {}, set())
