"""Goal-directed backward evaluation — magic-set rewrite onto the
semi-naive forward engine (stages/magic.py; parity:
jena-core reasoner/rulesys/LPBackwardRuleReasoner.java:39 hybrid
semantics — same answers, work restricted to the goal)."""

import pyarrow as pa
import pytest
import ray.data as rd

from jena_ray.model import KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA
from jena_ray.stages.magic import (backward_chain, backward_query,
                                   magic_compile, parse_goal)
from jena_ray.stages.rules import forward_chain, parse_rules

XSD = "http://www.w3.org/2001/XMLSchema#"


def _triples(rows):
    cols = {name: [] for name in TRIPLE_SCHEMA.names}
    for row in rows:
        s, p, o = row[:3]
        o_kind = row[3] if len(row) > 3 else KIND_IRI
        o_dt = row[4] if len(row) > 4 else ""
        cols["s_kind"].append(KIND_IRI)
        cols["s_lex"].append(s)
        cols["p"].append(p)
        cols["o_kind"].append(o_kind)
        cols["o_lex"].append(o)
        cols["o_datatype"].append(o_dt)
        cols["o_lang"].append("")
        cols["g"].append("")
        cols["doc_id"].append("d0")
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA],
        schema=TRIPLE_SCHEMA,
    )


ANCESTOR_RULES = """
[base: (?x <anc> ?y) <- (?x <par> ?y)]
[step: (?x <anc> ?z) <- (?x <par> ?y) (?y <anc> ?z)]
"""

# two disconnected families: a1→a2→a3→a4 and b1→b2→b3
FAMILIES = _triples(
    [(f"a{i}", "par", f"a{i+1}") for i in range(1, 4)]
    + [(f"b{i}", "par", f"b{i+1}") for i in range(1, 3)]
)


def _bind_set(ds, var):
    return {r[var] for r in ds.take_all()}


def test_ancestor_bound_subject():
    out = backward_query(
        rd.from_arrow(FAMILIES), ANCESTOR_RULES, "(<a1> <anc> ?d)")
    assert _bind_set(out, "d") == {"a2", "a3", "a4"}


def test_ancestor_bound_object():
    out = backward_query(
        rd.from_arrow(FAMILIES), ANCESTOR_RULES, "(?x <anc> <a4>)")
    assert _bind_set(out, "x") == {"a1", "a2", "a3"}


def test_ground_goal():
    hit = backward_query(
        rd.from_arrow(FAMILIES), ANCESTOR_RULES, "(<a1> <anc> <a3>)")
    assert hit.count() == 1
    miss = backward_query(
        rd.from_arrow(FAMILIES), ANCESTOR_RULES, "(<a1> <anc> <b2>)")
    assert miss.count() == 0


def test_free_free_goal_matches_forward_closure():
    bwd = backward_query(
        rd.from_arrow(FAMILIES), ANCESTOR_RULES, "(?x <anc> ?y)")
    fwd = forward_chain(rd.from_arrow(FAMILIES), parse_rules(
        ANCESTOR_RULES))
    fwd_pairs = {
        (r["s_lex"], r["o_lex"])
        for r in fwd.take_all() if r["p"] == "anc"
    }
    bwd_pairs = {(r["x"], r["y"]) for r in bwd.take_all()}
    assert bwd_pairs == fwd_pairs
    assert len(bwd_pairs) == 3 + 2 + 1 + 2 + 1  # a-chain + b-chain


def test_goal_directedness_skips_irrelevant_branch():
    """The whole point: with the goal anchored in family A, NO ancestor
    fact about family B is ever derived (tabled-SLD work avoidance)."""
    graph = backward_chain(
        rd.from_arrow(FAMILIES), ANCESTOR_RULES, "(<a1> <anc> ?d)")
    derived = [
        r for r in graph.take_all()
        if r["p"] == "anc" and r["s_lex"].startswith("b")
    ]
    assert derived == []


def test_same_generation():
    """Classic magic-sets benchmark: sg(x,y) <- flat(x,y);
    sg(x,y) <- up(x,z) sg(z,w) down(w,y)."""
    data = _triples([
        ("a", "up", "u1"), ("u1", "flat", "u2"), ("u2", "down", "b"),
        ("a", "flat", "c"),
        # irrelevant island
        ("z1", "up", "z2"), ("z2", "flat", "z3"), ("z3", "down", "z4"),
    ])
    rules = """
    [sg0: (?x <sg> ?y) <- (?x <flat> ?y)]
    [sg1: (?x <sg> ?y) <- (?x <up> ?z) (?z <sg> ?w) (?w <down> ?y)]
    """
    out = backward_query(rd.from_arrow(data), rules, "(<a> <sg> ?y)")
    assert _bind_set(out, "y") == {"b", "c"}
    graph = backward_chain(rd.from_arrow(data), rules, "(<a> <sg> ?y)")
    assert not [
        r for r in graph.take_all()
        if r["p"] == "sg" and r["s_lex"].startswith("z")
    ]


def test_guards_apply_in_backward_rules():
    data = _triples([
        ("c1", "acct", "100", KIND_LITERAL, XSD + "integer"),
        ("c2", "acct", "9000", KIND_LITERAL, XSD + "integer"),
    ])
    rules = "[r: (?c <rich> 'y') <- (?c <acct> ?b) ge(?b 7500)]"
    out = backward_query(rd.from_arrow(data), rules, "(?c <rich> ?v)")
    assert _bind_set(out, "c") == {"c2"}


def test_mixed_forward_and_backward_rules():
    """Hybrid rule set (FBRuleReasoner): '->' and '<-' rules evaluate
    together under one goal."""
    rules = """
    [lift: (?x <par> ?y) -> (?x <anc> ?y)]
    [step: (?x <anc> ?z) <- (?x <par> ?y) (?y <anc> ?z)]
    """
    out = backward_query(rd.from_arrow(FAMILIES), rules, "(<a1> <anc> ?d)")
    assert _bind_set(out, "d") == {"a2", "a3", "a4"}


def test_novalue_edb_allowed_idb_rejected():
    data = _triples([("c1", "nk", "0"), ("c2", "nk", "1")])
    ok = """
    [d: (?c <tag> 'other') <- (?c <nk> ?k) noValue(?c <nk> '0')]
    """
    out = backward_query(rd.from_arrow(data), ok, "(?c <tag> ?t)")
    assert _bind_set(out, "c") == {"c2"}
    bad = """
    [a: (?c <t2> 'x') <- (?c <nk> ?k)]
    [d: (?c <tag> 'other') <- (?c <nk> ?k) noValue(?c <t2> 'x')]
    """
    with pytest.raises(ValueError, match="noValue"):
        backward_query(rd.from_arrow(data), bad, "(?c <tag> ?t)")


def test_variable_predicate_rejected():
    with pytest.raises(ValueError, match="constant IRI predicates"):
        magic_compile("[r: (?s <q> ?o) <- (?s ?p ?o)]",
                      parse_goal("(?s <q> ?o)"))


def test_goal_on_pure_edb_predicate():
    out = backward_query(
        rd.from_arrow(FAMILIES), ANCESTOR_RULES, "(<a2> <par> ?y)")
    assert _bind_set(out, "y") == {"a3"}


def test_magic_compile_drops_unreachable_rules():
    rules = ANCESTOR_RULES + "[iso: (?x <other> ?y) <- (?x <par> ?y)]"
    transformed, _ = magic_compile(rules, parse_goal("(<a1> <anc> ?d)"))
    heads = {pat[1].lex for r in transformed for pat in r.head}
    assert not any(h == "other" for h in heads)
