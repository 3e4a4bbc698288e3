"""Goal-directed (backward) rule evaluation via magic-set rewriting.

Parity target: the reference's LP backward engine and hybrid reasoner
(jena-core reasoner/rulesys/LPBackwardRuleReasoner.java:39,
FBRuleReasoner.java, impl/LPInterpreter.java — SLD resolution with
tabling). A tuple-at-a-time SLD interpreter is the wrong shape for a
distributed engine: the goal stack is inherently sequential and each
resolution step touches one binding. The Ray realization instead uses
the MAGIC SETS transformation (Bancilhon/Maier/Sagiv/Ullman, PODS'86;
Beeri & Ramakrishnan, "On the power of magic", JLP 1991 — public
literature), which compiles goal-directedness INTO the rule set:

- every rule head predicate is a derived (IDB) relation; facts in the
  input graph are the EDB
- the goal's constant positions seed one "magic" fact; rewritten rules
  fire only when a magic fact says their conclusions are RELEVANT to
  the goal, and supplementary magic rules propagate relevance through
  rule bodies (left-to-right sideways information passing)
- the rewritten program runs on the existing distributed SEMI-NAIVE
  forward engine (stages/rules.forward_chain) — so the backward engine
  inherits its delta evaluation, int-hash min-tag merge, and scale
  story unchanged, and derives only the goal-relevant subset of the
  full closure (the same work-avoidance tabled SLD gives, batched)

Magic facts are ordinary triples under a reserved predicate namespace
(``urn:x-jena-ray:magic:<adornment>:<pred>``) so no engine changes are
needed; free argument positions hold the reserved unit IRI. Adornments
are over the (subject, object) pair of each triple pattern — 'b' bound
/ 'f' free — computed left-to-right through each body.

Subset requirements (ValueError otherwise, naming forward_chain as the
always-correct fallback):

- every rule-head and rule-body pattern predicate is a constant IRI
  (variable predicates cannot be classified EDB vs IDB)
- the goal's predicate is a constant
- ``noValue`` guards may only test EDB predicates: under the magic
  rewrite a derived fact can be absent merely because it was never
  RELEVANT, so NAF over IDB relations would be unsound
"""

from __future__ import annotations

import pyarrow as pa

from ..model import (KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA)
from .rules import (Builtin, Const, IRI, LIT, Rule, Var, _Parser,
                    _tokenize, forward_chain, parse_rules)

MAGIC_NS = "urn:x-jena-ray:magic:"
UNIT = Const(IRI, MAGIC_NS + "unit")


def parse_goal(text: str, prefixes: dict[str, str] | None = None):
    """``"(?x <p> <o>)"`` → (term, term, term) with the rule-file term
    syntax (vars, IRIs, prefixed names, literals)."""
    p = _Parser(_tokenize(text), prefixes or {})
    kind, clause = p.clause()
    if kind != "pattern":
        raise ValueError(f"goal must be a triple pattern, got {text!r}")
    return clause


def _is_var(t) -> bool:
    return isinstance(t, Var)


def _pred_lex(pat) -> str:
    s, p, o = pat
    if not isinstance(p, Const) or p.kind != IRI:
        raise ValueError(
            "magic-set rewrite needs constant IRI predicates in every "
            "pattern (variable predicates cannot be classified EDB vs "
            "IDB) — use stages/rules.forward_chain for full closure")
    return p.lex


def _adornment(s, o, bound: set) -> str:
    a = "b" if (not _is_var(s) or s.name in bound) else "f"
    b = "b" if (not _is_var(o) or o.name in bound) else "f"
    return a + b


def _magic_pattern(pred_lex: str, adorn: str, s, o):
    """The magic fact/pattern for predicate ``pred_lex`` under
    ``adorn``: bound positions keep the original term, free positions
    hold the unit IRI."""
    ms = s if adorn[0] == "b" else UNIT
    mo = o if adorn[1] == "b" else UNIT
    return (ms, Const(IRI, f"{MAGIC_NS}{adorn}:{pred_lex}"), mo)


def _split_heads(rules: list[Rule]) -> list[Rule]:
    """One head pattern per rule (a multi-head Datalog rule is the
    conjunction of its single-head projections)."""
    out = []
    for r in rules:
        if len(r.head) == 1:
            out.append(r)
        else:
            for i, h in enumerate(r.head):
                out.append(Rule(name=f"{r.name}_h{i}" if r.name else "",
                                body=r.body, guards=r.guards, head=[h]))
    return out


def magic_compile(rules, goal) -> tuple[list[Rule], pa.Table]:
    """Rewrite ``rules`` for ``goal`` → (transformed rule list, seed
    magic-fact table in TRIPLE_SCHEMA). Rules never reachable from the
    goal's predicate are dropped entirely — that's the point."""
    if isinstance(rules, str):
        rules = parse_rules(rules)
    rules = _split_heads(rules)

    idb = {_pred_lex(r.head[0]) for r in rules}
    for r in rules:
        for pat in r.body:
            _pred_lex(pat)
        for g in r.guards:
            if isinstance(g, Builtin) and g.name == "noValue":
                parg = g.args[1] if len(g.args) >= 2 else None
                if (not isinstance(parg, Const) or parg.kind != IRI
                        or parg.lex in idb):
                    raise ValueError(
                        "noValue over a derived (rule-head) predicate "
                        "is unsound under the magic rewrite — a derived "
                        "fact may be absent merely because it was never "
                        "goal-relevant; use forward_chain")

    gs, gp, go = goal
    goal_pred = _pred_lex(goal)
    if isinstance(gs, Const) and gs.kind == LIT:
        raise ValueError("goal subject cannot be a literal")
    goal_adorn = _adornment(gs, go, set())

    by_pred: dict[str, list[Rule]] = {}
    for r in rules:
        by_pred.setdefault(_pred_lex(r.head[0]), []).append(r)

    out: list[Rule] = []
    work = [(goal_pred, goal_adorn)]
    done: set[tuple[str, str]] = set()
    while work:
        q, a = work.pop()
        if (q, a) in done:
            continue
        done.add((q, a))
        for r in by_pred.get(q, []):
            hs, _, ho = r.head[0]
            bound: set[str] = set()
            if a[0] == "b" and _is_var(hs):
                bound.add(hs.name)
            if a[1] == "b" and _is_var(ho):
                bound.add(ho.name)
            magic_pat = _magic_pattern(q, a, hs, ho)
            prefix = [magic_pat]
            for pat in r.body:
                ps, _, po = pat
                plex = _pred_lex(pat)
                if plex in idb:
                    sub_a = _adornment(ps, po, bound)
                    out.append(Rule(
                        name=f"m_{r.name or 'r'}_{a}_{len(prefix)}",
                        body=list(prefix), guards=[],
                        head=[_magic_pattern(plex, sub_a, ps, po)],
                    ))
                    work.append((plex, sub_a))
                prefix.append(pat)
                for t in (ps, po):
                    if _is_var(t):
                        bound.add(t.name)
            out.append(Rule(
                name=f"{r.name or 'r'}__{a}",
                body=[magic_pat] + list(r.body),
                guards=r.guards, head=r.head,
            ))

    seed = _seed_table(gs, goal_pred, goal_adorn, go)
    return out, seed


def _seed_table(gs, goal_pred: str, adorn: str, go) -> pa.Table:
    s = gs if adorn[0] == "b" else UNIT
    o = go if adorn[1] == "b" else UNIT
    o_kind = KIND_LITERAL if (isinstance(o, Const) and o.kind == LIT) \
        else KIND_IRI
    row = {
        "s_kind": [KIND_IRI],
        "s_lex": [s.lex],
        "p": [f"{MAGIC_NS}{adorn}:{goal_pred}"],
        "o_kind": [o_kind],
        "o_lex": [o.lex],
        "o_datatype": [o.dt if isinstance(o, Const) else ""],
        "o_lang": [o.lang if isinstance(o, Const) else ""],
        "g": [""],
        "doc_id": ["magic:seed"],
    }
    return pa.Table.from_pydict(
        {f.name: pa.array(row[f.name], f.type) for f in TRIPLE_SCHEMA},
        schema=TRIPLE_SCHEMA,
    )


def backward_chain(triples_ds, rules, goal, *, max_rounds: int | None = None):
    """Saturate only the GOAL-RELEVANT closure: magic rewrite, seed,
    then the distributed semi-naive forward engine. Returns the
    saturated graph (input ∪ relevant derived ∪ magic facts)."""
    import ray.data as rd

    if isinstance(goal, str):
        goal = parse_goal(goal)
    transformed, seed = magic_compile(rules, goal)
    seeded = triples_ds.union(rd.from_arrow(seed))
    return forward_chain(seeded, transformed, max_rounds=max_rounds)


def backward_query(triples_ds, rules, goal, *,
                   max_rounds: int | None = None):
    """Answer ``goal`` goal-directedly: the Ray analog of posing a
    query to the reference's backward/hybrid rule reasoner. Returns the
    goal's variable bindings as a Dataset (ops/bgp.match_bgp over the
    relevant closure — distinct rows, term metadata columns kept)."""
    from ..ops.bgp import match_bgp

    if isinstance(goal, str):
        goal = parse_goal(goal)
    graph = backward_chain(triples_ds, rules, goal, max_rounds=max_rounds)
    pat = tuple(t if isinstance(t, Var) else t.lex for t in goal)
    return match_bgp(graph, [pat], distinct=True, with_meta=True)
