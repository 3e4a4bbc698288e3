"""General property-path evaluator semantics (reference:
sparql/path/eval/PathEval.java) on a small synthetic graph:

    a -p-> b -p-> c -p-> d        (chain)
    c -q-> a                      (back edge, makes a p/q cycle)
    a -r-> x
"""

import pyarrow as pa
import pytest

from jena_ray.ops.paths import Alt, Inv, Link, NegSet, Opt, Plus, Seq, Star, eval_path


def _graph():
    import ray.data as rd

    rows = [
        ("a", "p", "b"),
        ("b", "p", "c"),
        ("c", "p", "d"),
        ("c", "q", "a"),
        ("a", "r", "x"),
    ]
    return rd.from_arrow(
        pa.table(
            {
                "s": pa.array([r[0] for r in rows], pa.large_string()),
                "p": pa.array([r[1] for r in rows], pa.large_string()),
                "o": pa.array([r[2] for r in rows], pa.large_string()),
            }
        )
    )


def _pairs(ds):
    return {(r["start"], r["end"]) for r in ds.take_all()}


@pytest.mark.usefixtures("ray_session")
def test_link_and_inverse():
    g = _graph()
    assert _pairs(eval_path(g, Link("q"))) == {("c", "a")}
    assert _pairs(eval_path(g, Inv(Link("q")))) == {("a", "c")}


@pytest.mark.usefixtures("ray_session")
def test_alt_and_seq():
    g = _graph()
    assert _pairs(eval_path(g, Alt(Link("q"), Link("r")))) == {("c", "a"), ("a", "x")}
    # p/p : two-hop chain pairs
    assert _pairs(eval_path(g, Seq(Link("p"), Link("p")))) == {("a", "c"), ("b", "d")}
    # p/q : b -p-> c -q-> a
    assert _pairs(eval_path(g, Seq(Link("p"), Link("q")))) == {("b", "a")}


@pytest.mark.usefixtures("ray_session")
def test_negset_forward_and_inverse_members():
    g = _graph()
    # !(p|r) : only the q edge survives, forward direction
    assert _pairs(eval_path(g, NegSet(fwd=("p", "r")))) == {("c", "a")}
    # !(p|r|^p|^r) : q forward plus everything-but-p,r inverse → q both ways
    assert _pairs(eval_path(g, NegSet(fwd=("p", "r"), inv=("p", "r")))) == {
        ("c", "a"),
        ("a", "c"),
    }


@pytest.mark.usefixtures("ray_session")
def test_star_includes_zero_length_and_crosses_cycle():
    g = _graph()
    got = _pairs(eval_path(g, Star(Link("p")), seeds=["a"]))
    assert got == {("a", "a"), ("a", "b"), ("a", "c"), ("a", "d")}
    # star over Alt(p, q) from d: zero-length only (d has no out-edges)
    assert _pairs(eval_path(g, Star(Alt(Link("p"), Link("q"))), seeds=["d"])) == {
        ("d", "d")
    }
    # cycle: from b, p|q star loops c -q-> a and still terminates
    got_b = _pairs(eval_path(g, Star(Alt(Link("p"), Link("q"))), seeds=["b"]))
    assert got_b == {("b", "b"), ("b", "c"), ("b", "d"), ("b", "a")}


@pytest.mark.usefixtures("ray_session")
def test_plus_excludes_zero_length():
    g = _graph()
    got = _pairs(eval_path(g, Plus(Link("p")), seeds=["a", "d"]))
    assert got == {("a", "b"), ("a", "c"), ("a", "d")}  # no (a,a), no (d,d)


@pytest.mark.usefixtures("ray_session")
def test_opt_is_zero_or_one():
    g = _graph()
    got = _pairs(eval_path(g, Opt(Link("p")), seeds=["a", "d"]))
    assert got == {("a", "a"), ("a", "b"), ("d", "d")}


@pytest.mark.usefixtures("ray_session")
def test_star_unseeded_closure():
    # ?x p* ?y with no seeds: the transitive closure of p plus the
    # zero-length (x, x) pair for EVERY graph node (any term)
    got = _pairs(eval_path(_graph(), Star(Link("p"))))
    nodes = {"a", "b", "c", "d", "x"}
    expect = {(n, n) for n in nodes} | {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    }
    assert got == expect


def test_plus_unseeded_closure():
    got = _pairs(eval_path(_graph(), Plus(Link("p"))))
    assert got == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    }


@pytest.mark.usefixtures("ray_session")
def test_nested_star_of_seq():
    # (p/p)* from a: zero + even-length p-chains: a, c (a-p-b-p-c)
    g = _graph()
    got = _pairs(eval_path(g, Star(Seq(Link("p"), Link("p"))), seeds=["a"]))
    assert got == {("a", "a"), ("a", "c")}


@pytest.mark.usefixtures("ray_session")
def test_negset_pure_inverse_matches_reverse_only():
    """!(^q) matches reverse edges only — no forward half exists
    (ADVICE r2; P_NegPropSet partitions into fwd and inv halves)."""
    g = _graph()
    got = _pairs(eval_path(g, NegSet(fwd=(), inv=("q",))))
    # reverse edges of every non-q predicate; ^q itself excluded
    assert got == {("b", "a"), ("c", "b"), ("d", "c"), ("x", "a")}


@pytest.mark.usefixtures("ray_session")
def test_closure_round_cap_raises_not_truncates():
    """An explicit max_rounds cap RAISES when hit with a non-empty
    frontier instead of silently returning a truncated closure
    (ADVICE r2; the reference evaluates closures to fixpoint)."""
    import ray.data as rd

    n = 6
    rows = [(f"n{i}", "p", f"n{i+1}") for i in range(n)]
    ds = rd.from_arrow(
        pa.table(
            {
                "s": pa.array([r[0] for r in rows], pa.large_string()),
                "p": pa.array([r[1] for r in rows], pa.large_string()),
                "o": pa.array([r[2] for r in rows], pa.large_string()),
            }
        )
    )
    with pytest.raises(RuntimeError, match="round cap"):
        eval_path(ds, Plus(Link("p")), seeds=["n0"], max_rounds=2)
    # default (no cap) runs to fixpoint: n0 reaches all n successors
    got = _pairs(eval_path(ds, Plus(Link("p")), seeds=["n0"]))
    assert got == {("n0", f"n{i}") for i in range(1, n + 1)}


@pytest.mark.usefixtures("ray_session")
def test_seq_with_closure_element_seeded():
    """Seeds propagate through Seq (PathEval.java): p/q* and p*/q
    evaluate each element seeded by the previous frontier."""
    g = _graph()
    # a -p-> b ; then q* from b: zero-length (b) only (no q edge from b)
    got = _pairs(eval_path(g, Seq(Link("p"), Star(Link("q"))), seeds=["a"]))
    assert got == {("a", "b")}
    # a -p*-> {a,b,c,d}; then -q-> : only c has a q edge (c -q-> a)
    got2 = _pairs(eval_path(g, Seq(Star(Link("p")), Link("q")), seeds=["a"]))
    assert got2 == {("a", "a")}


@pytest.mark.usefixtures("ray_session")
def test_star_of_seq_and_alt_of_closure():
    g = _graph()
    # (p/q)*: a -(p..? no: p then q needs b-q->? none. Seq(p,q) one step:
    # pairs where x-p->y-q->z: b-p->c, c-q->a => (b, a). From seed b:
    # zero (b,b) + (b,a) + then from a: a-p->b, b-q->? none → stop.
    got = _pairs(eval_path(g, Star(Seq(Link("p"), Link("q"))), seeds=["b"]))
    assert got == {("b", "b"), ("b", "a")}
    # (q|r)* from a: a-r->x; x has nothing; a-q->? none → {a, x}
    got2 = _pairs(eval_path(g, Star(Alt(Link("q"), Link("r"))), seeds=["a"]))
    assert got2 == {("a", "a"), ("a", "x")}


@pytest.mark.usefixtures("ray_session")
def test_closure_nested_in_closure_step():
    """A closure whose step contains another closure re-evaluates the
    step seeded per round (_step_needs_seeding): (p*/q)+ and (p*|q)+."""
    g = _graph()
    # step p*/q from a: p* reaches {a,b,c,d}, only c has q (c-q->a)
    got = _pairs(eval_path(g, Plus(Seq(Star(Link("p")), Link("q"))), seeds=["a"]))
    assert got == {("a", "a")}
    # (p*|q)+ from a: p* zero-length puts a in the step's range too
    got2 = _pairs(eval_path(g, Plus(Alt(Star(Link("p")), Link("q"))), seeds=["a"]))
    assert got2 == {("a", "a"), ("a", "b"), ("a", "c"), ("a", "d")}


@pytest.mark.usefixtures("ray_session")
def test_inverse_of_compound_paths_pushed_down():
    """^(P) for compound P rewrites via _inv_push so nested closures
    stay seeded: ^(p*) == (^p)*, ^(p/q) == ^q/^p."""
    g = _graph()
    got = _pairs(eval_path(g, Inv(Star(Link("p"))), seeds=["d"]))
    assert got == {("d", "d"), ("d", "c"), ("d", "b"), ("d", "a")}
    got2 = _pairs(eval_path(g, Inv(Seq(Link("p"), Link("q")))))
    assert got2 == {("a", "b")}
