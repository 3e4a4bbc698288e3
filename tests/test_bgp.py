"""BGP match engine (reference OpExecutor/StageMatchTriple semantics)."""

import pyarrow as pa
import pytest

from jena_ray.ops.bgp import Var, match_bgp, select


def _triples(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "s_lex": pa.array([r[0] for r in rows], pa.large_string()),
                "p": pa.array([r[1] for r in rows], pa.large_string()),
                "o_lex": pa.array([r[2] for r in rows], pa.large_string()),
            }
        )
    )


G = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("a", "age", "42"),
    ("b", "age", "42"),
    ("c", "age", "7"),
    ("loop", "knows", "loop"),
]


@pytest.mark.usefixtures("ray_session")
def test_chain_join():
    got = {
        (r["x"], r["y"], r["z"])
        for r in match_bgp(
            _triples(G),
            [(Var("x"), "knows", Var("y")), (Var("y"), "knows", Var("z"))],
        ).take_all()
    }
    assert got == {("a", "b", "c"), ("loop", "loop", "loop")}


@pytest.mark.usefixtures("ray_session")
def test_star_join_shared_object_and_filter():
    b = match_bgp(
        _triples(G),
        [(Var("p1"), "age", Var("n")), (Var("p2"), "age", Var("n"))],
    )
    import pyarrow.compute as pc

    got = {
        (r["p1"], r["p2"])
        for r in select(b, ["p1", "p2"],
                        where=lambda t: pc.less(t["p1"], t["p2"])).take_all()
    }
    assert got == {("a", "b")}


@pytest.mark.usefixtures("ray_session")
def test_same_var_twice_in_one_pattern():
    got = {
        r["x"]
        for r in match_bgp(_triples(G), [(Var("x"), "knows", Var("x"))]).take_all()
    }
    assert got == {"loop"}


@pytest.mark.usefixtures("ray_session")
def test_reorder_connects_patterns():
    # given in a disconnected-looking order; the planner must reorder so
    # the middle pattern bridges (seed = most constants)
    got = match_bgp(
        _triples(G),
        [
            (Var("z"), "age", Var("k")),
            ("a", "knows", Var("y")),
            (Var("y"), "knows", Var("z")),
        ],
    ).take_all()
    assert {(r["y"], r["z"], r["k"]) for r in got} == {("b", "c", "7")}


@pytest.mark.usefixtures("ray_session")
def test_disconnected_bgp_is_cartesian_product():
    """SPARQL permits cartesian products; the chain cross-joins the
    disconnected component on a constant key (W3C negation suite)."""
    b = match_bgp(
        _triples(G),
        [(Var("x"), "knows", Var("y")), (Var("u"), "age", Var("v"))],
    )
    rows = b.take_all()
    # 3 knows-edges × 3 age-edges
    assert len(rows) == 9
    assert {(r["x"], r["u"]) for r in rows} == {
        (k, a) for k in ("a", "b", "loop") for a in ("a", "b", "c")
    }


@pytest.mark.usefixtures("ray_session")
def test_bag_semantics_and_distinct():
    rows = G + [("a2", "knows", "b"), ("a2", "age", "42")]
    # ?p age 42 . ?p knows ?q  — a and a2 both know b; bag has both rows
    b = match_bgp(
        _triples(rows),
        [(Var("p"), "age", "42"), (Var("p"), "knows", Var("q"))],
    )
    all_rows = [(r["p"], r["q"]) for r in b.take_all()]
    assert sorted(all_rows) == [("a", "b"), ("a2", "b"), ("b", "c")]
    d = match_bgp(
        _triples(rows),
        [(Var("p"), "age", "42"), (Var("p"), "knows", Var("q"))],
        distinct=True,
    )
    assert sorted((r["p"], r["q"]) for r in d.take_all()) == sorted(set(all_rows))


@pytest.mark.usefixtures("ray_session")
def test_bgp_over_flagship_triples():
    """The engine runs over the real KG triple table (9-col schema)."""
    from jena_ray.model import RDF_TYPE
    from jena_ray.pipelines.kg import kg_triples

    tr = kg_triples("/root/testdata/sf0.001", linker_concurrency=2)
    b = match_bgp(tr, [(Var("s"), RDF_TYPE, Var("t"))])
    rows = b.take_all()
    assert rows and all(r["s"] and r["t"] for r in rows)


@pytest.mark.usefixtures("ray_session")
def test_broadcast_join_matches_shuffle_join():
    """The small-side broadcast realization (BGP_BROADCAST_ROWS) must
    produce exactly the shuffle join's bag of bindings."""
    from jena_ray.ops import bgp as bgp_mod

    rows = [
        (f"m:{i}", "in_nation", f"n:{i % 5}") for i in range(200)
    ] + [(f"n:{k}", "in_region", f"r:{k % 2}") for k in range(5)]
    ds = _triples(rows)
    pats = [
        (bgp_mod.Var("m"), "in_nation", bgp_mod.Var("n")),
        (bgp_mod.Var("n"), "in_region", bgp_mod.Var("r")),
    ]

    def run():
        out = bgp_mod.match_bgp(ds, pats)
        import collections

        return collections.Counter(
            (r["m"], r["n"], r["r"]) for r in out.take_all()
        )

    old = bgp_mod.BGP_BROADCAST_ROWS
    try:
        bgp_mod.BGP_BROADCAST_ROWS = 10_000_000  # force broadcast
        via_broadcast = run()
        bgp_mod.BGP_BROADCAST_ROWS = -1  # force shuffle
        via_shuffle = run()
    finally:
        bgp_mod.BGP_BROADCAST_ROWS = old
    assert via_broadcast == via_shuffle
    assert sum(via_broadcast.values()) == 200
