"""Round-4 regression tests for the ADVICE.md findings:

1. OPTIONAL over a partially bound left side (mixed-var UNION) uses the
   bound-mask LeftJoin decomposition — unbound shared vars join with
   everything instead of falling through as misses.
2. VALUES with UNDEF nested inside a braced group still triggers the
   partially-bound join decomposition.
3. Typed / lang-tagged VALUES terms carry their datatype/lang into the
   hidden meta columns (lang()/datatype()/term comparison see them).
4. p{0} is the zero-length relation only, never a one-step pair.
5. Template bnodes are fresh per solution even when two blocks hold
   identical content (UNION of identical arms).
"""

import pyarrow as pa
import pytest

from jena_ray.ops.sparql import sparql_construct, sparql_select


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


ROWS = [
    ("http://ex/a", "http://ex/knows", "http://ex/b"),
    ("http://ex/b", "http://ex/knows", "http://ex/c"),
    ("http://ex/a", "http://ex/age", "42"),
    ("http://ex/b", "http://ex/age", "7"),
    ("http://ex/c", "http://ex/age", "19"),
]


@pytest.mark.usefixtures("ray_session")
def test_optional_over_partial_left():
    # Ω1 = union with mixed vars: the age arm leaves ?y unbound, so per
    # §18.5 those rows are compatible with EVERY {?y age ?z} solution
    # (unbound matches anything) — they must JOIN, not miss.
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?y ?z WHERE {
      { ?x ex:knows ?y } UNION { ?x ex:age ?o2 }
      OPTIONAL { ?y ex:age ?z }
    }
    """
    rows = sparql_select(_triples(ROWS), q).take_all()
    got = sorted((r["x"], r["y"], r["z"]) for r in rows)
    a, b, c = "http://ex/a", "http://ex/b", "http://ex/c"
    expect = sorted(
        [(a, b, "7"), (b, c, "19")]
        + [(x, a, "42") for x in (a, b, c)]
        + [(x, b, "7") for x in (a, b, c)]
        + [(x, c, "19") for x in (a, b, c)]
    )
    assert got == expect


@pytest.mark.usefixtures("ray_session")
def test_nested_values_undef_joins():
    # UNDEF inside a BRACED group: the unbound ?x row must join with
    # every ?x ex:age ?m solution, not be dropped by the hash join
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?n ?m WHERE {
      { VALUES (?x ?n) { (ex:a "1") (UNDEF "2") } }
      ?x ex:age ?m .
    }
    """
    rows = sparql_select(_triples(ROWS), q).take_all()
    got = sorted((r["x"], r["n"], r["m"]) for r in rows)
    a, b, c = "http://ex/a", "http://ex/b", "http://ex/c"
    assert got == sorted(
        [(a, "1", "42"), (a, "2", "42"), (b, "2", "7"), (c, "2", "19")]
    )


@pytest.mark.usefixtures("ray_session")
def test_values_lang_and_datatype_meta():
    q = """
    SELECT ?x WHERE { VALUES ?x { "a"@en "b" } FILTER(lang(?x) = "en") }
    """
    rows = sparql_select(_triples(ROWS), q).take_all()
    assert [r["x"] for r in rows] == ["a"]

    q2 = """
    PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
    SELECT ?x WHERE {
      VALUES ?x { "5"^^xsd:integer "z" }
      FILTER(datatype(?x) = xsd:integer)
    }
    """
    rows2 = sparql_select(_triples(ROWS), q2).take_all()
    assert [r["x"] for r in rows2] == ["5"]


@pytest.mark.usefixtures("ray_session")
def test_path_quantifier_zero():
    # p{0}: zero-length relation only — binds ?y = the subject itself,
    # never the one-step neighbor
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?y WHERE { ex:a ex:knows{0} ?y }
    """
    rows = sparql_select(_triples(ROWS), q).take_all()
    assert [r["y"] for r in rows] == ["http://ex/a"]


@pytest.mark.usefixtures("ray_session")
def test_offset_without_limit_streams(monkeypatch):
    # OFFSET without LIMIT must be a distributed block-metadata skip,
    # never a driver take_all (VERDICT r3 "What's wrong" #3)
    import ray.data

    rows = [(f"http://ex/s{i:02d}", "http://ex/p", f"{i:02d}")
            for i in range(50)]
    ds = _triples(rows).repartition(8)
    q = "SELECT ?o WHERE { ?s <http://ex/p> ?o } ORDER BY ?o OFFSET 10"
    orig = ray.data.Dataset.take_all

    def banned(self, *a, **k):
        raise AssertionError("driver take_all during OFFSET evaluation")

    monkeypatch.setattr(ray.data.Dataset, "take_all", banned)
    try:
        out = sparql_select(_triples(rows).repartition(8), q)
    finally:
        monkeypatch.setattr(ray.data.Dataset, "take_all", orig)
    got = [r["o"] for r in out.take_all()]
    assert got == [f"{i:02d}" for i in range(10, 50)]
    assert ds.count() == 50  # input untouched


@pytest.mark.usefixtures("ray_session")
def test_construct_bnode_fresh_across_identical_blocks():
    # UNION of identical arms → identical solutions in separate blocks;
    # each solution is a distinct existential, so every emitted triple
    # must carry a DISTINCT bnode label
    q = """
    PREFIX ex: <http://ex/>
    CONSTRUCT { _:m ex:of ?x }
    WHERE { { ?x ex:knows ?y } UNION { ?x ex:knows ?y } }
    """
    out = sparql_construct(_triples(ROWS), q).take_all()
    labels = [r["s_lex"] for r in out]
    assert len(labels) == 4
    assert len(set(labels)) == 4
