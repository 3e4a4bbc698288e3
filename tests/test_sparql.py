"""SPARQL SELECT front-end: parse → BGP compile → execute."""

import pyarrow as pa
import pytest

from jena_ray.model import RDFParseError
from jena_ray.ops.sparql import sparql_select


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


G = _triples  # alias


ROWS = [
    ("http://ex/a", "http://ex/knows", "http://ex/b"),
    ("http://ex/b", "http://ex/knows", "http://ex/c"),
    ("http://ex/a", "http://ex/age", "42"),
    ("http://ex/b", "http://ex/age", "7"),
    ("http://ex/c", "http://ex/age", "19"),
    ("http://ex/a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
     "http://ex/Person"),
]


@pytest.mark.usefixtures("ray_session")
def test_select_chain_with_prefix_and_a():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?y WHERE { ?x ex:knows ?y . ?x a ex:Person }
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [(r["x"], r["y"]) for r in rows] == [("http://ex/a", "http://ex/b")]


@pytest.mark.usefixtures("ray_session")
def test_filter_numeric_and_order_desc():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?p ?n WHERE { ?p ex:age ?n . FILTER(?n > 10) }
    ORDER BY DESC(?n)
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [(r["p"], r["n"]) for r in rows] == [
        ("http://ex/a", "42"), ("http://ex/c", "19"),
    ]


@pytest.mark.usefixtures("ray_session")
def test_filter_boolean_combinators_and_regex():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?p WHERE {
      ?p ex:age ?n .
      FILTER(REGEX(STR(?p), "ex/[abc]") && (?n < 10 || ?n = 42))
    } ORDER BY ?p
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [r["p"] for r in rows] == ["http://ex/a", "http://ex/b"]


@pytest.mark.usefixtures("ray_session")
def test_distinct_star_limit():
    q = """
    PREFIX ex: <http://ex/>
    SELECT DISTINCT * WHERE { ?x ex:knows ?y } ORDER BY ?x LIMIT 1
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert len(rows) == 1 and rows[0]["x"] == "http://ex/a"


@pytest.mark.usefixtures("ray_session")
def test_offset_window():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?p WHERE { ?p ex:age ?n } ORDER BY ?p LIMIT 2 OFFSET 1
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [r["p"] for r in rows] == ["http://ex/b", "http://ex/c"]


@pytest.mark.usefixtures("ray_session")
def test_errors():
    with pytest.raises(RDFParseError, match="unknown prefix"):
        sparql_select(G(ROWS), "SELECT ?x WHERE { ?x foo:bar ?y }")
    # projecting a var the pattern never binds is LEGAL SPARQL — the
    # var is simply unbound in every solution (jena parity; the old
    # strict rejection was out of spec)
    rows = sparql_select(
        G(ROWS), "SELECT ?nope ?n WHERE { ?x <http://ex/age> ?n }"
    ).take_all()
    assert rows and all(r["nope"] is None for r in rows)
    # the empty group is the unit solution (one empty binding), so ASK
    # over it is true
    from jena_ray.ops.sparql import sparql_ask

    assert sparql_ask(G(ROWS), "ASK { }") is True


@pytest.mark.usefixtures("ray_session")
def test_optional_left_join_with_bound():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?y WHERE {
      ?x ex:age ?n .
      OPTIONAL { ?x ex:knows ?y }
    } ORDER BY ?x
    """
    rows = sparql_select(G(ROWS), q).take_all()
    got = [(r["x"], r["y"]) for r in rows]
    assert got == [
        ("http://ex/a", "http://ex/b"),
        ("http://ex/b", "http://ex/c"),
        ("http://ex/c", None),
    ]
    # FILTER(!BOUND(?y)) keeps only the unmatched row
    q2 = """
    PREFIX ex: <http://ex/>
    SELECT ?x WHERE {
      ?x ex:age ?n .
      OPTIONAL { ?x ex:knows ?y }
      FILTER(!BOUND(?y))
    }
    """
    rows2 = sparql_select(G(ROWS), q2).take_all()
    assert [r["x"] for r in rows2] == ["http://ex/c"]


@pytest.mark.usefixtures("ray_session")
def test_union_aligns_columns():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?y ?n WHERE {
      ?x ex:age ?m .
      { ?x ex:knows ?y } UNION { ?x ex:age ?n }
    } ORDER BY ?x
    """
    rows = sparql_select(G(ROWS), q).take_all()
    by_x = {}
    for r in rows:
        by_x.setdefault(r["x"], []).append((r["y"], r["n"]))
    # each arm contributes: knows-rows bind ?y (null ?n), age-rows bind ?n
    assert (None, "42") in by_x["http://ex/a"]
    assert ("http://ex/b", None) in by_x["http://ex/a"]
    assert by_x["http://ex/c"] == [(None, "19")]


@pytest.mark.usefixtures("ray_session")
def test_optional_cartesian_product():
    # an OPTIONAL sharing no variable is the cross product (every pair
    # of solutions is compatible — SPARQL 18.5 LeftJoin over disjoint
    # domains); 3 ages × 2 knows edges = 6 rows
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?u WHERE { ?x ex:age ?n . OPTIONAL { ?u ex:knows ?v } }
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert len(rows) == 6
    assert all(r["u"] is not None for r in rows)


@pytest.mark.usefixtures("ray_session")
def test_minus_removes_compatible_bindings():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x WHERE { ?x ex:age ?n . MINUS { ?x ex:knows ?y } } ORDER BY ?x
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [r["x"] for r in rows] == ["http://ex/c"]


@pytest.mark.usefixtures("ray_session")
def test_group_by_aggregates():
    rows_in = ROWS + [("http://ex/a", "http://ex/knows", "http://ex/c")]
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x ex:knows ?y }
    GROUP BY ?x ORDER BY ?x
    """
    rows = sparql_select(G(rows_in), q).take_all()
    assert [(r["x"], r["n"]) for r in rows] == [
        ("http://ex/a", 2), ("http://ex/b", 1),
    ]


@pytest.mark.usefixtures("ray_session")
def test_global_aggregates_sum_avg_minmax():
    q = """
    PREFIX ex: <http://ex/>
    SELECT (COUNT(*) AS ?c) (SUM(?n) AS ?s) (AVG(?n) AS ?avg)
           (MIN(?n) AS ?lo) (MAX(?n) AS ?hi)
    WHERE { ?p ex:age ?n }
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["c"] == 3 and r["s"] == 68.0 and r["lo"] == 7.0 and r["hi"] == 42.0
    assert abs(r["avg"] - 68 / 3) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_projected_var_must_be_group_key():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?y (COUNT(?y) AS ?n) WHERE { ?x ex:knows ?y } GROUP BY ?x
    """
    with pytest.raises(RDFParseError,
                       match="neither grouped nor aggregated"):
        sparql_select(G(ROWS), q)


@pytest.mark.usefixtures("ray_session")
def test_path_alt_and_seq_in_pattern():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?z WHERE { ?x ex:knows/ex:knows ?z } ORDER BY ?x
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [(r["x"], r["z"]) for r in rows] == [("http://ex/a", "http://ex/c")]

    q2 = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?v WHERE { ?x ex:knows|ex:age ?v . ?x a ex:Person } ORDER BY ?v
    """
    rows2 = sparql_select(G(ROWS), q2).take_all()
    assert [(r["x"], r["v"]) for r in rows2] == [
        ("http://ex/a", "42"), ("http://ex/a", "http://ex/b"),
    ]


@pytest.mark.usefixtures("ray_session")
def test_path_inverse_in_pattern():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?y WHERE { ?y ^ex:knows ?x . FILTER(?x = "http://ex/a") }
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [r["y"] for r in rows] == ["http://ex/b"]


@pytest.mark.usefixtures("ray_session")
def test_path_star_with_constant_subject():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?y WHERE { ex:a ex:knows* ?y } ORDER BY ?y
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [r["y"] for r in rows] == [
        "http://ex/a", "http://ex/b", "http://ex/c",
    ]


@pytest.mark.usefixtures("ray_session")
def test_path_plus_with_constant_object():
    # inverted seeded evaluation: who reaches c via knows+
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x WHERE { ?x ex:knows+ ex:c } ORDER BY ?x
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [r["x"] for r in rows] == ["http://ex/a", "http://ex/b"]


@pytest.mark.usefixtures("ray_session")
def test_path_closure_unseeded_var_var():
    # ?x knows* ?y with both endpoints variable: the distributed
    # unseeded closure (transitive_pairs) plus zero-length pairs over
    # every graph node
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?y WHERE { ?x ex:knows+ ?y }
    """
    rows = sparql_select(G(ROWS), q).take_all()
    got = {(r["x"], r["y"]) for r in rows}
    assert got == {
        ("http://ex/a", "http://ex/b"),
        ("http://ex/a", "http://ex/c"),
        ("http://ex/b", "http://ex/c"),
    }


@pytest.mark.usefixtures("ray_session")
def test_path_negset_in_pattern():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?v WHERE { ?x !(ex:age|a) ?v } ORDER BY ?x
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [(r["x"], r["v"]) for r in rows] == [
        ("http://ex/a", "http://ex/b"), ("http://ex/b", "http://ex/c"),
    ]


@pytest.mark.usefixtures("ray_session")
def test_values_restricts_bindings():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?n WHERE {
      ?x ex:age ?n .
      VALUES ?x { ex:a ex:c }
    } ORDER BY ?x
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [(r["x"], r["n"]) for r in rows] == [
        ("http://ex/a", "42"), ("http://ex/c", "19"),
    ]


@pytest.mark.usefixtures("ray_session")
def test_values_multi_var():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?n WHERE {
      ?x ex:age ?n .
      VALUES (?x ?n) { (ex:a "42") (ex:b "999") }
    }
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [(r["x"], r["n"]) for r in rows] == [("http://ex/a", "42")]


@pytest.mark.usefixtures("ray_session")
def test_bind_strlen_and_literal():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?len ?tag WHERE {
      ?x ex:age ?n .
      BIND(STRLEN(?x) AS ?len)
      BIND("person" AS ?tag)
    } ORDER BY ?x LIMIT 1
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert rows[0]["len"] == "11"  # len("http://ex/a")
    assert rows[0]["tag"] == "person"


@pytest.mark.usefixtures("ray_session")
def test_bind_rejects_rebinding():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x WHERE { ?x ex:age ?n . BIND("x" AS ?n) }
    """
    with pytest.raises(RDFParseError, match="in scope|reassigns"):
        sparql_select(G(ROWS), q)


@pytest.mark.usefixtures("ray_session")
def test_ask():
    from jena_ray.ops.sparql import sparql_ask

    q = "PREFIX ex: <http://ex/> ASK { ?x ex:knows ?y }"
    assert sparql_ask(G(ROWS), q) is True
    q2 = 'PREFIX ex: <http://ex/> ASK { ?x ex:knows ?y . FILTER(?y = "nope") }'
    assert sparql_ask(G(ROWS), q2) is False


@pytest.mark.usefixtures("ray_session")
def test_construct_emits_triple_table():
    from jena_ray.ops.sparql import sparql_construct

    q = """
    PREFIX ex: <http://ex/>
    CONSTRUCT { ?y ex:knownBy ?x . ?x ex:labeled "friend" }
    WHERE { ?x ex:knows ?y }
    """
    rows = sparql_construct(G(ROWS), q).take_all()
    spo = {(r["s_lex"], r["p"], r["o_lex"]) for r in rows}
    assert ("http://ex/b", "http://ex/knownBy", "http://ex/a") in spo
    assert ("http://ex/a", "http://ex/labeled", "friend") in spo
    lit = [r for r in rows if r["o_lex"] == "friend"][0]
    assert lit["o_kind"] == 2 and lit["o_datatype"].endswith("#string")
    iri = [r for r in rows if r["p"] == "http://ex/knownBy"][0]
    assert iri["o_kind"] == 0


@pytest.mark.usefixtures("ray_session")
def test_having_filters_groups():
    rows_in = ROWS + [("http://ex/a", "http://ex/knows", "http://ex/c")]
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x ex:knows ?y }
    GROUP BY ?x HAVING(?n > 1)
    """
    rows = sparql_select(G(rows_in), q).take_all()
    assert [(r["x"], r["n"]) for r in rows] == [("http://ex/a", 2)]


@pytest.mark.usefixtures("ray_session")
def test_query_dispatcher():
    from jena_ray.ops.sparql import sparql_query

    assert sparql_query(G(ROWS), "PREFIX ex: <http://ex/> ASK { ?x ex:age ?n }") is True
    ds = sparql_query(
        G(ROWS), "PREFIX ex: <http://ex/> SELECT ?x WHERE { ?x ex:age ?n }"
    )
    assert ds.count() == 3


@pytest.mark.usefixtures("ray_session")
def test_subquery_aggregate_joined_into_outer():
    rows_in = ROWS + [("http://ex/a", "http://ex/knows", "http://ex/c")]
    # inner: out-degree per person; outer: join back to their age
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?n ?deg WHERE {
      ?x ex:age ?n .
      { SELECT ?x (COUNT(?y) AS ?deg) WHERE { ?x ex:knows ?y } GROUP BY ?x }
    } ORDER BY ?x
    """
    rows = sparql_select(G(rows_in), q).take_all()
    assert [(r["x"], r["n"], r["deg"]) for r in rows] == [
        ("http://ex/a", "42", 2), ("http://ex/b", "7", 1),
    ]


@pytest.mark.usefixtures("ray_session")
def test_subquery_with_limit():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?x ?n WHERE {
      { SELECT ?x WHERE { ?x ex:knows ?y } ORDER BY ?x LIMIT 1 }
      ?x ex:age ?n .
    }
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [(r["x"], r["n"]) for r in rows] == [("http://ex/a", "42")]


def _quads(rows):
    """rows: (s, p, o, g) — build a 4-col triple table."""
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "s_lex": pa.array([r[0] for r in rows], pa.large_string()),
                "p": pa.array([r[1] for r in rows], pa.large_string()),
                "o_lex": pa.array([r[2] for r in rows], pa.large_string()),
                "g": pa.array([r[3] for r in rows], pa.large_string()),
            }
        )
    )


QROWS = [
    ("http://ex/a", "http://ex/p", "v1", ""),                 # default graph
    ("http://ex/a", "http://ex/p", "v2", "http://ex/g1"),
    ("http://ex/a", "http://ex/q", "w1", "http://ex/g1"),
    ("http://ex/b", "http://ex/p", "v3", "http://ex/g2"),
    ("http://ex/b", "http://ex/q", "w2", "http://ex/g1"),     # cross-graph
]


@pytest.mark.usefixtures("ray_session")
def test_graph_constant_scopes_patterns():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?s ?v WHERE { GRAPH <http://ex/g1> { ?s ex:p ?v } }
    """
    rows = sparql_select(_quads(QROWS), q).take_all()
    assert [(r["s"], r["v"]) for r in rows] == [("http://ex/a", "v2")]


@pytest.mark.usefixtures("ray_session")
def test_graph_var_binds_and_forces_same_graph():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?g ?s WHERE { GRAPH ?g { ?s ex:p ?v . ?s ex:q ?w } }
    """
    rows = sparql_select(_quads(QROWS), q).take_all()
    # only g1 has BOTH p and q for the same subject a; b's p and q are in
    # DIFFERENT graphs so the shared ?g join drops it
    assert [(r["g"], r["s"]) for r in rows] == [("http://ex/g1", "http://ex/a")]


@pytest.mark.usefixtures("ray_session")
def test_describe_star():
    from jena_ray.ops.sparql import sparql_query

    ds = G(ROWS)
    out = sparql_query(ds, "DESCRIBE <http://ex/b>")
    got = {(r["s_lex"], r["p"], r["o_lex"]) for r in out.take_all()}
    # DescribeBNodeClosureHandler semantics (the reference's default):
    # triples whose SUBJECT is the node + the bnode closure — incoming
    # triples like (a knows b) are NOT part of the description
    assert got == {
        ("http://ex/b", "http://ex/knows", "http://ex/c"),
        ("http://ex/b", "http://ex/age", "7"),
    }


@pytest.mark.usefixtures("ray_session")
def test_ask_all_constant_pattern():
    """An all-constant pattern preserves its match count (ADVICE r2:
    StageMatchTriple returns one empty binding per match)."""
    from jena_ray.ops.sparql import sparql_ask

    assert sparql_ask(
        G(ROWS), "ASK { <http://ex/a> <http://ex/knows> <http://ex/b> }"
    ) is True
    assert sparql_ask(
        G(ROWS), "ASK { <http://ex/a> <http://ex/knows> <http://ex/zzz> }"
    ) is False


@pytest.mark.usefixtures("ray_session")
def test_constant_pattern_gates_group():
    """A constant pattern joined with a var pattern acts as an existence
    gate: present -> group unchanged, absent -> group empty."""
    q_hit = """
    PREFIX ex: <http://ex/>
    SELECT ?n WHERE { ex:a ex:knows ex:b . ex:a ex:age ?n }
    """
    rows = sparql_select(G(ROWS), q_hit).take_all()
    assert [r["n"] for r in rows] == ["42"]
    q_miss = """
    PREFIX ex: <http://ex/>
    SELECT ?n WHERE { ex:a ex:knows ex:zzz . ex:a ex:age ?n }
    """
    assert sparql_select(G(ROWS), q_miss).take_all() == []


@pytest.mark.usefixtures("ray_session")
def test_count_sum_over_empty_is_zero():
    """SPARQL defines COUNT/SUM over the empty group as 0 (ADVICE r2)."""
    q = """
    PREFIX ex: <http://ex/>
    SELECT (COUNT(*) AS ?c) (SUM(?n) AS ?s) WHERE { ?x ex:nothere ?n }
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert len(rows) == 1
    assert rows[0]["c"] == 0 and rows[0]["s"] == 0


def _typed_triples(rows):
    """rows: (s_lex, p, o_lex, o_dt, o_lang, o_kind)"""
    import ray.data as rd

    from jena_ray.model import KIND_IRI, KIND_LITERAL

    return rd.from_arrow(
        pa.table(
            {
                "s_kind": pa.array([KIND_IRI] * len(rows), pa.int8()),
                "s_lex": pa.array([r[0] for r in rows], pa.large_string()),
                "p": pa.array([r[1] for r in rows], pa.large_string()),
                "o_kind": pa.array(
                    [r[5] if len(r) > 5 else KIND_LITERAL for r in rows],
                    pa.int8(),
                ),
                "o_lex": pa.array([r[2] for r in rows], pa.large_string()),
                "o_datatype": pa.array([r[3] for r in rows], pa.large_string()),
                "o_lang": pa.array([r[4] for r in rows], pa.large_string()),
            }
        )
    )


XSD = "http://www.w3.org/2001/XMLSchema#"


@pytest.mark.usefixtures("ray_session")
def test_typed_filter_excludes_ill_typed_rows():
    """FILTER(?v > 10) in numeric context: xsd:string-typed rows with a
    numeric-looking lexical form are NOT numbers (VERDICT r2 #5)."""
    rows = [
        ("http://ex/a", "http://ex/price", "42", XSD + "integer", ""),
        ("http://ex/b", "http://ex/price", "900", XSD + "string", ""),
        ("http://ex/c", "http://ex/price", "7", XSD + "integer", ""),
        ("http://ex/d", "http://ex/price", "15", "", ""),  # untyped: lexical-numeric ok
    ]
    q = "SELECT ?s WHERE { ?s <http://ex/price> ?v . FILTER(?v > 10) }"
    got = {r["s"] for r in sparql_select(_typed_triples(rows), q).take_all()}
    assert got == {"http://ex/a", "http://ex/d"}


@pytest.mark.usefixtures("ray_session")
def test_value_space_equality_across_lexical_forms():
    """"042"^^xsd:int = "42.0"^^xsd:decimal by VALUE (sameValueAs)."""
    rows = [
        ("http://ex/a", "http://ex/p", "042", XSD + "int", ""),
        ("http://ex/a", "http://ex/q", "42.0", XSD + "decimal", ""),
        ("http://ex/b", "http://ex/p", "5", XSD + "int", ""),
        ("http://ex/b", "http://ex/q", "6", XSD + "int", ""),
        ("http://ex/c", "http://ex/p", "x1", "", ""),
        ("http://ex/c", "http://ex/q", "x1", "", ""),
    ]
    q = """
    SELECT ?s WHERE {
      ?s <http://ex/p> ?a . ?s <http://ex/q> ?b . FILTER(?a = ?b)
    }
    """
    got = {r["s"] for r in sparql_select(_typed_triples(rows), q).take_all()}
    # a: value-equal numerics; c: lexically equal strings; b: unequal
    assert got == {"http://ex/a", "http://ex/c"}


@pytest.mark.usefixtures("ray_session")
def test_lang_datatype_isiri_functions():
    from jena_ray.model import KIND_IRI

    rows = [
        ("http://ex/a", "http://ex/label", "hello", "", "en"),
        ("http://ex/a", "http://ex/label", "bonjour", "", "fr-BE"),
        ("http://ex/a", "http://ex/count", "3", XSD + "integer", ""),
        ("http://ex/a", "http://ex/link", "http://ex/b", "", "", KIND_IRI),
    ]
    ds = _typed_triples(rows)
    q1 = 'SELECT ?v WHERE { ?s ?p ?v . FILTER(LANG(?v) = "en") }'
    assert [r["v"] for r in sparql_select(ds, q1).take_all()] == ["hello"]
    q2 = ('SELECT ?v WHERE { ?s ?p ?v . '
          'FILTER(DATATYPE(?v) = <http://www.w3.org/2001/XMLSchema#integer>) }')
    assert [r["v"] for r in sparql_select(ds, q2).take_all()] == ["3"]
    q3 = 'SELECT ?v WHERE { ?s ?p ?v . FILTER(ISIRI(?v)) }'
    assert [r["v"] for r in sparql_select(ds, q3).take_all()] == ["http://ex/b"]
    q4 = 'SELECT ?v WHERE { ?s ?p ?v . FILTER(LANGMATCHES(LANG(?v), "fr")) }'
    assert [r["v"] for r in sparql_select(ds, q4).take_all()] == ["bonjour"]
    q5 = 'SELECT ?v WHERE { ?s <http://ex/label> ?v . FILTER(LANGMATCHES(LANG(?v), "*")) }'
    assert {r["v"] for r in sparql_select(ds, q5).take_all()} == {"hello", "bonjour"}


@pytest.mark.usefixtures("ray_session")
def test_term_order_by_numeric_value_not_lexical():
    """ORDER BY over xsd:integer literals sorts by VALUE: 2 < 10 < 100
    even though lexically "10" < "100" < "2" (BindingComparator)."""
    rows = [
        ("http://ex/a", "http://ex/n", "10", XSD + "integer", ""),
        ("http://ex/b", "http://ex/n", "2", XSD + "integer", ""),
        ("http://ex/c", "http://ex/n", "100", XSD + "integer", ""),
    ]
    q = "SELECT ?s ?v WHERE { ?s <http://ex/n> ?v } ORDER BY ?v"
    got = [r["v"] for r in sparql_select(_typed_triples(rows), q).take_all()]
    assert got == ["2", "10", "100"]
    q2 = "SELECT ?s ?v WHERE { ?s <http://ex/n> ?v } ORDER BY DESC(?v) LIMIT 2"
    got2 = [r["v"] for r in sparql_select(_typed_triples(rows), q2).take_all()]
    assert got2 == ["100", "10"]


@pytest.mark.usefixtures("ray_session")
def test_filter_exists_semi_join():
    """FILTER EXISTS keeps bindings compatible with the inner pattern
    on the shared variables (E_Exists → semi join)."""
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?p ?n WHERE {
      ?p ex:age ?n .
      FILTER EXISTS { ?p ex:knows ?q }
    } ORDER BY ?p
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [(r["p"], r["n"]) for r in rows] == [
        ("http://ex/a", "42"), ("http://ex/b", "7"),
    ]


@pytest.mark.usefixtures("ray_session")
def test_filter_not_exists_anti_join():
    """FILTER NOT EXISTS drops compatible bindings (E_NotExists)."""
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?p WHERE {
      ?p ex:age ?n .
      FILTER NOT EXISTS { ?p ex:knows ?q }
    }
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [r["p"] for r in rows] == ["http://ex/c"]


@pytest.mark.usefixtures("ray_session")
def test_filter_exists_no_shared_vars_gates():
    """With no shared variables the filter gates on the inner pattern's
    non-emptiness — all rows survive or none do."""
    q_hit = """
    PREFIX ex: <http://ex/>
    SELECT ?p WHERE { ?p ex:age ?n . FILTER EXISTS { ?x a ex:Person } }
    """
    assert len(sparql_select(G(ROWS), q_hit).take_all()) == 3
    q_miss = """
    PREFIX ex: <http://ex/>
    SELECT ?p WHERE { ?p ex:age ?n . FILTER EXISTS { ?x a ex:Robot } }
    """
    assert sparql_select(G(ROWS), q_miss).take_all() == []
    q_not = """
    PREFIX ex: <http://ex/>
    SELECT ?p WHERE { ?p ex:age ?n . FILTER NOT EXISTS { ?x a ex:Robot } }
    """
    assert len(sparql_select(G(ROWS), q_not).take_all()) == 3


@pytest.mark.usefixtures("ray_session")
def test_filter_not_exists_constant_pattern():
    """NOT EXISTS over an all-constant pattern gates on that triple's
    presence (needs the row-preserving zero-var binding table)."""
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?p WHERE {
      ?p ex:age ?n . FILTER NOT EXISTS { ex:a ex:knows ex:b }
    }
    """
    assert sparql_select(G(ROWS), q).take_all() == []


@pytest.mark.usefixtures("ray_session")
def test_arithmetic_and_select_expr():
    """E_Add/E_Multiply + SELECT (expr AS ?v) projection expressions."""
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?p (?n * 2 + 1 AS ?m) WHERE { ?p ex:age ?n } ORDER BY ?p
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [(r["p"], r["m"]) for r in rows] == [
        ("http://ex/a", "85"), ("http://ex/b", "15"), ("http://ex/c", "39"),
    ]
    q2 = """
    PREFIX ex: <http://ex/>
    SELECT ?p WHERE { ?p ex:age ?n . FILTER(?n - 50 > -10) }
    """
    assert [r["p"] for r in sparql_select(G(ROWS), q2).take_all()] == [
        "http://ex/a"
    ]


@pytest.mark.usefixtures("ray_session")
def test_string_builtins():
    """UCASE/LCASE/CONCAT/SUBSTR/REPLACE/STRBEFORE/STRAFTER (E_Str*)."""
    rows = [("http://ex/a", "http://ex/name", "Alice Smith")]
    q = """
    SELECT ?u ?c ?sub ?rep ?bef ?aft WHERE {
      ?s <http://ex/name> ?v .
      BIND(UCASE(?v) AS ?u)
      BIND(CONCAT("x-", LCASE(?v)) AS ?c)
      BIND(SUBSTR(?v, 7) AS ?sub)
      BIND(REPLACE(?v, "([A-Z])", "_$1") AS ?rep)
      BIND(STRBEFORE(?v, " ") AS ?bef)
      BIND(STRAFTER(?v, " ") AS ?aft)
    }
    """
    r = sparql_select(G(rows), q).take_all()[0]
    assert r == {"u": "ALICE SMITH", "c": "x-alice smith", "sub": "Smith",
                 "rep": "_Alice _Smith", "bef": "Alice", "aft": "Smith"}


@pytest.mark.usefixtures("ray_session")
def test_strbefore_strafter_absent_and_empty_arg():
    """Spec edge cases: separator absent → "", STRAFTER(x, "") → x."""
    rows = [("http://ex/a", "http://ex/name", "abc")]
    q = """
    SELECT ?bef ?aft ?bempty ?aempty WHERE {
      ?s <http://ex/name> ?v .
      BIND(STRBEFORE(?v, "-") AS ?bef)
      BIND(STRAFTER(?v, "-") AS ?aft)
      BIND(STRBEFORE(?v, "") AS ?bempty)
      BIND(STRAFTER(?v, "") AS ?aempty)
    }
    """
    r = sparql_select(G(rows), q).take_all()[0]
    assert r == {"bef": "", "aft": "", "bempty": "", "aempty": "abc"}


@pytest.mark.usefixtures("ray_session")
def test_coalesce_and_if():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?p ?cls WHERE {
      ?p ex:age ?n .
      BIND(IF(?n > 18, "adult", "minor") AS ?cls)
    } ORDER BY ?p
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [r["cls"] for r in rows] == ["adult", "minor", "adult"]
    q2 = """
    PREFIX ex: <http://ex/>
    SELECT ?p ?x WHERE {
      ?p ex:age ?n .
      OPTIONAL { ?p ex:knows ?k }
      BIND(COALESCE(?k, "nobody") AS ?x)
    } ORDER BY ?p
    """
    rows2 = sparql_select(G(ROWS), q2).take_all()
    assert [r["x"] for r in rows2] == [
        "http://ex/b", "http://ex/c", "nobody",
    ]


@pytest.mark.usefixtures("ray_session")
def test_in_and_not_in():
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?p WHERE { ?p ex:age ?n . FILTER(?n IN ("42", "19")) } ORDER BY ?p
    """
    assert [r["p"] for r in sparql_select(G(ROWS), q).take_all()] == [
        "http://ex/a", "http://ex/c",
    ]
    q2 = """
    PREFIX ex: <http://ex/>
    SELECT ?p WHERE { ?p ex:age ?n . FILTER(?n NOT IN ("42", "19")) }
    """
    assert [r["p"] for r in sparql_select(G(ROWS), q2).take_all()] == [
        "http://ex/b"
    ]


@pytest.mark.usefixtures("ray_session")
def test_numeric_builtins_via_select_expr():
    q = """
    PREFIX ex: <http://ex/>
    SELECT (ROUND(2.5) AS ?r) (FLOOR(2.7) AS ?f) (CEIL(2.1) AS ?c)
           (ABS(-3) AS ?a) (STR(7) AS ?s)
    WHERE { <http://ex/a> ex:age ?n }
    """
    r = sparql_select(G(ROWS), q).take_all()[0]
    assert r == {"r": "3", "f": "2", "c": "3", "a": "3", "s": "7"}


@pytest.mark.usefixtures("ray_session")
def test_group_concat_sample_count_distinct():
    rows = [
        ("a", "http://ex/in", "n1"), ("b", "http://ex/in", "n1"),
        ("c", "http://ex/in", "n2"), ("a", "http://ex/in", "n1"),
    ]
    q = """
    SELECT ?nt (GROUP_CONCAT(?m ; SEPARATOR=",") AS ?members)
           (SAMPLE(?m) AS ?one) (COUNT(DISTINCT ?m) AS ?k)
    WHERE { ?m <http://ex/in> ?nt } GROUP BY ?nt ORDER BY ?nt
    """
    got = sparql_select(G(rows), q).take_all()
    assert got == [
        {"nt": "n1", "members": "a,a,b", "one": "a", "k": 2},
        {"nt": "n2", "members": "c", "one": "c", "k": 1},
    ]
    q2 = "SELECT (COUNT(DISTINCT ?nt) AS ?k) WHERE { ?m <http://ex/in> ?nt }"
    assert sparql_select(G(rows), q2).take_all() == [{"k": 2}]


@pytest.mark.usefixtures("ray_session")
def test_path_nested_closure_in_pattern():
    """(knows*|age)+ — a closure inside another closure's step through
    the front door (step re-evaluated seeded per round)."""
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?y WHERE { ex:a (ex:knows*|ex:age)+ ?y } ORDER BY ?y
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [r["y"] for r in rows] == [
        "19", "42", "7", "http://ex/a", "http://ex/b", "http://ex/c",
    ]


@pytest.mark.usefixtures("ray_session")
def test_path_inverse_of_closure_in_pattern():
    """^(knows+) with a constant subject: pushed down to (^knows)+ and
    evaluated seeded from that end."""
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?y WHERE { ex:c ^(ex:knows+) ?y } ORDER BY ?y
    """
    rows = sparql_select(G(ROWS), q).take_all()
    assert [r["y"] for r in rows] == ["http://ex/a", "http://ex/b"]


@pytest.mark.usefixtures("ray_session")
def test_graph_scope_propagates_into_subquery():
    """GRAPH <g> { { SELECT ... } }: the active graph applies inside the
    subquery (SPARQL 1.1 §13.3.1)."""
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?s ?v WHERE {
      GRAPH <http://ex/g1> { { SELECT ?s ?v WHERE { ?s ex:p ?v } } }
    }
    """
    rows = sparql_select(_quads(QROWS), q).take_all()
    assert [(r["s"], r["v"]) for r in rows] == [("http://ex/a", "v2")]


@pytest.mark.usefixtures("ray_session")
def test_graph_var_subquery_aggregates_per_graph():
    """GRAPH ?g { SELECT (COUNT(*) AS ?c) ... }: the subquery evaluates
    once per named graph — the graph var is an implicit group key and
    rides through the projection."""
    q = """
    PREFIX ex: <http://ex/>
    SELECT ?g ?c WHERE {
      GRAPH ?g { { SELECT (COUNT(*) AS ?c) WHERE { ?s ?p ?o } } }
    } ORDER BY ?g
    """
    rows = sparql_select(_quads(QROWS), q).take_all()
    assert [(r["g"], r["c"]) for r in rows] == [
        ("http://ex/g1", 3), ("http://ex/g2", 1),
    ]


@pytest.mark.usefixtures("ray_session")
def test_aggregate_first_projection_expression_unparenthesized():
    """(COUNT(?o) + 1 AS ?c) — aggregate-FIRST projection expression
    without inner parens (ARQ parses this via the full expression
    grammar; the direct-aggregate branch must yield when the aggregate
    is a subexpression)."""
    import ray.data as rd

    from jena_ray.model import KIND_IRI, KIND_LITERAL
    from jena_ray.ops.sparql import sparql_select

    XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
    rows = [
        {"s_kind": KIND_IRI, "s_lex": f"http://e/s{i % 3}", "p": "http://e/p",
         "o_kind": KIND_LITERAL, "o_lex": str(i), "o_datatype": XSD_INT,
         "o_lang": "", "g": ""}
        for i in range(6)
    ]
    ds = rd.from_items(rows)
    got = sparql_select(
        ds,
        "SELECT ?s (COUNT(?o) + 1 AS ?c) WHERE { ?s <http://e/p> ?o } "
        "GROUP BY ?s").take_all()
    assert sorted((r["s"], r["c"]) for r in got) == [
        ("http://e/s0", "3"), ("http://e/s1", "3"), ("http://e/s2", "3")]
    got2 = sparql_select(
        ds, "SELECT (SUM(?o) * 2 AS ?d) WHERE { ?s <http://e/p> ?o }"
    ).take_all()
    assert got2 == [{"d": "30"}]
