"""SHACL-core validation stage tests."""

import pyarrow as pa
import pytest

from jena_ray.model import TRIPLE_SCHEMA
from jena_ray.stages.shacl import parse_shapes, validate

SHAPES = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://e/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:PersonShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ; sh:maxCount 1 ;
                sh:datatype xsd:string ] ;
  sh:property [ sh:path ex:age ; sh:datatype xsd:integer ;
                sh:minInclusive 0 ; sh:maxInclusive 150 ] ;
  sh:property [ sh:path ex:knows ; sh:nodeKind sh:IRI ] .
"""


def _data(rows):
    cols = {name: [] for name in TRIPLE_SCHEMA.names}
    for (s, p, o_kind, o_lex, o_dt) in rows:
        cols["s_kind"].append(0)
        cols["s_lex"].append(s)
        cols["p"].append(p)
        cols["o_kind"].append(o_kind)
        cols["o_lex"].append(o_lex)
        cols["o_datatype"].append(o_dt)
        cols["o_lang"].append("")
        cols["g"].append("")
        cols["doc_id"].append("d")
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
    )


E = "http://e/"
XSD = "http://www.w3.org/2001/XMLSchema#"
TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def test_parse_shapes():
    shapes = parse_shapes(SHAPES)
    assert len(shapes) == 1
    s = shapes[0]
    assert s.target_classes == [E + "Person"]
    assert len(s.properties) == 3
    by_path = {p.path: p for p in s.properties}
    assert by_path[E + "name"].min_count == 1
    assert by_path[E + "age"].max_inclusive == ("150", "http://www.w3.org/2001/XMLSchema#integer")


@pytest.mark.usefixtures("ray_session")
def test_validate():
    import ray.data as rd

    data = _data([
        # alice: valid
        (E + "alice", TYPE, 0, E + "Person", ""),
        (E + "alice", E + "name", 2, "Alice", XSD + "string"),
        (E + "alice", E + "age", 2, "30", XSD + "integer"),
        (E + "alice", E + "knows", 0, E + "bob", ""),
        # bob: missing name, bad age range + literal knows
        (E + "bob", TYPE, 0, E + "Person", ""),
        (E + "bob", E + "age", 2, "500", XSD + "integer"),
        (E + "bob", E + "knows", 2, "carol", XSD + "string"),
        # carol: not a Person → exempt
        (E + "carol", E + "age", 2, "-5", XSD + "integer"),
    ])
    report = validate(rd.from_arrow(data), SHAPES).take_all()
    by_focus = {}
    for r in report:
        by_focus.setdefault(r["focus"], set()).add(r["constraint"])
    assert E + "alice" not in by_focus
    assert by_focus[E + "bob"] == {"minCount", "maxInclusive", "nodeKind"}
    assert E + "carol" not in by_focus


BOOL_SHAPES = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://e/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:ThingShape a sh:NodeShape ;
  sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:id ;
                sh:or ( [ sh:datatype xsd:integer ]
                        [ sh:datatype xsd:string ] ) ] ;
  sh:property [ sh:path ex:tag ;
                sh:not [ sh:pattern "^bad" ] ] ;
  sh:property [ sh:path ex:score ;
                sh:and ( [ sh:datatype xsd:integer ]
                         [ sh:minInclusive 0 ] ) ] ;
  sh:property [ sh:path ex:owner ; sh:class ex:Agent ] .
"""


def test_parse_boolean_shapes():
    shapes = parse_shapes(BOOL_SHAPES)
    assert len(shapes) == 1
    by_path = {p.path: p for p in shapes[0].properties}
    assert len(by_path[E + "id"].ors[0]) == 2
    assert by_path[E + "id"].ors[0][0].datatype == XSD + "integer"
    assert by_path[E + "tag"].nots[0].pattern == "^bad"
    assert len(by_path[E + "score"].ands[0]) == 2
    assert by_path[E + "owner"].clss == [E + "Agent"]


@pytest.mark.usefixtures("ray_session")
def test_validate_boolean_and_class():
    """sh:or / sh:and / sh:not value composition + cross-node sh:class
    with rdfs:subClassOf closure (jena-shacl ShOr/ShAnd/ShNot,
    ClassConstraint)."""
    import ray.data as rd

    data = _data([
        (E + "t1", TYPE, 0, E + "Thing", ""),
        (E + "t1", E + "id", 2, "7", XSD + "integer"),        # or: ok
        (E + "t1", E + "tag", 2, "good-tag", XSD + "string"),  # not: ok
        (E + "t1", E + "score", 2, "3", XSD + "integer"),      # and: ok
        (E + "t1", E + "owner", 0, E + "alice", ""),           # class via subclass
        (E + "t2", TYPE, 0, E + "Thing", ""),
        (E + "t2", E + "id", 2, "x", XSD + "date"),            # or: FAIL
        (E + "t2", E + "tag", 2, "bad-tag", XSD + "string"),   # not: FAIL
        (E + "t2", E + "score", 2, "-4", XSD + "integer"),     # and: FAIL
        (E + "t2", E + "owner", 0, E + "rock", ""),            # class: FAIL
        # the class extent: alice is a Person, Person ⊑ Agent
        (E + "alice", TYPE, 0, E + "Person", ""),
        (E + "Person", "http://www.w3.org/2000/01/rdf-schema#subClassOf",
         0, E + "Agent", ""),
        (E + "rock", TYPE, 0, E + "Mineral", ""),
    ])
    report = validate(rd.from_arrow(data), BOOL_SHAPES).take_all()
    by_focus = {}
    for r in report:
        by_focus.setdefault(r["focus"], set()).add(r["constraint"])
    assert E + "t1" not in by_focus
    assert by_focus[E + "t2"] == {"or", "not", "and", "class"}


NODE_SHAPES = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://e/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:AddrShape a sh:NodeShape ;
  sh:property [ sh:path ex:city ; sh:minCount 1 ; sh:datatype xsd:string ] .

ex:CompanyShape a sh:NodeShape ;
  sh:targetClass ex:Company ;
  sh:property [ sh:path ex:addr ; sh:node ex:AddrShape ] .
"""


@pytest.mark.usefixtures("ray_session")
def test_validate_sh_node_cross_shape():
    """sh:node re-validates the VALUE node against a referenced shape
    (jena-shacl engine/constraint/ShNode.java) — precomputed verdict
    sets, one distributed pass per referenced shape."""
    import ray.data as rd

    data = _data([
        (E + "c1", TYPE, 0, E + "Company", ""),
        (E + "c1", E + "addr", 0, E + "a1", ""),      # a1 conforms
        (E + "c2", TYPE, 0, E + "Company", ""),
        (E + "c2", E + "addr", 0, E + "a2", ""),      # a2 lacks city
        (E + "c3", TYPE, 0, E + "Company", ""),
        (E + "c3", E + "addr", 0, E + "ghost", ""),   # no triples at all
        (E + "a1", E + "city", 2, "Springfield", XSD + "string"),
        (E + "a2", E + "zip", 2, "12345", XSD + "string"),
    ])
    report = validate(rd.from_arrow(data), NODE_SHAPES).take_all()
    by_focus = {}
    for r in report:
        by_focus.setdefault(r["focus"], set()).add(r["constraint"])
    assert E + "c1" not in by_focus
    assert by_focus[E + "c2"] == {"node"}
    # AddrShape has a minCount, so a value with NO triples fails too
    assert by_focus[E + "c3"] == {"node"}


SPARQL_SHAPES = '''
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://e/> .

ex:prefixes sh:declare [ sh:prefix "ex" ; sh:namespace "http://e/" ] .

ex:AccountShape a sh:NodeShape ;
  sh:targetClass ex:Account ;
  sh:sparql [
    a sh:SPARQLConstraint ;
    sh:message "negative balance" ;
    sh:prefixes ex:prefixes ;
    sh:select """
      SELECT $this ?value WHERE {
        $this ex:balance ?value .
        FILTER(?value < 0)
      }
    """ ;
  ] ;
  sh:sparql [
    sh:message "deactivated never fires" ;
    sh:deactivated true ;
    sh:select "SELECT $this WHERE { $this ?p ?o }" ;
  ] .
'''


def test_parse_sparql_constraint():
    shapes = parse_shapes(SPARQL_SHAPES)
    (s,) = [sh for sh in shapes if sh.sparql]
    assert len(s.sparql) == 1  # deactivated one dropped
    sc = s.sparql[0]
    assert "PREFIX ex: <http://e/>" in sc.query
    assert "?this" in sc.query and "$this" not in sc.query
    assert sc.message == "negative balance"


@pytest.mark.usefixtures("ray_session")
def test_validate_sparql_constraint():
    import ray.data as rd

    data = _data([
        (E + "a1", TYPE, 0, E + "Account", ""),
        (E + "a1", E + "balance", 2, "100", XSD + "integer"),
        (E + "a2", TYPE, 0, E + "Account", ""),
        (E + "a2", E + "balance", 2, "-5", XSD + "integer"),
        # not an Account: same violation pattern but untargeted
        (E + "x1", E + "balance", 2, "-9", XSD + "integer"),
    ])
    report = validate(rd.from_arrow(data), SPARQL_SHAPES).take_all()
    rows = [(r["focus"], r["constraint"], r["detail"]) for r in report]
    assert rows == [(E + "a2", "sparql", "negative balance")]


@pytest.mark.usefixtures("ray_session")
def test_validate_sparql_target_node_and_path():
    import ray.data as rd

    shapes = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://e/> .
    ex:S a sh:NodeShape ;
      sh:targetNode ex:n1, ex:n2 ;
      sh:sparql [ sh:select
        "SELECT ?this WHERE { ?this <http://e/flag> ?v }" ] .
    """
    data = _data([
        (E + "n1", E + "flag", 2, "1", ""),
        (E + "n3", E + "flag", 2, "1", ""),  # untargeted
        (E + "n2", E + "other", 2, "1", ""),  # no match
    ])
    report = validate(rd.from_arrow(data), shapes).take_all()
    assert [(r["focus"], r["constraint"]) for r in report] == [
        (E + "n1", "sparql")
    ]
    assert report[0]["detail"] == "sh:sparql constraint violation"


def _fixture_table(path):
    """Reference SHACL test fixture (shapes == data graph) → triple
    table via the repo's own Turtle parser."""
    from jena_ray.rdf.turtle import parse_turtle

    text = open(path, encoding="utf-8").read()
    cols = {name: [] for name in TRIPLE_SCHEMA.names}
    for (sk, sl, p, ok, ol, od, olang, g) in parse_turtle(
            text, base="file://" + path):
        cols["s_kind"].append(sk)
        cols["s_lex"].append(sl)
        cols["p"].append(p)
        cols["o_kind"].append(ok)
        cols["o_lex"].append(ol)
        cols["o_datatype"].append(od)
        cols["o_lang"].append(olang)
        cols["g"].append(g)
        cols["doc_id"].append("d")
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA],
        schema=TRIPLE_SCHEMA)


COMPONENT_DIR = "/root/reference/jena-shacl/src/test/files/std/sparql/component"
NV = "http://datashapes.org/sh/tests/sparql/component/nodeValidator-001.test#"
PV = "http://datashapes.org/sh/tests/sparql/component/propertyValidator-select-001.test#"


@pytest.mark.usefixtures("ray_session")
def test_component_node_validator_reference_fixture():
    """jena-shacl std/sparql/component/nodeValidator-001.ttl: a
    parameterized component (required + optional param) with a SELECT
    nodeValidator; expected report flags ex:InvalidResource1 only."""
    import ray.data as rd

    path = COMPONENT_DIR + "/nodeValidator-001.ttl"
    shapes_ttl = open(path, encoding="utf-8").read()
    shapes = parse_shapes(shapes_ttl, base="file://" + path)
    (ts,) = [s for s in shapes if s.sparql]
    assert 'ex:property "Value"' in ts.sparql[0].query or \
        '<' + NV + 'property> "Value"' in ts.sparql[0].query
    report = validate(
        rd.from_arrow(_fixture_table(path)), shapes_ttl,
        base="file://" + path).take_all()
    focuses = {r["focus"] for r in report}
    assert focuses == {NV + "InvalidResource1"}


@pytest.mark.usefixtures("ray_session")
def test_component_property_validator_reference_fixture():
    """jena-shacl std/sparql/component/propertyValidator-select-001.ttl:
    $PATH + $lang substitution into a SELECT propertyValidator; expected
    report flags ex:InvalidCountry1 for both label properties."""
    import ray.data as rd

    path = COMPONENT_DIR + "/propertyValidator-select-001.ttl"
    shapes_ttl = open(path, encoding="utf-8").read()
    report = validate(
        rd.from_arrow(_fixture_table(path)), shapes_ttl,
        base="file://" + path).take_all()
    rows = [(r["focus"], r["constraint"]) for r in report]
    assert sorted(rows) == [(PV + "InvalidCountry1", "sparql")] * 2


@pytest.mark.usefixtures("ray_session")
def test_component_ask_validator_reference_fixture():
    """jena-shacl std/sparql/component/validator-001.ttl: a generic
    sh:validator holding sh:ask (SPARQLAskValidator), component typed
    via an rdfs:subClassOf chain; pairs that fail the pre-bound ASK
    body are violations. Expected: "Hallo Welt" only."""
    import ray.data as rd

    path = COMPONENT_DIR + "/validator-001.ttl"
    shapes_ttl = open(path, encoding="utf-8").read()
    report = validate(
        rd.from_arrow(_fixture_table(path)), shapes_ttl,
        base="file://" + path).take_all()
    rows = sorted((r["focus"], r["constraint"]) for r in report)
    assert rows == [("Hallo Welt", "sparql")]


@pytest.mark.usefixtures("ray_session")
def test_component_ask_optional_param_reference_fixture():
    """jena-shacl std/sparql/component/optional-001.ttl: optional
    parameters — a shape missing the MANDATORY parameter is not
    invoked; an absent optional parameter stays an unbound var (the
    validator pairs it with COALESCE). Expected violations per the
    fixture's mf:result: One (TestShape1+TestShape2), Three
    (TestShape1), Two (TestShape2)."""
    import ray.data as rd

    path = COMPONENT_DIR + "/optional-001.ttl"
    shapes_ttl = open(path, encoding="utf-8").read()
    report = validate(
        rd.from_arrow(_fixture_table(path)), shapes_ttl,
        base="file://" + path).take_all()
    focuses = sorted(r["focus"] for r in report)
    assert focuses == ["One", "One", "Three", "Two"]
