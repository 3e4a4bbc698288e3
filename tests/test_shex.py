"""ShEx core subset: ShExC parse, shape maps, per-focus validation."""

import pytest

from jena_ray.model import RDFParseError
from jena_ray.stages.shex import parse_shape_map, parse_shexc, validate_shex

SCHEMA = """
PREFIX ex: <http://ex/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>

<http://ex/PersonShape> {
  a [ <http://ex/Person> ] ;
  ex:name xsd:string ;
  ex:age xsd:integer ? ;
  ex:knows IRI *
}

<http://ex/StrictShape> CLOSED {
  ex:name LITERAL {1,2}
}
"""


def test_parse_shexc():
    s = parse_shexc(SCHEMA)
    ps = s.shapes["http://ex/PersonShape"][1]  # ("shape", Shape)
    tcs = list(ps.expr[1])  # ("each", (tc, ...), 1, 1)
    assert [t[2] for t in tcs] == [
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://ex/name",
        "http://ex/age",
        "http://ex/knows",
    ]
    name = tcs[1]
    assert name[3] == ("nc", ("datatype",
                              "http://www.w3.org/2001/XMLSchema#string"), ())
    assert (name[4], name[5]) == (1, 1)
    age = tcs[2]
    assert (age[4], age[5]) == (0, 1)
    knows = tcs[3]
    assert knows[3] == ("nc", ("kind", "IRI"), ())
    assert (knows[4], knows[5]) == (0, -1)
    strict = s.shapes["http://ex/StrictShape"][1]
    assert strict.closed
    tc0 = strict.expr  # single tc
    assert (tc0[4], tc0[5]) == (1, 2)


def test_parse_shape_map():
    s = parse_shexc(SCHEMA)
    entries = parse_shape_map(
        "{FOCUS a <http://ex/Person>}@<http://ex/PersonShape>\n"
        "<http://ex/bob>@<http://ex/StrictShape>\n",
        s,
    )
    assert entries[0].target_class == "http://ex/Person"
    assert entries[1].node == (0, "http://ex/bob", "", "")
    with pytest.raises(RDFParseError):
        parse_shape_map("<http://ex/x>@<http://ex/Nope>", s)


def _data():
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.model import TRIPLE_SCHEMA

    XSD = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        # alice: conformant Person
        (0, "http://ex/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         0, "http://ex/Person", "", ""),
        (0, "http://ex/alice", "http://ex/name", 2, "Alice", XSD + "string", ""),
        (0, "http://ex/alice", "http://ex/knows", 0, "http://ex/bob", "", ""),
        # bob: Person missing name; StrictShape target with an extra pred
        (0, "http://ex/bob", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         0, "http://ex/Person", "", ""),
        (0, "http://ex/bob", "http://ex/age", 2, "7", XSD + "integer", ""),
    ]
    full = [list(r) + ["", "t"] for r in rows]
    return rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array([fr[i] for fr in full], f.type)
             for i, f in enumerate(TRIPLE_SCHEMA)],
            schema=TRIPLE_SCHEMA,
        )
    )


@pytest.mark.usefixtures("ray_session")
def test_validate_shex():
    report = validate_shex(
        _data(),
        SCHEMA,
        "{FOCUS a <http://ex/Person>}@<http://ex/PersonShape>\n"
        "<http://ex/bob>@<http://ex/StrictShape>\n",
    ).take_all()
    by = {(r["focus"], r["shape"]): r for r in report}
    alice = by[("http://ex/alice", "http://ex/PersonShape")]
    assert alice["status"] == "conformant"
    bob_person = by[("http://ex/bob", "http://ex/PersonShape")]
    assert bob_person["status"] == "nonconformant"
    assert "http://ex/name" in bob_person["reason"]
    bob_strict = by[("http://ex/bob", "http://ex/StrictShape")]
    assert bob_strict["status"] == "nonconformant"
    assert "CLOSED" in bob_strict["reason"]


SCHEMA_REFS = """
PREFIX ex: <http://ex/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>

<http://ex/AddrShape> {
  ex:city xsd:string
}

<http://ex/PersonRefShape> {
  a [ <http://ex/Person> ] ;
  ex:addr @<http://ex/AddrShape>
}
"""


def test_parse_shape_reference():
    s = parse_shexc(SCHEMA_REFS)
    c = s.shapes["http://ex/PersonRefShape"][1].expr[1][1]
    assert c[3] == ("ref", "http://ex/AddrShape")


def _triples(rows):
    """rows: (s, p, o_kind, o_lex, o_dt) with IRI subjects."""
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.model import TRIPLE_SCHEMA

    full = [[0, s, p, ok, ol, dt, "", "", "t"] for (s, p, ok, ol, dt) in rows]
    return rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array([fr[i] for fr in full], f.type)
             for i, f in enumerate(TRIPLE_SCHEMA)],
            schema=TRIPLE_SCHEMA,
        )
    )


RECURSIVE_SCHEMA = """
PREFIX ex: <http://ex/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>

<http://ex/PersonShape> {
  ex:name xsd:string ;
  ex:knows @<http://ex/PersonShape> *
}
"""


@pytest.mark.usefixtures("ray_session")
def test_recursive_shape_cycle_conforms():
    """a knows b, b knows a, both named — the greatest fixpoint keeps the
    cycle conformant (maximal-typing semantics; jena-shex reaches the
    same verdict via its in-progress assumption stack)."""
    XSD = "http://www.w3.org/2001/XMLSchema#"
    E = "http://ex/"
    ds = _triples([
        (E + "a", E + "name", 2, "A", XSD + "string"),
        (E + "a", E + "knows", 0, E + "b", ""),
        (E + "b", E + "name", 2, "B", XSD + "string"),
        (E + "b", E + "knows", 0, E + "a", ""),
    ])
    report = validate_shex(
        ds, RECURSIVE_SCHEMA,
        f"<{E}a>@<{E}PersonShape>\n<{E}b>@<{E}PersonShape>\n",
    ).take_all()
    assert {r["status"] for r in report} == {"conformant"}


@pytest.mark.usefixtures("ray_session")
def test_recursive_failure_propagates():
    """knows-chain a→b→c where c lacks a name: the fixpoint drops c, then
    b (its knows-value fails @PersonShape), then a — 3 iterations."""
    XSD = "http://www.w3.org/2001/XMLSchema#"
    E = "http://ex/"
    ds = _triples([
        (E + "a", E + "name", 2, "A", XSD + "string"),
        (E + "a", E + "knows", 0, E + "b", ""),
        (E + "b", E + "name", 2, "B", XSD + "string"),
        (E + "b", E + "knows", 0, E + "c", ""),
        (E + "c", E + "age", 2, "9", XSD + "integer"),  # subject, no name
    ])
    report = validate_shex(
        ds, RECURSIVE_SCHEMA,
        f"<{E}a>@<{E}PersonShape>\n<{E}b>@<{E}PersonShape>\n"
        f"<{E}c>@<{E}PersonShape>\n",
    ).take_all()
    by = {r["focus"]: r["status"] for r in report}
    assert by == {
        E + "a": "nonconformant",
        E + "b": "nonconformant",
        E + "c": "nonconformant",
    }


@pytest.mark.usefixtures("ray_session")
def test_negated_recursion_rejected():
    s_text = """
    PREFIX ex: <http://ex/>
    <http://ex/A> { ex:p @<http://ex/B> }
    <http://ex/B> NOT @<http://ex/A>
    """
    E = "http://ex/"
    ds = _triples([(E + "x", E + "p", 0, E + "y", "")])
    with pytest.raises(RDFParseError, match="non-stratified"):
        validate_shex(ds, s_text, f"<{E}x>@<{E}A>\n")


@pytest.mark.usefixtures("ray_session")
def test_validate_shape_reference_cross_node():
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.model import TRIPLE_SCHEMA

    XSD = "http://www.w3.org/2001/XMLSchema#"
    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        # ok: person with a conforming address node
        (0, "http://ex/p1", RT, 0, "http://ex/Person", "", ""),
        (0, "http://ex/p1", "http://ex/addr", 0, "http://ex/a1", "", ""),
        (0, "http://ex/a1", "http://ex/city", 2, "Berlin", XSD + "string", ""),
        # bad: person whose address node violates AddrShape (no city)
        (0, "http://ex/p2", RT, 0, "http://ex/Person", "", ""),
        (0, "http://ex/p2", "http://ex/addr", 0, "http://ex/a2", "", ""),
        (0, "http://ex/a2", "http://ex/zip", 2, "10115", XSD + "string", ""),
    ]
    full = [list(r) + ["", "t"] for r in rows]
    ds = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array([fr[i] for fr in full], f.type)
             for i, f in enumerate(TRIPLE_SCHEMA)],
            schema=TRIPLE_SCHEMA,
        )
    )
    report = validate_shex(
        ds, SCHEMA_REFS,
        "{FOCUS a <http://ex/Person>}@<http://ex/PersonRefShape>",
    ).take_all()
    by = {r["focus"]: r for r in report}
    assert by["http://ex/p1"]["status"] == "conformant"
    assert by["http://ex/p2"]["status"] == "nonconformant"
    assert "http://ex/addr" in by["http://ex/p2"]["reason"]


BOOL_SCHEMA = """
PREFIX ex: <http://ex/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
<http://ex/Named> { ex:name xsd:string }
<http://ex/Aged>  { ex:age xsd:integer }
<http://ex/Both>   @<http://ex/Named> AND @<http://ex/Aged>
<http://ex/Either> @<http://ex/Named> OR @<http://ex/Aged>
<http://ex/Anon>   NOT @<http://ex/Named>
<http://ex/Fancy>  (@<http://ex/Named> AND @<http://ex/Aged>) OR NOT { ex:knows IRI + }
"""


def test_parse_boolean_shape_exprs():
    s = parse_shexc(BOOL_SCHEMA)
    assert s.shapes["http://ex/Both"][0] == "and"
    assert s.shapes["http://ex/Either"][0] == "or"
    assert s.shapes["http://ex/Anon"][0] == "not"
    fancy = s.shapes["http://ex/Fancy"]
    assert fancy[0] == "or" and fancy[1][0][0] == "and" and fancy[1][1][0] == "not"


def _bool_data():
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.model import TRIPLE_SCHEMA

    XSD = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        (0, "http://ex/full", "http://ex/name", 2, "F", XSD + "string", ""),
        (0, "http://ex/full", "http://ex/age", 2, "9", XSD + "integer", ""),
        (0, "http://ex/nameonly", "http://ex/name", 2, "N", XSD + "string", ""),
        (0, "http://ex/ageonly", "http://ex/age", 2, "3", XSD + "integer", ""),
        (0, "http://ex/neither", "http://ex/other", 2, "x", XSD + "string", ""),
    ]
    full = [list(r) + ["", "t"] for r in rows]
    return rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array([fr[i] for fr in full], f.type)
             for i, f in enumerate(TRIPLE_SCHEMA)],
            schema=TRIPLE_SCHEMA,
        )
    )


@pytest.mark.usefixtures("ray_session")
def test_validate_boolean_shape_exprs():
    """AND / OR / NOT shape expressions (jena-shex ShapeExprAnd/Or/Not)."""
    nodes = ["full", "nameonly", "ageonly", "neither"]
    shape_map = "\n".join(
        f"<http://ex/{n}>@<http://ex/{s}>"
        for n in nodes
        for s in ("Both", "Either", "Anon")
    )
    report = validate_shex(_bool_data(), BOOL_SCHEMA, shape_map).take_all()
    by = {(r["focus"].rsplit("/", 1)[1], r["shape"].rsplit("/", 1)[1]):
          r["status"] == "conformant" for r in report}
    assert by[("full", "Both")] is True
    assert by[("nameonly", "Both")] is False
    assert by[("full", "Either")] is True
    assert by[("nameonly", "Either")] is True
    assert by[("ageonly", "Either")] is True
    assert by[("neither", "Either")] is False
    assert by[("nameonly", "Anon")] is False
    assert by[("ageonly", "Anon")] is True


def test_boolean_corpus_schemas_parse():
    """Reference jena-shex spec corpus: the boolean-operator schema files
    within the implemented subset parse (string facets / IMPORT /
    inline-shape value expressions remain documented out of subset)."""
    import glob

    base = "/root/reference/jena-shex/src/test/files/spec/schemas"
    files = sorted(
        set(
            glob.glob(f"{base}/*AND*.shex")
            + glob.glob(f"{base}/*NOT*.shex")
            + glob.glob(f"{base}/*OR*.shex")
        )
    )
    if not files:
        pytest.skip("reference corpus absent")
    ok = 0
    for f in files:
        try:
            parse_shexc(open(f, encoding="utf-8").read())
            ok += 1
        except RDFParseError:
            pass
    assert ok >= 29, f"boolean corpus parse count regressed: {ok}"
