"""Turtle parser unit tests."""

import pytest

from jena_ray.model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_FIRST,
    RDF_LANGSTRING,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_NS,
    XSD_STRING,
    RDFParseError,
)
from jena_ray.rdf.turtle import parse_turtle


def triples(text, base=""):
    return parse_turtle(text, base=base)


def test_prefix_and_pname():
    out = triples("@prefix ex: <http://e/> . ex:s ex:p ex:o .")
    assert out == [(KIND_IRI, "http://e/s", "http://e/p", KIND_IRI, "http://e/o", "", "", "")]


def test_sparql_style_directives():
    out = triples("PREFIX ex: <http://e/>\nex:s ex:p ex:o .")
    assert out[0][1] == "http://e/s"


def test_a_keyword_and_lists():
    out = triples("@prefix ex: <http://e/> . ex:s a ex:T ; ex:p ex:o1 , ex:o2 .")
    assert out[0][2] == RDF_TYPE
    assert [t[4] for t in out] == ["http://e/T", "http://e/o1", "http://e/o2"]
    assert all(t[1] == "http://e/s" for t in out)


def test_numeric_boolean_shorthand():
    out = triples("@prefix ex: <http://e/> . ex:s ex:p 42, 4.2, 4.2e1, true .")
    dts = [(t[4], t[5]) for t in out]
    assert dts == [
        ("42", XSD_NS + "integer"),
        ("4.2", XSD_NS + "decimal"),
        ("4.2e1", XSD_NS + "double"),
        ("true", XSD_NS + "boolean"),
    ]


def test_base_resolution():
    out = triples("@base <http://e/dir/> . <s> <p> <../x> .")
    assert out[0][1] == "http://e/dir/s"
    assert out[0][4] == "http://e/x"


def test_external_base():
    out = triples("<s> <p> <o> .", base="http://host/a/")
    assert out[0][1] == "http://host/a/s"


def test_relative_no_base_errors():
    with pytest.raises(RDFParseError):
        triples("<s> <p> <o> .")


def test_bnode_property_list():
    out = triples("@prefix ex: <http://e/> . ex:s ex:p [ ex:q ex:o ] .")
    assert len(out) == 2
    inner = [t for t in out if t[2] == "http://e/q"][0]
    outer = [t for t in out if t[2] == "http://e/p"][0]
    assert inner[0] == KIND_BNODE and outer[3] == KIND_BNODE
    assert inner[1] == outer[4]  # same bnode


def test_bnode_subject_property_list():
    out = triples("@prefix ex: <http://e/> . [ ex:p ex:o ] ex:q ex:r .")
    assert len(out) == 2
    assert out[0][1] == out[1][1]


def test_collection():
    out = triples("@prefix ex: <http://e/> . ex:s ex:p (ex:a ex:b) .")
    firsts = [t for t in out if t[2] == RDF_FIRST]
    rests = [t for t in out if t[2] == RDF_REST]
    assert [t[4] for t in firsts] == ["http://e/a", "http://e/b"]  # list order
    assert rests[-1][4] == RDF_NIL
    link = [t for t in out if t[2] == "http://e/p"][0]
    assert link[4] == firsts[0][1]  # points at first cell


def test_empty_collection():
    out = triples("@prefix ex: <http://e/> . ex:s ex:p () .")
    assert out[0][3:5] == (KIND_IRI, RDF_NIL)


def test_string_forms_and_langtag():
    text = """@prefix ex: <http://e/> .
ex:s ex:p "double", 'single', \"\"\"long
"quoted" text\"\"\", '''x''' , "fr"@fr-BE .
"""
    out = triples(text)
    lex = [t[4] for t in out]
    assert lex == ["double", "single", 'long\n"quoted" text', "x", "fr"]
    assert out[-1][5:7] == (RDF_LANGSTRING, "fr-BE")


def test_typed_literal_pname_datatype():
    out = triples(
        '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n'
        '@prefix ex: <http://e/> . ex:s ex:p "5"^^xsd:int .'
    )
    assert out[0][5] == XSD_NS + "int"


def test_positional_prefix_redefinition():
    text = """@prefix ex: <http://one/> .
ex:s ex:p ex:o .
@prefix ex: <http://two/> .
ex:s ex:p ex:o .
"""
    out = triples(text)
    assert out[0][1] == "http://one/s"
    assert out[1][1] == "http://two/s"


def test_anon_bnode():
    out = triples("@prefix ex: <http://e/> . ex:s ex:p [] .")
    assert out[0][3] == KIND_BNODE


def test_undefined_prefix_errors():
    with pytest.raises(RDFParseError):
        triples("ex:s ex:p ex:o .")


def test_nested_structures():
    text = """@prefix ex: <http://e/> .
ex:s ex:p [ ex:q (1 2 [ ex:r true ]) ] ."""
    out = triples(text)
    assert len(out) == 9  # 1 outer + 1 q + 3 cells*2 + 1 r
    assert {t[2] for t in out} >= {RDF_FIRST, RDF_REST, "http://e/q", "http://e/r"}


def test_skip_mode():
    assert parse_turtle("this is not turtle", on_error="skip") == []


@pytest.mark.parametrize("i", ["01", "02", "03"])
def test_riot_turtle2_stress(i):
    """RIOT Lang/Turtle2 stress fixtures: 10k statements / one 10k-object
    list / one 10k-item predicateObjectList (the reference uses these to
    exceed the default Bison stack; here they pin the tokenizer and the
    non-recursive list handling at depth)."""
    from jena_ray.rdf.ntriples import parse_ntriples
    from jena_ray.rdf.turtle import parse_turtle

    base = "/root/reference/jena-arq/testing/RIOT/Lang/Turtle2/turtle-eval-extra-"
    got = parse_turtle(open(base + i + ".ttl").read())
    want = parse_ntriples(open(base + i + ".nt").read())
    assert len(got) == 10000
    assert set(got) == set(want)
