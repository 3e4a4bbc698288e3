"""N-Triples parser/serializer unit tests (no Ray needed)."""

import pytest

from jena_ray.model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_LANGSTRING,
    XSD_STRING,
    RDFParseError,
)
from jena_ray.rdf.ntriples import format_triple, parse_ntriples


def test_basic_triple():
    out = parse_ntriples('<http://a.example/s> <http://a.example/p> <http://a.example/o> .')
    assert out == [
        (KIND_IRI, "http://a.example/s", "http://a.example/p",
         KIND_IRI, "http://a.example/o", "", "", "")
    ]


def test_literal_plain_lang_typed():
    text = """
<http://e/s> <http://e/p> "hello" .
<http://e/s> <http://e/p> "bonjour"@fr-BE .
<http://e/s> <http://e/p> "42"^^<http://www.w3.org/2001/XMLSchema#int> .
"""
    out = parse_ntriples(text)
    assert out[0][3:7] == (KIND_LITERAL, "hello", XSD_STRING, "")
    assert out[1][3:7] == (KIND_LITERAL, "bonjour", RDF_LANGSTRING, "fr-BE")
    assert out[2][3:7] == (KIND_LITERAL, "42", "http://www.w3.org/2001/XMLSchema#int", "")


def test_bnodes_and_comments():
    text = "# comment\n_:b0 <http://e/p> _:b1 . # trailing\n\n"
    out = parse_ntriples(text)
    assert out == [(KIND_BNODE, "b0", "http://e/p", KIND_BNODE, "b1", "", "", "")]


def test_escapes():
    out = parse_ntriples(r'<http://e/s> <http://e/p> "a\tb\n\"q\" é \U0001F600" .')
    assert out[0][4] == 'a\tb\n"q" é \U0001F600'


def test_iri_uchar_escape():
    out = parse_ntriples(r'<http://e/s> <http://e/p> <http://e/o> .')
    assert out[0][1] == "http://e/s"


@pytest.mark.parametrize("bad", [
    '<http://e/s> <http://e/p> .',                       # missing object
    '"lit" <http://e/p> <http://e/o> .',                 # literal subject
    '<http://e/s> _:b <http://e/o> .',                   # bnode predicate
    '<http://e/s> <http://e/p> "x"',                     # missing dot
    '<http://e/s> <http://e/p> "x"^^xsd:int .',          # prefixed name in NT
    r'<http://e/s> <http://e/p> "\x" .',                 # bad escape
    '<http://e/ s> <http://e/p> <http://e/o> .',         # space in IRI
    r'<http://e/s> <http://e/p> "\uD800" .',             # lone surrogate
    '_:-b <http://e/p> <http://e/o> .',                  # bad bnode label (leading '-')
])
def test_negative_syntax(bad):
    with pytest.raises(RDFParseError):
        parse_ntriples(bad)


def test_skip_mode():
    text = 'bad line\n<http://e/s> <http://e/p> <http://e/o> .'
    assert len(parse_ntriples(text, on_error="skip")) == 1


def test_nquads():
    out = parse_ntriples('<http://e/s> <http://e/p> "x" <http://e/g> .', quads=True)
    assert out[0][7] == "http://e/g"
    out = parse_ntriples('<http://e/s> <http://e/p> "x" _:g1 .', quads=True)
    assert out[0][7] == "_:g1"


def test_roundtrip():
    line = '<http://e/s> <http://e/p> "a\\tb \\u00E9"@fr .'
    (t,) = parse_ntriples(line)
    assert format_triple(*t) == '<http://e/s> <http://e/p> "a\\tb é"@fr .'
    # reparse what we formatted
    (t2,) = parse_ntriples(format_triple(*t))
    assert t2 == t


def test_format_escaping():
    s = format_triple(KIND_IRI, "http://e/s", "http://e/p",
                      KIND_LITERAL, 'say "hi"\n', XSD_STRING, "")
    assert s == '<http://e/s> <http://e/p> "say \\"hi\\"\\n" .'
