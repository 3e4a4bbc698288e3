"""JSON-LD subset reader tests."""

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
    RDFParseError,
)
from jena_ray.rdf.jsonld import parse_jsonld


def test_basic_node():
    doc = """{
      "@context": {"ex": "http://e/", "name": "http://e/name"},
      "@id": "http://e/alice",
      "@type": "ex:Person",
      "name": "Alice",
      "ex:age": 30
    }"""
    out = parse_jsonld(doc)
    trip = {(t[1], t[2], t[4], t[5]) for t in out}
    assert ("http://e/alice", RDF_TYPE, "http://e/Person", "") in trip
    assert ("http://e/alice", "http://e/name", "Alice", XSD_NS + "string") in trip
    assert ("http://e/alice", "http://e/age", "30", XSD_NS + "integer") in trip


def test_vocab_and_language():
    doc = """{
      "@context": {"@vocab": "http://v/", "@language": "fr"},
      "@id": "http://e/x",
      "label": "chat"
    }"""
    (t,) = parse_jsonld(doc)
    assert t[2] == "http://v/label"
    assert t[5:7] == (RDF_LANGSTRING, "fr")


def test_id_coercion_and_nested():
    doc = """{
      "@context": {"knows": {"@id": "http://e/knows", "@type": "@id"}},
      "@id": "http://e/a",
      "knows": ["http://e/b", {"@id": "http://e/c", "http://e/name": "C"}]
    }"""
    out = parse_jsonld(doc)
    objs = {t[4] for t in out if t[2] == "http://e/knows"}
    assert objs == {"http://e/b", "http://e/c"}
    assert any(t[1] == "http://e/c" and t[4] == "C" for t in out)


def test_value_object_and_typed():
    doc = """{
      "@id": "http://e/x",
      "http://e/when": {"@value": "2020-01-01", "@type": "http://www.w3.org/2001/XMLSchema#date"},
      "http://e/note": {"@value": "hi", "@language": "en"}
    }"""
    out = parse_jsonld(doc)
    dts = {(t[2], t[5]) for t in out}
    assert ("http://e/when", XSD_NS + "date") in dts
    assert ("http://e/note", RDF_LANGSTRING) in dts


def test_list_container():
    doc = """{
      "@context": {"items": {"@id": "http://e/items", "@container": "@list"}},
      "@id": "http://e/x",
      "items": [1, 2]
    }"""
    out = parse_jsonld(doc)
    firsts = [t for t in out if t[2] == RDF_FIRST]
    rests = [t for t in out if t[2] == RDF_REST]
    assert [t[4] for t in firsts] == ["1", "2"]
    assert rests[-1][4] == RDF_NIL


def test_graph_and_bnodes():
    doc = """{
      "@graph": [
        {"@id": "_:b0", "http://e/p": {"http://e/q": "inner"}},
        {"@id": "http://e/g", "@graph": [{"@id": "http://e/s", "http://e/p": "x"}]}
      ]
    }"""
    out = parse_jsonld(doc)
    assert any(t[0] == KIND_BNODE and t[1] == "b0" for t in out)
    named = [t for t in out if t[7] == "http://e/g"]
    assert len(named) == 1 and named[0][1] == "http://e/s"


def test_base_resolution():
    out = parse_jsonld('{"@id": "rel", "http://e/p": "v"}', base="http://host/dir/")
    assert out[0][1] == "http://host/dir/rel"


def test_remote_context_rejected():
    with pytest.raises(RDFParseError):
        parse_jsonld('{"@context": "http://schema.org/", "@id": "http://e/x"}')
    assert parse_jsonld(
        '{"@context": "http://schema.org/"}', on_error="skip"
    ) == []


def test_bad_json():
    with pytest.raises(RDFParseError):
        parse_jsonld("{not json")


# --- RIOT vendored corpora (jena-arq/testing/RIOT/jsonld{,11}) -----------

RIOT = "/root/reference/jena-arq/testing/RIOT"


@pytest.mark.parametrize("name,golden,gparse", [
    ("graph1", "graph1.ttl", "turtle"),
    ("graph2", "graph2.ttl", "turtle"),
    ("dataset1", "dataset1.trig", "trig"),
])
def test_riot_jsonld_goldens(name, golden, gparse):
    """The reference's RIOT JSON-LD documents parse graph-isomorphic to
    their Turtle/TriG goldens (TestJsonLDReader fixtures)."""
    from jena_ray.rdf.iso import graph_iso
    from jena_ray.rdf.turtle import parse_trig, parse_turtle

    doc = open(f"{RIOT}/jsonld/{name}.jsonld").read()
    got = parse_jsonld(doc)
    gold_text = open(f"{RIOT}/jsonld/{golden}").read()
    want = parse_turtle(gold_text) if gparse == "turtle" else parse_trig(gold_text)
    assert graph_iso(sorted(got), sorted(want))


def test_riot_jsonld11_docs():
    """JSON-LD 1.1 sample docs (@version 1.1, @vocab, typed term maps,
    array-of-contexts)."""
    doc1 = open(f"{RIOT}/jsonld11/doc-1.jsonld11").read()
    out = parse_jsonld(doc1)
    assert out == [
        (KIND_IRI, "http://example/s", "http://example/p",
         KIND_LITERAL, "123", XSD_NS + "integer", "", "")
    ]
    for name, want_o in (
        ("doc-2", "http://twitter.com/"),
        ("doc-3", "http://twitter.com/picture"),  # chained contexts
    ):
        (t,) = parse_jsonld(open(f"{RIOT}/jsonld11/{name}.jsonld11").read())
        assert t[0] == KIND_BNODE
        assert t[2] == "http://xmlns.com/foaf/0.1/depication"
        assert t[4] == want_o


# --- JSON-LD 1.1 features added round 4 ---------------------------------


def test_reverse_node_and_term():
    doc = """{
      "@context": {"children": {"@reverse": "http://e/parent"}},
      "@id": "http://e/mom",
      "children": [{"@id": "http://e/kid1"}, "http://e/kid2"],
      "@reverse": {"http://e/boss": {"@id": "http://e/worker"}}
    }"""
    out = parse_jsonld(doc)
    trip = {(t[1], t[2], t[4]) for t in out}
    assert ("http://e/kid1", "http://e/parent", "http://e/mom") in trip
    assert ("http://e/kid2", "http://e/parent", "http://e/mom") in trip
    assert ("http://e/worker", "http://e/boss", "http://e/mom") in trip


def test_nest_and_included():
    doc = """{
      "@context": {"@vocab": "http://v/", "meta": "@nest"},
      "@id": "http://e/x",
      "meta": {"a": "1", "b": "2"},
      "@included": [{"@id": "http://e/y", "c": "3"}]
    }"""
    out = parse_jsonld(doc)
    trip = {(t[1], t[2], t[4]) for t in out}
    assert ("http://e/x", "http://v/a", "1") in trip
    assert ("http://e/x", "http://v/b", "2") in trip
    assert ("http://e/y", "http://v/c", "3") in trip


def test_language_map():
    doc = """{
      "@context": {"label": {"@id": "http://e/label", "@container": "@language"}},
      "@id": "http://e/x",
      "label": {"en": "cat", "fr": ["chat", "minou"], "@none": "plain"}
    }"""
    out = parse_jsonld(doc)
    tagged = {(t[4], t[6]) for t in out}
    assert tagged == {("cat", "en"), ("chat", "fr"), ("minou", "fr"), ("plain", "")}


def test_index_id_type_maps():
    doc = """{
      "@context": {
        "byidx": {"@id": "http://e/p", "@container": "@index"},
        "byid": {"@id": "http://e/q", "@container": "@id"},
        "bytype": {"@id": "http://e/r", "@container": "@type"}
      },
      "@id": "http://e/x",
      "byidx": {"i1": "a", "i2": ["b"]},
      "byid": {"http://e/n1": {"http://e/v": "1"}},
      "bytype": {"http://e/T": {"@id": "http://e/n2"}}
    }"""
    out = parse_jsonld(doc)
    trip = {(t[1], t[2], t[4]) for t in out}
    assert ("http://e/x", "http://e/p", "a") in trip
    assert ("http://e/x", "http://e/p", "b") in trip
    assert ("http://e/x", "http://e/q", "http://e/n1") in trip
    assert ("http://e/n1", "http://e/v", "1") in trip
    assert ("http://e/x", "http://e/r", "http://e/n2") in trip
    from jena_ray.model import RDF_TYPE
    assert ("http://e/n2", RDF_TYPE, "http://e/T") in trip


def test_json_literal():
    from jena_ray.rdf.jsonld import RDF_JSON

    doc = """{
      "@context": {"data": {"@id": "http://e/data", "@type": "@json"}},
      "@id": "http://e/x",
      "data": {"b": 2, "a": [1, true, null]}
    }"""
    (t,) = parse_jsonld(doc)
    assert t[5] == RDF_JSON
    assert t[4] == '{"a":[1,true,null],"b":2}'  # canonical: sorted, minimal
    # value-object form
    doc2 = ('{"@id": "http://e/x", "http://e/d": '
            '{"@value": [3, 2], "@type": "@json"}}')
    (t2,) = parse_jsonld(doc2)
    assert (t2[4], t2[5]) == ("[3,2]", RDF_JSON)


def test_term_scoped_context():
    doc = """{
      "@context": {
        "@vocab": "http://v/",
        "detail": {"@id": "http://e/detail",
                   "@context": {"@vocab": "http://inner/"}}
      },
      "@id": "http://e/x",
      "detail": {"p": "1"},
      "other": "2"
    }"""
    out = parse_jsonld(doc)
    trip = {(t[2], t[4]) for t in out}
    assert ("http://inner/p", "1") in trip     # scoped @vocab applies inside
    assert ("http://v/other", "2") in trip     # outer @vocab elsewhere
