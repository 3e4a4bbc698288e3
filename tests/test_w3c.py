"""W3C RDF 1.1 conformance suites, manifest-driven.

Runs the reference's vendored corpora (read-only) through our parsers:
- N-Triples: 70 tests, rdf-tests-cg/rdf/rdf11/rdf-n-triples/manifest.ttl
- Turtle: 313 tests, rdf-tests-cg/rdf/rdf11/rdf-turtle/manifest.ttl
Eval tests compare by bnode-bijection isomorphism (IsoAlgTuple port).

Pure-Python (no Ray session needed).
"""

import os

import pytest

from jena_ray.model import RDFParseError
from jena_ray.rdf.iso import graph_iso
from jena_ray.rdf.ntriples import parse_ntriples
from jena_ray.rdf.turtle import parse_turtle
from jena_ray.rdf.w3c import read_manifest

SUITE_ROOT = "/root/reference/jena-arq/testing/rdf-tests-cg/rdf/rdf11"


def _read(path):
    # newline="" — universal-newline translation would corrupt literals
    # containing raw CR (literal_with_CARRIAGE_RETURN test)
    with open(path, encoding="utf-8", newline="") as f:
        return f.read()


def _load(suite):
    path = os.path.join(SUITE_ROOT, suite, "manifest.ttl")
    if not os.path.exists(path):
        pytest.skip(f"suite not present: {path}")
    return read_manifest(path)


# parseType="Literal" exclusive-canonical-XML serialization is not
# implemented (the XML literal is preserved verbatim, not c14n'd)
XFAIL = {"xml-canon-test001", "xml-canon-test002"}


def _parse_any(test):
    text = _read(test.action)
    if test.action.endswith(".ttl"):
        return parse_turtle(text, base=test.base_iri)
    if test.action.endswith(".trig"):
        from jena_ray.rdf.turtle import parse_trig

        return parse_trig(text, base=test.base_iri)
    if test.action.endswith(".rdf"):
        from jena_ray.rdf.rdfxml import parse_rdfxml

        return parse_rdfxml(text, base=test.base_iri)
    return parse_ntriples(text, quads=test.action.endswith(".nq"))


def _run_one(test):
    if test.name in XFAIL:
        pytest.xfail("exclusive canonical XML (c14n) not implemented")
    if test.kind == "positive":
        _parse_any(test)
    elif test.kind in ("negative", "negative-eval"):
        with pytest.raises((RDFParseError, Exception)):
            _parse_any(test)
    elif test.kind == "eval":
        got = _parse_any(test)
        golden = parse_ntriples(_read(test.result), quads=test.result.endswith(".nq"))
        assert graph_iso(got, golden), f"{test.name}: graph not isomorphic to golden"
    else:
        pytest.skip(f"unhandled kind {test.kind}")


def pytest_generate_tests(metafunc):
    for fixture, suite in [
        ("nt_test", "rdf-n-triples"),
        ("ttl_test", "rdf-turtle"),
        ("nq_test", "rdf-n-quads"),
        ("trig_test", "rdf-trig"),
        ("xml_test", "rdf-xml"),
    ]:
        if fixture in metafunc.fixturenames:
            tests = _load(suite)
            metafunc.parametrize(fixture, tests, ids=[t.name for t in tests])


def test_ntriples_suite(nt_test):
    _run_one(nt_test)


def test_turtle_suite(ttl_test):
    _run_one(ttl_test)


def test_nquads_suite(nq_test):
    _run_one(nq_test)


def test_trig_suite(trig_test):
    _run_one(trig_test)


def test_rdfxml_suite(xml_test):
    _run_one(xml_test)
