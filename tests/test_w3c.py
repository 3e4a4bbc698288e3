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
SUITE_ROOT12 = "/root/reference/jena-arq/testing/rdf-tests-cg/rdf/rdf12"


def _read(path):
    # newline="" — universal-newline translation would corrupt literals
    # containing raw CR (literal_with_CARRIAGE_RETURN test)
    with open(path, encoding="utf-8", newline="") as f:
        return f.read()


def _load(suite, root=SUITE_ROOT):
    path = os.path.join(root, suite, "manifest.ttl")
    if not os.path.exists(path):
        pytest.skip(f"suite not present: {path}")
    return read_manifest(path)


XFAIL: set = set()


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
    elif test.kind == "c14n":
        from jena_ray.rdf.ntriples import format_triple

        triples = _parse_any(test)
        ours = "".join(
            format_triple(*t, c14n=True) + "\n" for t in triples
        )
        assert ours == _read(test.result), f"{test.name}: c14n mismatch"
    else:
        pytest.skip(f"unhandled kind {test.kind}")


def pytest_generate_tests(metafunc):
    for fixture, suite, root in [
        ("nt_test", "rdf-n-triples", SUITE_ROOT),
        ("ttl_test", "rdf-turtle", SUITE_ROOT),
        ("nq_test", "rdf-n-quads", SUITE_ROOT),
        ("trig_test", "rdf-trig", SUITE_ROOT),
        ("xml_test", "rdf-xml", SUITE_ROOT),
        ("nt12_syn_test", "rdf-n-triples/syntax", SUITE_ROOT12),
        ("nt12_c14n_test", "rdf-n-triples/c14n", SUITE_ROOT12),
        ("nq12_syn_test", "rdf-n-quads/syntax", SUITE_ROOT12),
        ("nq12_c14n_test", "rdf-n-quads/c14n", SUITE_ROOT12),
        ("ttl12_syn_test", "rdf-turtle/syntax", SUITE_ROOT12),
        ("ttl12_eval_test", "rdf-turtle/eval", SUITE_ROOT12),
        ("trig12_syn_test", "rdf-trig/syntax", SUITE_ROOT12),
        ("trig12_eval_test", "rdf-trig/eval", SUITE_ROOT12),
        ("xml12_test", "rdf-xml/eval", SUITE_ROOT12),
    ]:
        if fixture in metafunc.fixturenames:
            tests = _load(suite, root)
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


def test_rdf12_ntriples_syntax(nt12_syn_test):
    _run_one(nt12_syn_test)


def test_rdf12_ntriples_c14n(nt12_c14n_test):
    _run_one(nt12_c14n_test)


def test_rdf12_nquads_syntax(nq12_syn_test):
    _run_one(nq12_syn_test)


def test_rdf12_nquads_c14n(nq12_c14n_test):
    _run_one(nq12_c14n_test)


def test_rdf12_turtle_syntax(ttl12_syn_test):
    _run_one(ttl12_syn_test)


def test_rdf12_turtle_eval(ttl12_eval_test):
    _run_one(ttl12_eval_test)


def test_rdf12_trig_syntax(trig12_syn_test):
    _run_one(trig12_syn_test)


def test_rdf12_trig_eval(trig12_eval_test):
    _run_one(trig12_eval_test)


def test_rdf12_rdfxml(xml12_test):
    _run_one(xml12_test)
