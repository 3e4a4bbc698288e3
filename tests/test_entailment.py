"""RDF 1.2 rdf-semantics entailment suite (simple / D / RDF / RDFS /
RDFS-Plus regimes) driven through our entailment checker."""

import os

import pytest

from jena_ray.rdf.entailment import entails
from jena_ray.rdf.turtle import parse_turtle
from jena_ray.rdf.w3c import read_manifest

MANIFEST = (
    "/root/reference/jena-arq/testing/rdf-tests-cg/rdf/rdf12/"
    "rdf-semantics/manifest.ttl"
)

# These two tests' files encode an OLDER draft of annotation-block
# expansion ("test007a2" unfolds {| |} without rdf:reifies), inconsistent
# with the final RDF 1.2 semantics that the rdf12 Turtle eval suite (which
# we pass 29/29) encodes. The suite is rdft:NotClassified / proposed.
XFAIL = {"annotation", "annotation-unfolded"}


def _load():
    if not os.path.exists(MANIFEST):
        pytest.skip("suite not present")
    return read_manifest(MANIFEST)


def pytest_generate_tests(metafunc):
    if "sem_test" in metafunc.fixturenames:
        tests = _load()
        metafunc.parametrize("sem_test", tests, ids=[t.name for t in tests])


def test_semantics_suite(sem_test):
    t = sem_test
    if t.name in XFAIL:
        pytest.xfail("pre-final-draft annotation expansion in suite files")
    if not os.path.exists(t.action) or (t.result and not os.path.exists(t.result)):
        pytest.skip("test file missing from the vendored (proposed) suite")
    prem = parse_turtle(
        open(t.action, encoding="utf-8", newline="").read(), base=t.base_iri
    )
    conc = (
        parse_turtle(
            open(t.result, encoding="utf-8", newline="").read(), base=t.base_iri
        )
        if t.result
        else []
    )
    got = entails(prem, conc, regime=t.regime, recognized=t.recognized)
    want = t.kind == "entail+"
    assert got == want, f"{t.name} ({t.regime}): entails={got}, expected {want}"


def test_simple_entailment_basics():
    # A |= A; A |= subset; bnode generalization
    A = parse_turtle("PREFIX : <http://e/> :s :p :o . :s :q 1 .")
    B = parse_turtle("PREFIX : <http://e/> :s :p _:x .")
    assert entails(A, A)
    assert entails(A, B)
    assert not entails(B, A)


def test_rdf_entailment_property_axiom():
    A = parse_turtle("PREFIX : <http://e/> :s :p :o .")
    B = parse_turtle(
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
        "PREFIX : <http://e/> :p rdf:type rdf:Property ."
    )
    assert entails(A, B, regime="RDF")
    assert not entails(A, B, regime="simple")
