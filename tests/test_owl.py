"""OWL forward rules (owl-fb.rules fragments): inverseOf, symmetric,
transitive, functional-property equality."""

import pyarrow as pa
import pytest

from jena_ray.model import KIND_IRI, OWL_SAMEAS, RDF_TYPE, TRIPLE_SCHEMA
from jena_ray.stages.owl import (
    OWL_FUNCTIONAL,
    OWL_INV_FUNCTIONAL,
    OWL_INVERSE_OF,
    OWL_SYMMETRIC,
    OWL_TRANSITIVE,
    owl_inference,
)

EX = "http://ex/"


def _schema(*triples):
    return [
        (KIND_IRI, s, p, KIND_IRI, o, "", "", "") for s, p, o in triples
    ]


def _abox(rows):
    import ray.data as rd

    cols = {name: [] for name in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        for name, v in zip(
            TRIPLE_SCHEMA.names,
            [KIND_IRI, s, p, KIND_IRI, o, "", "", "", "t"],
        ):
            cols[name].append(v)
    return rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA],
            schema=TRIPLE_SCHEMA,
        )
    )


def _spo(ds):
    return {(r["s_lex"], r["p"], r["o_lex"]) for r in ds.take_all()}


@pytest.mark.usefixtures("ray_session")
def test_inverse_of_both_directions():
    schema = _schema((EX + "hasPart", OWL_INVERSE_OF, EX + "partOf"))
    out = _spo(owl_inference(_abox([(EX + "a", EX + "hasPart", EX + "b"),
                                    (EX + "c", EX + "partOf", EX + "d")]), schema))
    assert (EX + "b", EX + "partOf", EX + "a") in out
    assert (EX + "d", EX + "hasPart", EX + "c") in out  # inverse is symmetric


@pytest.mark.usefixtures("ray_session")
def test_symmetric_property():
    schema = _schema((EX + "near", RDF_TYPE, OWL_SYMMETRIC))
    out = _spo(owl_inference(_abox([(EX + "a", EX + "near", EX + "b")]), schema))
    assert (EX + "b", EX + "near", EX + "a") in out


@pytest.mark.usefixtures("ray_session")
def test_transitive_property_closure():
    schema = _schema((EX + "in", RDF_TYPE, OWL_TRANSITIVE))
    out = _spo(
        owl_inference(
            _abox([(EX + "a", EX + "in", EX + "b"),
                   (EX + "b", EX + "in", EX + "c"),
                   (EX + "c", EX + "in", EX + "d")]),
            schema,
        )
    )
    assert (EX + "a", EX + "in", EX + "c") in out
    assert (EX + "a", EX + "in", EX + "d") in out
    assert (EX + "b", EX + "in", EX + "d") in out


@pytest.mark.usefixtures("ray_session")
def test_functional_property_equality():
    schema = _schema((EX + "ssn", RDF_TYPE, OWL_FUNCTIONAL))
    out = _spo(
        owl_inference(
            _abox([(EX + "p", EX + "ssn", EX + "id1"),
                   (EX + "p", EX + "ssn", EX + "id2")]),
            schema,
        )
    )
    assert (EX + "id1", OWL_SAMEAS, EX + "id2") in out


@pytest.mark.usefixtures("ray_session")
def test_inverse_functional_property_equality():
    schema = _schema((EX + "email", RDF_TYPE, OWL_INV_FUNCTIONAL))
    out = _spo(
        owl_inference(
            _abox([(EX + "p1", EX + "email", EX + "m"),
                   (EX + "p2", EX + "email", EX + "m")]),
            schema,
        )
    )
    assert (EX + "p1", OWL_SAMEAS, EX + "p2") in out


@pytest.mark.usefixtures("ray_session")
def test_transitive_over_inverse_output():
    """Closure must see the streamed inverse edges: only c->b->a direction
    is asserted via hasPart; partOf is transitive."""
    schema = _schema(
        (EX + "hasPart", OWL_INVERSE_OF, EX + "partOf"),
        (EX + "partOf", RDF_TYPE, OWL_TRANSITIVE),
    )
    out = _spo(
        owl_inference(
            _abox([(EX + "c", EX + "hasPart", EX + "b"),
                   (EX + "b", EX + "hasPart", EX + "a")]),
            schema,
        )
    )
    assert (EX + "a", EX + "partOf", EX + "c") in out
