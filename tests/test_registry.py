"""User-extension surface tests: function/aggregate/datatype/format
registries and pipeline-step interposition (SURVEY §2.11)."""

import pyarrow as pa
import pytest

from jena_ray.functions import FUNCTIONS, DatatypeRegistry, FormatRegistry, PipelineSteps
from jena_ray.functions.registry import DatatypeEntry, default_formats


def test_builtin_functions():
    t = pa.table({"s": ["abc", "Qx"]})
    out = FUNCTIONS.apply(
        "http://www.w3.org/2005/xpath-functions#upper-case", t, "s", out="u"
    )
    assert out["u"].to_pylist() == ["ABC", "QX"]
    out = FUNCTIONS.apply(
        "http://www.w3.org/2005/xpath-functions#string-length", t, "s", out="n"
    )
    assert out["n"].to_pylist() == [3, 2]


def test_register_custom_function():
    import pyarrow.compute as pc

    FUNCTIONS.register("http://example.org/fn#exclaim",
                       lambda a: pc.binary_join_element_wise(a, "!", ""))
    t = pa.table({"s": ["hi"]})
    out = FUNCTIONS.apply("http://example.org/fn#exclaim", t, "s", out="x")
    assert out["x"].to_pylist() == ["hi!"]
    with pytest.raises(KeyError):
        FUNCTIONS.get("http://example.org/fn#missing")


def test_datatype_registry():
    reg = DatatypeRegistry()
    reg.register(
        DatatypeEntry(
            iri="http://example.org/dt#celsius",
            parse=float,
            canonical=lambda lex: str(float(lex)),
            value_key=lambda lex: f"temp:{float(lex)}",
        )
    )
    e = reg.get("http://example.org/dt#celsius")
    assert e.canonical("07.50") == "7.5"
    assert e.value_key("7.5") == e.value_key("07.50")


def test_format_registry_roundtrip():
    reg = default_formats()
    triples = reg.reader("ntriples")('<http://e/s> <http://e/p> "x" .')
    assert len(triples) == 1
    triples2 = reg.reader("turtle")("@prefix e: <http://e/> . e:s e:p e:o .")
    assert triples2[0][1] == "http://e/s"
    from jena_ray.model import TRIPLE_SCHEMA

    batch = pa.Table.from_arrays(
        [pa.array([0], pa.int8()), pa.array(["http://e/s"], pa.large_string()),
         pa.array(["http://e/p"], pa.large_string()), pa.array([0], pa.int8()),
         pa.array(["http://e/o"], pa.large_string()),
         pa.array([""], pa.large_string()), pa.array([""], pa.large_string()),
         pa.array([""], pa.large_string()), pa.array(["d"], pa.large_string())],
        schema=TRIPLE_SCHEMA,
    )
    nt = reg.writer("ntriples")(batch)
    assert nt["line"].to_pylist() == ["<http://e/s> <http://e/p> <http://e/o> ."]
    ttl = reg.writer("turtle-flat")(batch)
    assert "<http://e/s> <http://e/p> <http://e/o> ." in ttl["line"].to_pylist()


def test_turtle_flat_abbreviation():
    from jena_ray.model import RDF_TYPE, TRIPLE_SCHEMA, XSD_NS
    from jena_ray.stages.serialize import format_turtle_flat_batch

    batch = pa.Table.from_arrays(
        [pa.array([0], pa.int8()), pa.array(["http://e/s"], pa.large_string()),
         pa.array([RDF_TYPE], pa.large_string()), pa.array([2], pa.int8()),
         pa.array(["5"], pa.large_string()),
         pa.array([XSD_NS + "int"], pa.large_string()),
         pa.array([""], pa.large_string()),
         pa.array([""], pa.large_string()), pa.array(["d"], pa.large_string())],
        schema=TRIPLE_SCHEMA,
    )
    lines = format_turtle_flat_batch(batch)["line"].to_pylist()
    assert '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .' in lines
    assert '<http://e/s> a "5"^^xsd:int .' in lines
    # reparse the flat Turtle: same triple comes back
    from jena_ray.rdf.turtle import parse_turtle

    got = parse_turtle("\n".join(lines))
    assert got[0][2] == RDF_TYPE and got[0][5] == XSD_NS + "int"


@pytest.mark.usefixtures("ray_session")
def test_pipeline_steps_interposition():
    import ray.data as rd

    steps = PipelineSteps()
    steps.append("double", lambda t: t.set_column(0, "x", pa.compute.multiply(t["x"], 2)))
    steps.append("add1", lambda t: t.set_column(0, "x", pa.compute.add(t["x"], 1)))
    steps.insert_before("add1", "add10", lambda t: t.set_column(0, "x", pa.compute.add(t["x"], 10)))
    assert steps.names() == ["double", "add10", "add1"]
    ds = rd.from_items([{"x": 1}, {"x": 2}])
    out = sorted(r["x"] for r in steps.build(ds).take_all())
    assert out == [13, 15]  # (x*2)+10+1
