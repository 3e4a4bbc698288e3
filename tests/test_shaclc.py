"""SHACLC compact-syntax reader.

The authoritative check: the reference ships 32 .shaclc fixtures each
paired with the golden Turtle graph jena's parser streams for it
(jena-shacl/src/test/files/shaclc-valid/, harness
TestReadShaclCompact.java). shaclc_to_triples must produce a graph
ISOMORPHIC to every golden .ttl.
"""

import glob
import os

import pytest

from jena_ray.model import RDFParseError
from jena_ray.rdf.iso import graph_iso
from jena_ray.rdf.shaclc import parse_shaclc, shaclc_to_triples
from jena_ray.rdf.turtle import parse_turtle

REF = "/root/reference/jena-shacl/src/test/files/shaclc-valid"

_FIXTURES = sorted(
    os.path.basename(f)[:-7] for f in glob.glob(REF + "/*.shaclc")
) if os.path.isdir(REF) else []


@pytest.mark.parametrize("name", _FIXTURES)
def test_reference_corpus_graph_iso(name):
    got, _ = shaclc_to_triples(open(f"{REF}/{name}.shaclc").read())
    want = parse_turtle(open(f"{REF}/{name}.ttl").read())
    assert graph_iso(got, want), name


def test_corpus_is_complete():
    if not _FIXTURES:
        pytest.skip("reference corpus absent")
    assert len(_FIXTURES) == 32


def test_basic_shape_with_target_from_reference_corpus():
    path = os.path.join(REF, "basic-shape-with-target.shaclc")
    if not os.path.exists(path):
        pytest.skip("reference corpus absent")
    shapes = parse_shaclc(open(path).read())
    assert len(shapes) == 1
    assert shapes[0].name == "http://example.org/test#TestShape"
    assert shapes[0].target_classes == ["http://example.org/test#TestClass"]


def test_count_datatype_kind_from_reference_corpus():
    for fname, check in [
        # [0..1] emits maxCount only (rPropertyCount: min>0 gate)
        ("count-0-1.shaclc",
         lambda sh: (sh[0].properties[0].min_count or 0,
                     sh[0].properties[0].max_count) == (0, 1)),
        ("count-1-2.shaclc",
         lambda sh: (sh[0].properties[0].min_count,
                     sh[0].properties[0].max_count) == (1, 2)),
        ("datatype.shaclc",
         lambda sh: sh[0].properties[0].datatype
         == "http://www.w3.org/2001/XMLSchema#string"),
        ("nodeKind.shaclc",
         lambda sh: sh[0].properties[0].node_kind
         == "http://www.w3.org/ns/shacl#IRI"),
    ]:
        path = os.path.join(REF, fname)
        if not os.path.exists(path):
            pytest.skip("reference corpus absent")
        shapes = parse_shaclc(open(path).read())
        assert check(shapes), fname


def test_nested_shape_structure():
    """complex1: closed + ignoredProperties, nodeKind+class atom pair,
    nested { } shape landing as an inline-conformance block, or-list of
    datatypes inside the nested shape."""
    path = os.path.join(REF, "complex1.shaclc")
    if not os.path.exists(path):
        pytest.skip("reference corpus absent")
    shapes = parse_shaclc(open(path).read())
    s = shapes[0]
    assert s.closed is True
    assert s.ignored == [
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"]
    works = next(p for p in s.properties
                 if p.path.endswith("worksFor"))
    assert works.clss == ["http://example.com/ns#Company"]
    assert works.node_kind == "http://www.w3.org/ns/shacl#IRI"
    addr = next(p for p in s.properties if p.path.endswith("address"))
    assert addr.ands, "nested shape must appear as an inline block"
    nested = addr.ands[0][0]
    postal = next(p for p in nested.props
                  if p.path.endswith("postalCode"))
    assert len(postal.ors[0]) == 2  # xsd:integer | xsd:string


def test_shapeclass_implicit_target():
    path = os.path.join(REF, "complex2.shaclc")
    if not os.path.exists(path):
        pytest.skip("reference corpus absent")
    shapes = parse_shaclc(open(path).read())
    s = shapes[0]
    assert s.implicit_class is True
    assert s.name in s.target_classes


def test_pattern_and_range_params():
    shapes = parse_shaclc(
        """
        PREFIX ex: <http://ex/>
        shape ex:S -> ex:C {
          ex:ssn xsd:string [0..1] pattern="^\\\\d{3}$" .
          ex:age xsd:integer [1..1] minInclusive=0 maxInclusive=150 .
          ex:home IRI [0..*] .
        }
        """
    )
    s = shapes[0]
    assert s.properties[0].pattern == "^\\d{3}$"
    XSD = "http://www.w3.org/2001/XMLSchema#"
    assert s.properties[1].min_inclusive == ("0", XSD + "integer")
    assert s.properties[1].max_inclusive == ("150", XSD + "integer")
    assert s.properties[2].max_count is None  # unbounded


def test_bad_syntax_rejected():
    with pytest.raises(RDFParseError):
        parse_shaclc("shape ex:S {")  # unknown prefix
    with pytest.raises(RDFParseError):
        parse_shaclc("PREFIX ex: <http://ex/>\nshape ex:S { nonsense .")


@pytest.mark.usefixtures("ray_session")
def test_validate_shaclc_end_to_end():
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.model import TRIPLE_SCHEMA
    from jena_ray.rdf.shaclc import validate_shaclc

    XSD = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        (0, "http://ex/ok", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         0, "http://ex/C", "", "", "", "t"),
        (0, "http://ex/ok", "http://ex/name", 2, "fine", XSD + "string", "", "", "t"),
        (0, "http://ex/bad", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         0, "http://ex/C", "", "", "", "t"),
    ]
    ds = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array([r[i] for r in rows], f.type)
             for i, f in enumerate(TRIPLE_SCHEMA)],
            schema=TRIPLE_SCHEMA,
        )
    )
    report = validate_shaclc(
        ds,
        """
        PREFIX ex: <http://ex/>
        shape ex:S -> ex:C { ex:name xsd:string [1..1] . }
        """,
    ).take_all()
    assert [(r["focus"], r["constraint"]) for r in report] == [
        ("http://ex/bad", "minCount")
    ]


def test_shaclc_agrees_with_paired_turtle_shapes():
    """Cross-parser conformance: parsing the .shaclc and the PAIRED
    .ttl through parse_shapes must yield the same shape structures."""
    from jena_ray.stages.shacl import parse_shapes

    def norm(shapes):
        out = {}
        for s in shapes:
            props = sorted(
                (p.path, p.min_count or 0, p.max_count, p.datatype,
                 p.node_kind, p.pattern, p.min_inclusive, p.max_inclusive)
                for p in s.properties
            )
            out[s.name] = (sorted(s.target_classes), props, s.closed)
        return out

    compared = 0
    for fname in ("basic-shape-with-target", "count-0-1", "count-1-2",
                  "count-0-unlimited", "count-1-unlimited", "datatype",
                  "nodeKind", "basic-shape", "complex1", "nestedShape",
                  "shapeRef", "property-or-2"):
        sc = os.path.join(REF, fname + ".shaclc")
        tt = os.path.join(REF, fname + ".ttl")
        if not (os.path.exists(sc) and os.path.exists(tt)):
            continue
        got = norm(parse_shaclc(open(sc).read()))
        want = norm(parse_shapes(open(tt).read()))
        assert got == want, fname
        compared += 1
    assert compared >= 10
