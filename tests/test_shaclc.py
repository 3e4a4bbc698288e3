"""SHACLC compact-syntax reader, including reference corpus files in the
supported subset."""

import pytest

from jena_ray.model import RDFParseError
from jena_ray.rdf.shaclc import parse_shaclc

REF = "/root/reference/jena-shacl/src/test/files/shaclc-valid"


def test_basic_shape_with_target_from_reference_corpus():
    import os

    path = os.path.join(REF, "basic-shape-with-target.shaclc")
    if not os.path.exists(path):
        pytest.skip("reference corpus absent")
    shapes = parse_shaclc(open(path).read())
    assert len(shapes) == 1
    assert shapes[0].name == "http://example.org/test#TestShape"
    assert shapes[0].target_classes == ["http://example.org/test#TestClass"]


def test_count_and_datatype_and_kind_from_reference_corpus():
    import os

    for fname, check in [
        ("count-0-1.shaclc",
         lambda sh: (sh[0].properties[0].min_count,
                     sh[0].properties[0].max_count) == (0, 1)),
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
    assert (s.properties[1].min_inclusive, s.properties[1].max_inclusive) == (0.0, 150.0)
    assert s.properties[2].max_count is None  # unbounded


def test_nested_shapes_rejected():
    with pytest.raises(RDFParseError, match="nested"):
        parse_shaclc(
            """
            PREFIX ex: <http://ex/>
            shape ex:S { ex:addr BlankNode [0..1] { ex:city xsd:string . } . }
            """
        )


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
    """Cross-parser conformance: for reference corpus files in the flat
    subset, parsing the .shaclc and the PAIRED .ttl must yield the same
    shape structures (modulo the min_count-0-is-default convention)."""
    import os

    from jena_ray.stages.shacl import parse_shapes

    def norm(shapes):
        out = {}
        for s in shapes:
            props = sorted(
                (p.path, p.min_count or 0, p.max_count, p.datatype,
                 p.node_kind, p.pattern, p.min_inclusive, p.max_inclusive)
                for p in s.properties
            )
            out[s.name] = (sorted(s.target_classes), props)
        return out

    compared = 0
    for fname in ("basic-shape-with-target", "count-0-1", "count-1-2",
                  "count-0-unlimited", "count-1-unlimited", "datatype",
                  "nodeKind", "basic-shape"):
        sc = os.path.join(REF, fname + ".shaclc")
        tt = os.path.join(REF, fname + ".ttl")
        if not (os.path.exists(sc) and os.path.exists(tt)):
            continue
        got = norm(parse_shaclc(open(sc).read()))
        want = norm(parse_shapes(open(tt).read()))
        assert got == want, fname
        compared += 1
    assert compared >= 5
