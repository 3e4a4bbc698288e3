"""RDF-Patch application + full-text query surface."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_apply_patch_add_delete():
    import ray.data as rd

    from jena_ray.model import TRIPLE_SCHEMA
    from jena_ray.state.patch import apply_patch, parse_patch
    import pyarrow as pa

    base = pa.Table.from_arrays(
        [pa.array([0, 0], pa.int8()),
         pa.array(["http://e/s1", "http://e/s2"], pa.large_string()),
         pa.array(["http://e/p", "http://e/p"], pa.large_string()),
         pa.array([0, 0], pa.int8()),
         pa.array(["http://e/o1", "http://e/o2"], pa.large_string()),
         pa.array(["", ""], pa.large_string()),
         pa.array(["", ""], pa.large_string()),
         pa.array(["", ""], pa.large_string()),
         pa.array(["d0", "d0"], pa.large_string())],
        schema=TRIPLE_SCHEMA,
    )
    patch = """
TX .
A <http://e/s3> <http://e/p> "new" .
A <http://e/s1> <http://e/p> <http://e/o1> .
D <http://e/s2> <http://e/p> <http://e/o2> .
TC .
"""
    adds, deletes = parse_patch(patch)
    assert len(adds) == 2 and len(deletes) == 1

    out = apply_patch(rd.from_arrow(base), patch).take_all()
    triples = {(r["s_lex"], r["o_lex"]) for r in out}
    assert ("http://e/s3", "new") in triples          # added
    assert ("http://e/s2", "http://e/o2") not in triples  # deleted
    assert ("http://e/s1", "http://e/o1") in triples  # kept, not duplicated
    assert len(out) == 2


@pytest.mark.usefixtures("ray_session")
def test_text_query_over_kg():
    from jena_ray.ops.textsearch import text_query
    from jena_ray.pipelines.kg import kg_triples
    from jena_ray.sources.docs import PRED

    import pyarrow.compute as pc

    triples = kg_triples(SF, linker_concurrency=2).materialize()
    # derive a query from the corpus itself (template draws shift as the
    # corpus evolves): grab one actual name literal and search for it
    name_rows = triples.map_batches(
        lambda b: b.filter(pc.equal(b["p"], PRED + "name")),
        batch_format="pyarrow",
    ).take(1)
    target = name_rows[0]["o_lex"]  # e.g. "Name 1234"
    hits = text_query(triples, target, property_iri=PRED + "name", limit=5)
    rows = hits.take_all()
    assert rows, "expected at least one hit"
    assert rows[0]["score"] >= rows[-1]["score"]
    num = target.split()[-1]
    assert any(num in r["literal"] for r in rows)


@pytest.mark.usefixtures("ray_session")
def test_patch_ops_apply_in_file_order():
    """'D t' then 'A t' leaves t PRESENT (sequential RDFChanges semantics);
    'A t' then 'D t' leaves it absent."""
    import ray.data as rd

    from jena_ray.state.patch import apply_patch, parse_patch

    t = '<http://ex/s> <http://ex/p> "v" .'
    adds, dels = parse_patch(f"D {t}\nA {t}\n")
    assert len(adds) == 1 and not dels
    adds2, dels2 = parse_patch(f"A {t}\nD {t}\n")
    assert len(dels2) == 1 and not adds2

    from jena_ray.model import TRIPLE_SCHEMA
    import pyarrow as pa

    empty = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
        )
    )
    out = apply_patch(empty, f"D {t}\nA {t}\n")
    assert out.count() == 1
    out2 = apply_patch(empty, f"A {t}\nD {t}\n")
    assert out2.count() == 0


def test_patch_reference_syntax_fixture():
    """The reference's own text-syntax fixture parses: headers, prefix
    add/delete (incl. the empty prefix), quads, one transaction
    (jena-rdfpatch/testing/files/syntax-1.rdfp)."""
    from jena_ray.state.patch import parse_patch, patch_header, patch_prefixes

    text = open("/root/reference/jena-rdfpatch/testing/files/syntax-1.rdfp").read()
    header = patch_header(text)
    assert header == {"id": "<uuid:bbe2edae-325e-11ec-abcc-a70bbba0dfb1>"}
    adds, deletes = parse_patch(text)
    # A then D of the same quad → net delete
    assert not adds and len(deletes) == 1
    assert deletes[0][7] == "http://example/g"  # graph slot of the quad
    # PA ex → PD ex → PA "" → PD "" nets out to an empty map
    assert patch_prefixes(text) == {}


def test_patch_transaction_abort_discards():
    """Ops inside TX..TA are discarded (RDFChangesApply.txnAbort);
    committed and top-level ops survive."""
    from jena_ray.state.patch import parse_patch, patch_prefixes

    text = """
A <http://e/top> <http://e/p> "kept" .
TX .
A <http://e/s1> <http://e/p> "gone" .
PA "x" <http://e/x#> .
TA .
TX .
A <http://e/s2> <http://e/p> "kept2" .
PA "y" <http://e/y#> .
TC .
Z .
TB .
A <http://e/s3> <http://e/p> "dangling" .
"""
    adds, deletes = parse_patch(text)
    assert {t[1] for t in adds} == {"http://e/top", "http://e/s2"}
    assert not deletes
    assert patch_prefixes(text) == {("", "y"): "http://e/y#"}


def test_patch_binary_roundtrip():
    """Binary (Thrift) patch rows carry the same ops as the text form:
    text-parse → binary-write → binary-parse is identity, and the
    effective-set / header / prefix functions accept bytes directly."""
    from jena_ray.rdf.thrift import parse_patch_thrift, write_patch_thrift
    from jena_ray.state.patch import (
        parse_patch,
        parse_patch_ops,
        patch_header,
        patch_prefixes,
    )

    text = open("/root/reference/jena-rdfpatch/testing/files/syntax-1.rdfp").read()
    ops = parse_patch_ops(text)
    data = write_patch_thrift(ops)
    assert parse_patch_thrift(data) == ops
    # fragments concatenate
    assert b"".join(write_patch_thrift([op]) for op in ops) == data
    # the bytes overloads agree with the text ones
    assert parse_patch(data) == parse_patch(text)
    assert patch_header(data) == patch_header(text)
    assert patch_prefixes(data) == patch_prefixes(text)


def test_patch_prefix_graph_scoped():
    from jena_ray.state.patch import patch_prefixes

    text = 'PA "ex" <http://e/> <http://e/g> .\nPA "ex" "http://other/" .\n'
    pmap = patch_prefixes(text)
    assert pmap == {
        ("http://e/g", "ex"): "http://e/",
        ("", "ex"): "http://other/",
    }
