"""read_rdf facade: distributed parse of RDF files into a triple Dataset,
plus materialize/serialize sinks."""

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def rdf_dir(tmp_path):
    (tmp_path / "a.nt").write_text(
        '<http://e/s1> <http://e/p> "x" .\n<http://e/s1> <http://e/p> _:b0 .\n'
    )
    (tmp_path / "b.ttl").write_text(
        "@prefix ex: <http://e/> . ex:s2 ex:p ( 1 2 ) . _:b0 ex:q ex:s2 .\n"
    )
    (tmp_path / "c.trig").write_text(
        "@prefix ex: <http://e/> . GRAPH ex:g { ex:s3 ex:p ex:o . }\n"
    )
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
def test_read_rdf_mixed_dir(rdf_dir):
    from jena_ray.sources.readers import read_rdf

    ds = read_rdf(rdf_dir)
    rows = ds.take_all()
    assert len(rows) == 9  # 2 (nt) + 6 (ttl: link + 2 cells*2 + bnode stmt) + 1 (trig)
    # file-scoped bnode labels: _:b0 in a.nt != _:b0 in b.ttl
    bnode_rows = [r for r in rows if r["o_kind"] == 1 or r["s_kind"] == 1]
    labels_a = {r["o_lex"] for r in rows if r["doc_id"].endswith("a.nt") and r["o_kind"] == 1}
    labels_b = {r["s_lex"] for r in rows if r["doc_id"].endswith("b.ttl") and r["s_kind"] == 1}
    assert labels_a and labels_b and not (labels_a & labels_b)
    # named graph from trig
    graphs = {r["g"] for r in rows}
    assert "http://e/g" in graphs


@pytest.mark.usefixtures("ray_session")
def test_read_rdf_on_error_skip(tmp_path):
    from jena_ray.sources.readers import read_rdf

    (tmp_path / "good.nt").write_text("<http://e/s> <http://e/p> <http://e/o> .\n")
    (tmp_path / "bad.nt").write_text("this is not ntriples\n")
    ds = read_rdf(str(tmp_path), on_error="skip")
    assert ds.count() == 1


@pytest.mark.usefixtures("ray_session")
def test_materialize_partitioned(tmp_path):
    import pyarrow.parquet as pq

    from jena_ray.pipelines.kg import kg_triples
    from jena_ray.stages.materialize import materialize

    out = str(tmp_path / "triples")
    materialize(kg_triples(SF, linker_concurrency=2), out, num_buckets=4)
    # partitioned layout: bucket=N directories
    buckets = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    assert len(buckets) >= 2
    total = pq.read_table(out).num_rows
    assert total == 5335


@pytest.mark.usefixtures("ray_session")
def test_write_ntriples_sink(tmp_path):
    import pyarrow.parquet as pq

    from jena_ray.pipelines.kg import kg_triples
    from jena_ray.rdf.ntriples import parse_ntriples
    from jena_ray.stages.serialize import write_ntriples

    out = str(tmp_path / "nt")
    write_ntriples(kg_triples(SF, linker_concurrency=2), out)
    lines = pq.read_table(out)["line"].to_pylist()
    assert len(lines) == 5335
    # every emitted line reparses as exactly one triple
    assert len(parse_ntriples(lines[0])) == 1


@pytest.mark.usefixtures("ray_session")
def test_write_results_csv_json(tmp_path):
    import csv
    import glob
    import ray.data as rd

    from jena_ray.stages.serialize import write_results

    ds = rd.from_items([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    out_csv = write_results(ds, str(tmp_path / "csv"), "csv")
    files = glob.glob(out_csv + "/*")
    rows = []
    for f in files:
        with open(f) as fh:
            rows.extend(list(csv.DictReader(fh)))
    assert sorted(r["b"] for r in rows) == ["x", "y"]

    out_json = write_results(ds, str(tmp_path / "json"), "json")
    assert glob.glob(out_json + "/*")


@pytest.mark.usefixtures("ray_session")
def test_read_rdf_relabels_bnodes_inside_triple_terms(tmp_path):
    """ADVICE r1 #1: the reifier bnode and the bnode INSIDE its reified
    triple term must stay the same node after doc-scoped relabeling, and
    two files reusing '_:x' must not collide."""
    from jena_ray.model import KIND_BNODE, KIND_TRIPLE_TERM
    from jena_ray.sources.readers import read_rdf

    line = '_:x <http://ex/p> "v" .\n_:r <http://ex/reifies> <<( _:x <http://ex/p> "v" )>> .\n'
    (tmp_path / "a.nt").write_text(line)
    (tmp_path / "b.nt").write_text(line)

    rows = read_rdf([str(tmp_path / "a.nt"), str(tmp_path / "b.nt")]).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 2
    inner_by_doc = {}
    for doc, rs in by_doc.items():
        asserted = [r for r in rs if r["s_kind"] == KIND_BNODE and r["p"] == "http://ex/p"]
        reified = [r for r in rs if r["o_kind"] == KIND_TRIPLE_TERM]
        assert len(asserted) == 1 and len(reified) == 1
        subj_label = asserted[0]["s_lex"]
        inner = reified[0]["o_lex"]
        # the term's inner subject must be the RELABELED node, not '_:x'
        assert f"_:{subj_label} " in inner, (subj_label, inner)
        assert "_:x" not in inner
        inner_by_doc[doc] = inner
    # different docs → different scopes → different inner terms
    assert len(set(inner_by_doc.values())) == 2


@pytest.mark.usefixtures("ray_session")
def test_front_door_read_and_query(tmp_path):
    """jena_ray.read / jena_ray.query — the RDFDataMgr +
    QueryExecutionFactory analog."""
    import jena_ray

    (tmp_path / "d.ttl").write_text(
        "@prefix ex: <http://ex/> . ex:a a ex:Person ; ex:name \"Alice\" ."
    )
    rows = jena_ray.query(
        str(tmp_path / "d.ttl"),
        "SELECT ?s WHERE { ?s a <http://ex/Person> }",
    ).take_all()
    assert [r["s"] for r in rows] == ["http://ex/a"]
    assert jena_ray.query(str(tmp_path / "d.ttl"), "ASK { ?s ?p ?o }") is True


@pytest.mark.usefixtures("ray_session")
def test_front_door_graph_query_over_trig(tmp_path):
    """End-to-end: TriG named graphs through read_rdf, queried with
    GRAPH ?g via the front door."""
    import jena_ray

    (tmp_path / "d.trig").write_text(
        "@prefix ex: <http://e/> .\n"
        "ex:s0 ex:p ex:o0 .\n"  # default graph
        "GRAPH ex:g1 { ex:s1 ex:p ex:o1 . }\n"
        "GRAPH ex:g2 { ex:s2 ex:p ex:o2 . }\n"
    )
    rows = jena_ray.query(
        str(tmp_path / "d.trig"),
        "SELECT ?g ?s WHERE { GRAPH ?g { ?s <http://e/p> ?o } } ORDER BY ?g",
    ).take_all()
    assert [(r["g"], r["s"]) for r in rows] == [
        ("http://e/g1", "http://e/s1"),
        ("http://e/g2", "http://e/s2"),
    ]
    # constant graph
    rows2 = jena_ray.query(
        str(tmp_path / "d.trig"),
        "SELECT ?s WHERE { GRAPH <http://e/g2> { ?s ?p ?o } }",
    ).take_all()
    assert [r["s"] for r in rows2] == ["http://e/s2"]


@pytest.mark.usefixtures("ray_session")
def test_lance_io_facade(tmp_path):
    """sources/lance_io: Parquet twin round-trips; *.lance paths route
    to the native Ray connector (live round-trip when the lance wheel
    is installed, actionable ImportError gate when it is not)."""
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.sources.lance_io import (
        _lance_available,
        read_table,
        write_table,
    )

    ds = rd.from_arrow(pa.table({"doc_id": ["a", "b"], "n": [1, 2]}))
    pq_dir = str(tmp_path / "twin")
    write_table(ds, pq_dir)
    back = read_table(pq_dir, columns=["doc_id"])
    assert sorted(r["doc_id"] for r in back.take_all()) == ["a", "b"]
    assert back.schema().names == ["doc_id"]

    lance_path = str(tmp_path / "t.lance")
    if _lance_available():
        write_table(ds, lance_path)
        got = read_table(lance_path, columns=["doc_id", "n"])
        assert got.count() == 2
    else:
        with pytest.raises(ImportError, match="lance"):
            write_table(ds, lance_path)
        with pytest.raises(ImportError, match="lance"):
            read_table(lance_path)
