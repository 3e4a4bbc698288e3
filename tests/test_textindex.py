"""Inverted text index: build once, bucket-pruned queries, scan parity."""

import os

import pytest


@pytest.mark.usefixtures("ray_session")
def test_index_matches_scan_path(tmp_path):
    """Index answers must equal ops/textsearch.text_query (same scoring)."""
    from jena_ray.ops.textsearch import text_query
    from jena_ray.pipelines.kg import kg_triples
    from jena_ray.state.textindex import build_text_index, query_text_index

    triples = kg_triples("/root/testdata/sf0.001", linker_concurrency=2).materialize()
    idx = str(tmp_path / "idx")
    build_text_index(triples, idx)
    assert os.path.exists(os.path.join(idx, "_meta.json"))
    # bucket partitioning on disk
    assert any(d.startswith("bucket=") for d in os.listdir(idx))

    q = "name 5"
    scan = [(r["subject"], r["score"], r["literal"])
            for r in text_query(triples, q, limit=10).take_all()]
    indexed = [(r["subject"], r["score"], r["literal"])
               for r in query_text_index(idx, q, limit=10).take_all()]
    assert scan, "query terms chosen to hit the corpus"
    assert indexed == scan


@pytest.mark.usefixtures("ray_session")
def test_query_reads_only_matching_buckets(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.model import TRIPLE_SCHEMA
    from jena_ray.state.textindex import (
        _bucket,
        build_text_index,
        query_text_index,
    )

    rows = [
        (0, "http://ex/s1", "http://ex/p", 2, "hello world",
         "http://www.w3.org/2001/XMLSchema#string", "", "", "t"),
        (0, "http://ex/s2", "http://ex/p", 2, "goodbye moon",
         "http://www.w3.org/2001/XMLSchema#string", "", "", "t"),
    ]
    ds = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array([r[i] for r in rows], f.type)
             for i, f in enumerate(TRIPLE_SCHEMA)],
            schema=TRIPLE_SCHEMA,
        )
    )
    idx = str(tmp_path / "idx")
    build_text_index(ds, idx)
    hits = query_text_index(idx, "hello").take_all()
    assert [h["subject"] for h in hits] == ["http://ex/s1"]
    # the bucket dir for 'hello' exists and is what the query touched
    assert os.path.isdir(os.path.join(idx, f"bucket={_bucket('hello')}"))
    # no-term query → empty
    assert query_text_index(idx, "   ").take_all() == []
