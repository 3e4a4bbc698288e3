"""End-to-end flagship pipeline: differential P/R vs the analytic golden.

The golden triple set is computed analytically (template replay +
driver-side union-find — see sources/docs.py), independent of the Ray
pipeline implementation; comparing the two is the BASELINE.md
"triple P/R >= 0.95" harness at test scale. We require exact equality.
"""

import pyarrow.compute as pc
import pytest

from jena_ray.sources.docs import golden_triples, interleaved_docs, make_doc

SF = "/root/testdata/sf0.001"
KEY = ["s_kind", "s_lex", "p", "o_kind", "o_lex", "o_datatype", "o_lang"]


def _result_set(ds):
    tbl = ds.to_arrow_refs()
    import pyarrow as pa
    import ray

    tables = [t for t in ray.get(tbl)]
    full = pa.concat_tables([t.select(KEY) for t in tables])
    return set(map(tuple, zip(*[full.column(c).to_pylist() for c in KEY])))


def test_corpus_shape():
    spans, expected, edges = make_doc("doc-0-0")
    assert spans, "doc must have spans"
    offsets = [s["offset"] for s in spans]
    assert offsets == sorted(offsets)  # strictly increasing offsets
    assert all(s["kind"] in ("text", "media") for s in spans)


def test_corpus_deterministic():
    a = make_doc("doc-7-0")
    b = make_doc("doc-7-0")
    assert a == b
    c = make_doc("doc-7-1")
    assert c != a


@pytest.mark.usefixtures("ray_session")
def test_docs_dataset():
    ds = interleaved_docs(SF)
    n = ds.count()
    assert n == 500
    row = ds.take(1)[0]
    assert set(row.keys()) == {"doc_id", "spans"}
    assert row["spans"][0]["kind"] in ("text", "media")


@pytest.mark.usefixtures("ray_session")
def test_kg_pipeline_matches_golden():
    from jena_ray.pipelines.kg import kg_triples

    got = _result_set(kg_triples(SF, linker_concurrency=2))
    want = golden_triples(SF)

    missing = want - got
    extra = got - want
    # exact match required at test scale (P/R == 1.0)
    assert not missing, f"missing {len(missing)} triples, e.g. {sorted(missing)[:5]}"
    assert not extra, f"extra {len(extra)} triples, e.g. {sorted(extra)[:5]}"


@pytest.mark.usefixtures("ray_session")
def test_dedup_is_set_semantics():
    from jena_ray.pipelines.kg import kg_triples

    ds = kg_triples(SF, linker_concurrency=2)
    import pandas as pd

    df = ds.to_pandas()
    assert not df.duplicated(subset=KEY + ["g"]).any()


@pytest.mark.usefixtures("ray_session")
def test_kg_triples_spill_path_matches_materialize(tmp_path):
    """spill_dir= streams phase-1 output through Parquet shards instead of
    pinning it in the object store; the result set must be identical."""
    from jena_ray.pipelines.kg import kg_triples

    got = _result_set(kg_triples(SF, linker_concurrency=2, spill_dir=str(tmp_path)))
    want = golden_triples(SF)
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_kg_triples_distributed_sameas_matches_golden():
    """Forcing the distributed sameAs path (threshold 0) must produce the
    exact same triple set as the driver union-find — and the flagship
    then has NO driver-sized state anywhere (VERDICT r2 #1)."""
    from jena_ray.pipelines.kg import kg_triples

    got = _result_set(
        kg_triples(SF, linker_concurrency=2, sameas_driver_threshold=0)
    )
    want = golden_triples(SF)
    missing = want - got
    extra = got - want
    assert not missing, f"missing {len(missing)}, e.g. {sorted(missing)[:5]}"
    assert not extra, f"extra {len(extra)}, e.g. {sorted(extra)[:5]}"


@pytest.mark.usefixtures("ray_session")
def test_rewrite_with_reps_ds_matches_dict_rewrite():
    """Join-based rewrite == broadcast-dict rewrite on a synthetic chain
    (a sameAs b sameAs c ... ), including the re-emitted member→rep
    assertions and non-IRI terms left untouched."""
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.model import KIND_IRI, KIND_LITERAL, OWL_SAMEAS, TRIPLE_SCHEMA
    from jena_ray.stages.sameas import (
        components_distributed,
        components_driver,
        extract_edges,
        rewrite_with_reps,
        rewrite_with_reps_ds,
    )

    n = 12
    rows = []
    # chain of sameAs edges + one data triple per node + a literal decoy
    for i in range(n - 1):
        rows.append((KIND_IRI, f"http://ex/n{i:02d}", OWL_SAMEAS,
                     KIND_IRI, f"http://ex/n{i+1:02d}", "", "", "", "d"))
    for i in range(n):
        rows.append((KIND_IRI, f"http://ex/n{i:02d}", "http://ex/p",
                     KIND_LITERAL, f"http://ex/n{(i+1) % n:02d}",
                     "http://www.w3.org/2001/XMLSchema#string", "", "", "d"))
    tbl = pa.Table.from_arrays(
        [pa.array([r[j] for r in rows],
                  TRIPLE_SCHEMA.field(j).type) for j in range(9)],
        schema=TRIPLE_SCHEMA,
    )
    ds = rd.from_arrow(tbl)
    want = {
        tuple(r[k] for k in TRIPLE_SCHEMA.names)
        for r in rewrite_with_reps(
            ds, components_driver(extract_edges(ds))
        ).take_all()
    }
    got = {
        tuple(r[k] for k in TRIPLE_SCHEMA.names)
        for r in rewrite_with_reps_ds(
            ds, components_distributed(extract_edges(ds))
        ).take_all()
    }
    assert got == want
    # literal objects must NOT have been rewritten even though their
    # lexical form collides with a mapped IRI
    lits = {r for r in got if r[3] == KIND_LITERAL}
    assert len(lits) == n
