"""Checkpoint/resume: per-shard lineage manifests, skip-on-rerun, and
equality of the resumable run with the single-pass pipeline."""

import json
import os
import shutil

import pytest

from jena_ray.sources.docs import golden_triples

SF = "/root/testdata/sf0.001"
KEY = ["s_kind", "s_lex", "p", "o_kind", "o_lex", "o_datatype", "o_lang"]


def _result_set(ds):
    import pyarrow as pa
    import ray

    tables = ray.get(ds.to_arrow_refs())
    full = pa.concat_tables([t.select(KEY) for t in tables])
    return set(map(tuple, zip(*[full.column(c).to_pylist() for c in KEY])))


@pytest.mark.usefixtures("ray_session")
def test_resumable_run_and_resume(tmp_path):
    from jena_ray.pipelines.kg import kg_resumable

    out = str(tmp_path / "kg_out")

    final, stats = kg_resumable(SF, out, num_shards=4)
    assert stats["shards_computed"] == 4
    assert stats["shards_skipped"] == 0
    assert _result_set(final) == golden_triples(SF)

    # manifests exist and verify
    mdir = os.path.join(out, "extract", "_manifests")
    manifests = sorted(os.listdir(mdir))
    assert len(manifests) == 4
    m = json.load(open(os.path.join(mdir, manifests[0])))
    assert m["rows"] > 0 and len(m["content_hash"]) == 32

    # re-run: everything skipped
    _, stats2 = kg_resumable(SF, out, num_shards=4)
    assert stats2["shards_skipped"] == 4
    assert stats2["shards_computed"] == 0

    # delete one shard → only it recomputes, content hash identical
    shutil.rmtree(os.path.join(out, "extract", "shard=0002"))
    _, stats3 = kg_resumable(SF, out, num_shards=4)
    assert stats3["shards_computed"] == 1
    assert stats3["shards_skipped"] == 3
    m2 = json.load(open(os.path.join(mdir, "0002.json")))
    assert m2["content_hash"] == json.load(open(os.path.join(mdir, "0002.json")))["content_hash"]

    # stale config hash → recompute
    cfgpath = os.path.join(mdir, "0001.json")
    m1 = json.load(open(cfgpath))
    m1["config_hash"] = "stale"
    json.dump(m1, open(cfgpath, "w"))
    _, stats4 = kg_resumable(SF, out, num_shards=4)
    assert stats4["shards_computed"] == 1
