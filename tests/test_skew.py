"""Skew handling: the in-batch REDUCED pre-pass bounds what a hot key can
ship to the dedup shuffle (SURVEY §4 'Skew'), and the hash partitioner
spreads distinct triples uniformly regardless of predicate skew."""

import pyarrow as pa
import pytest

from jena_ray.model import TRIPLE_SCHEMA, triples_from_pylists
from jena_ray.stages.dedup import _add_part, _prededup, exact_dedup


def _hot_key_table(n_dups: int, n_unique: int) -> pa.Table:
    cols = {name: [] for name in TRIPLE_SCHEMA.names}

    def add(s, p, o, doc):
        cols["s_kind"].append(0)
        cols["s_lex"].append(s)
        cols["p"].append(p)
        cols["o_kind"].append(0)
        cols["o_lex"].append(o)
        cols["o_datatype"].append("")
        cols["o_lang"].append("")
        cols["g"].append("")
        cols["doc_id"].append(doc)

    for i in range(n_dups):  # ONE triple duplicated n_dups times
        add("http://e/hot", "http://e/p", "http://e/o", f"d{i:06d}")
    for i in range(n_unique):
        add(f"http://e/s{i}", "http://e/p", f"http://e/o{i}", f"d{i:06d}")
    return triples_from_pylists(cols)


def test_prededup_bounds_hot_key():
    tbl = _hot_key_table(n_dups=100_000, n_unique=1000)
    out = _prededup(tbl)
    # the hot triple survives exactly once per batch — shuffle input is
    # bounded by (#distinct per block), not by duplication factor
    assert out.num_rows == 1001
    hot = out.filter(pa.compute.equal(out["s_lex"], "http://e/hot"))
    assert hot.num_rows == 1
    assert hot["doc_id"][0].as_py() == "d000000"  # min doc_id survives


def test_hash_partition_balances_skewed_predicates():
    # all triples share ONE predicate (rdf:type-style skew); partitioning
    # is on the full triple hash so partitions stay balanced
    tbl = _hot_key_table(n_dups=0, n_unique=20_000)
    out = _add_part(_prededup(tbl), num_parts=16)
    counts = pa.TableGroupBy(out, "part").aggregate([("part", "count")])
    sizes = counts["part_count"].to_pylist()
    assert len(sizes) == 16
    assert max(sizes) < 2 * min(sizes), f"unbalanced partitions: {sizes}"


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_hot_key_end_to_end():
    import ray.data as rd

    ds = rd.from_arrow(_hot_key_table(n_dups=50_000, n_unique=500)).repartition(8)
    out = exact_dedup(ds)
    rows = out.take_all()
    assert len(rows) == 501
    hot = [r for r in rows if r["s_lex"] == "http://e/hot"]
    assert len(hot) == 1 and hot[0]["doc_id"] == "d000000"
