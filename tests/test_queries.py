"""Operator-coverage queries vs DuckDB oracle — local mirror of the
driver's correctness gate (row-count + schema + value equality)."""

import duckdb
import pandas as pd
import pytest

from jena_ray.pipelines.queries import REGISTRY

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, ddb):
    fn, sql = REGISTRY[name]
    got = _canon(_to_pandas(fn(SF)))
    want = _canon(ddb.sql(sql).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns), f"{name}: schema mismatch"
    # Driver hashes the VALUE REPRESENTATION, so dtype kind matters: an
    # int64 engine column vs a DuckDB HUGEINT->float64 oracle column
    # hash-mismatches even when every value is equal (round-1 lesson).
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        assert (gk == wk) or {gk, wk} <= {"i", "u"}, (
            f"{name}.{c}: dtype kind {got[c].dtype} vs oracle {want[c].dtype} "
            "(driver value-hash would mismatch)"
        )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_hash_variants_pinned_digests():
    """sha1/384/512 have no DuckDB oracle — pin digests against hashlib."""
    import hashlib

    from jena_ray.pipelines.queries import q_hash_variants

    rows = q_hash_variants(SF).take(3)
    import duckdb

    con = duckdb.connect()
    names = dict(
        con.execute(
            f"SELECT c_custkey, c_name FROM read_parquet('{SF}/customer.parquet')"
        ).fetchall()
    )
    for r in rows:
        name = names[r["c_custkey"]].encode()
        assert r["name_sha1"] == hashlib.sha1(name).hexdigest()
        assert r["name_sha384"] == hashlib.sha384(name).hexdigest()
        assert r["name_sha512"] == hashlib.sha512(name).hexdigest()
