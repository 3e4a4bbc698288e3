"""Deterministic sampling for training-data pipelines.

The reference has no sampling operator (its unit of work is a graph,
not a corpus); a 100 TB pre-training pipeline needs reproducible,
resumable sampling — a random() filter is neither (re-running a failed
shard would draw a different sample). All three samplers here key on a
cryptographic hash of a stable id, so the sample is a pure FILTER:
embarrassingly parallel, no shuffle, identical across retries and
cluster sizes, and exactly mirrorable in SQL for the oracle.

- ``hash_sample``: Bernoulli p — keep rows whose md5(key) prefix falls
  below the rate threshold (the standard deterministic-split trick,
  e.g. train/validation splitting by id hash).
- ``stratified_sample``: per-stratum rates (e.g. downsample English,
  keep low-resource languages) — one vectorized pass, rate looked up
  per row.
- ``bottomk_sample``: uniform WITHOUT replacement — the k rows with
  the globally smallest md5(key) (bottom-k / min-wise sampling, public
  sketch literature: Cohen & Kaplan, "Summarizing data using bottom-k
  sketches", PODC'07). Distributed as a per-batch k-smallest combiner
  before one tiny global sort+limit, so the shuffle carries at most
  k rows per block.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

# 8 hex chars = 32 bits of the md5 — plenty for rate resolution, cheap
# to compare, and reproducible in any SQL dialect via substr(md5(...))
_PREFIX = 8
_SPACE = 16 ** _PREFIX


def _hash_prefix_col(t: pa.Table, key: str, n: int = _PREFIX) -> pa.Array:
    vals = t[key].to_pylist()
    return pa.array(
        [hashlib.md5(str(v).encode()).hexdigest()[:n] for v in vals],
        pa.string(),
    )


def _rate_to_hex(rate: float) -> str:
    bound = min(max(int(rate * _SPACE), 0), _SPACE)
    if bound >= _SPACE:
        return "g"  # sorts after every hex digit → keep everything
    return format(bound, f"0{_PREFIX}x")


def hash_sample(ds, rate: float, key: str = "doc_id"):
    """Deterministic Bernoulli(rate) sample keyed on md5(key)."""
    bound = _rate_to_hex(rate)

    def keep(t: pa.Table) -> pa.Table:
        h = _hash_prefix_col(t, key)
        return t.filter(pc.less(h, pa.scalar(bound)))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, rates: dict[str, float], *,
                      strata_col: str = "lang", default_rate: float = 0.0,
                      key: str = "doc_id"):
    """Per-stratum deterministic rates; strata missing from ``rates``
    get ``default_rate``. One vectorized filter pass, no shuffle."""
    bounds = {s: _rate_to_hex(r) for s, r in rates.items()}
    default_bound = _rate_to_hex(default_rate)

    def keep(t: pa.Table) -> pa.Table:
        h = _hash_prefix_col(t, key)
        strata = t[strata_col].to_pylist()
        limit = pa.array(
            [bounds.get(s, default_bound) for s in strata], pa.string())
        return t.filter(pc.less(h, limit))

    return ds.map_batches(keep, batch_format="pyarrow")


def per_key_cap(ds, k: int, *, group_col: str = "source",
                key: str = "doc_id"):
    """Keep at most ``k`` rows per group — the per-host / per-domain
    quota cap every web-corpus pipeline applies so one crawl-heavy site
    can't dominate the corpus. Deterministic: within a group, survivors
    are the k rows with the smallest full md5(key) (reproducible across
    retries and cluster sizes; mirrors a SQL row_number() OVER
    (PARTITION BY group ORDER BY md5(key)) <= k).

    Distributed shape: a per-batch combiner first prunes every group to
    its k local smallest, so the single shuffle on the group column
    carries at most k rows per (block, group) — a hot domain contributes
    k rows per block, not its full row count."""
    import pandas as pd

    def prune(t: pa.Table) -> pa.Table:
        h = _hash_prefix_col(t, key, n=32)
        df = t.append_column("__h", h).to_pandas()
        df = df.sort_values("__h", kind="mergesort").groupby(
            group_col, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def head_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("__h", kind="mergesort").head(k).drop(
            columns="__h")

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return pruned.groupby(group_col).map_groups(
        head_group, batch_format="pandas")


def bottomk_sample(ds, k: int, key: str = "doc_id"):
    """Uniform sample of exactly min(k, N) rows without replacement:
    the k globally smallest md5(key) values. Per-batch combiner keeps
    only k candidates per block, so the final sort+limit is tiny."""

    def candidates(t: pa.Table) -> pa.Table:
        # FULL digest: the sample must be exactly reproducible, so no
        # prefix-collision ambiguity in the global order
        h = _hash_prefix_col(t, key, n=32)
        t = t.append_column("__h", h)
        idx = pc.select_k_unstable(
            t, k=min(k, t.num_rows), sort_keys=[("__h", "ascending")])
        return t.take(idx)

    pruned = ds.map_batches(candidates, batch_format="pyarrow")
    return (
        pruned.sort("__h")
        .limit(k)
        .map_batches(lambda t: t.drop_columns(["__h"]),
                     batch_format="pyarrow")
    )


def source_mix(docs_ds, budget_tokens: int, *, source_col: str = "source",
               key: str = "doc_id", text_col: str = "text"):
    """Per-source token-budget downsampling — the data-mixing pass of a
    pre-training pipeline (CCNet-style source reweighting: each source
    is kept whole if it fits the budget, else hash-downsampled at
    rate = budget / source_tokens so its EXPECTED contribution is the
    budget). Deterministic (md5-keyed — same sample across retries and
    cluster sizes), two passes, no data shuffle: pass 1 is one tiny
    groupby(source) for token totals (one row per source — the only
    driver-side state), pass 2 a vectorized per-row rate filter.

    Returns the kept docs as (doc_id, source, n_tokens)."""
    from ray.data.aggregate import Sum

    def tok(b: pa.Table) -> pa.Table:
        n = [len((t or "").split()) for t in b[text_col].to_pylist()]
        return pa.table({
            key: b[key].combine_chunks(),
            source_col: b[source_col].combine_chunks(),
            "n_tokens": pa.array(n, pa.int64()),
        })

    toks = docs_ds.map_batches(tok, batch_format="pyarrow").materialize()
    totals = toks.groupby(source_col).aggregate(
        Sum("n_tokens", alias_name="tot")).take_all()
    bounds = {
        r[source_col]: _rate_to_hex(min(1.0, budget_tokens / r["tot"]))
        for r in totals if r["tot"]
    }

    def keep(t: pa.Table) -> pa.Table:
        h = _hash_prefix_col(t, key)
        srcs = t[source_col].to_pylist()
        limit = pa.array([bounds.get(s, "0" * _PREFIX) for s in srcs],
                         pa.string())
        return t.filter(pc.less(h, limit))

    return toks.map_batches(keep, batch_format="pyarrow")
