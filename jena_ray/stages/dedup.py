"""Exact triple deduplication — the set-semantics materialization step.

A Jena Graph is a *set* of triples (adding a duplicate is a no-op,
jena-core/.../graph/Graph.java; DISTINCT spills via
QueryIterDistinct.java:44-94 + DistinctDataBag). Distributed realization
(SURVEY.md §7.2.4):

1. REDUCED pre-pass (QueryIterReduced analog): vectorized arrow
   ``Table.group_by`` *within* each batch before any shuffle — cheap, and
   bounds every group's size by the number of blocks, which also defuses
   hot-key skew (a triple duplicated millions of times reaches the global
   groupby at most once per block).
2. One shuffle: multi-key hash groupby over the full triple key with a
   Min aggregate on doc_id — fully vectorized (no per-group Python), and
   min() makes the surviving provenance deterministic across parallelism
   levels (the N-vs-4N byte-equality check in BASELINE.md needs this).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..model import TRIPLE_COLUMNS

KEY_COLS = ["s_kind", "s_lex", "p", "o_kind", "o_lex", "o_datatype", "o_lang", "g"]


def _prededup(batch: pa.Table) -> pa.Table:
    out = batch.group_by(KEY_COLS).aggregate([("doc_id", "min")])
    return out.rename_columns(KEY_COLS + ["doc_id"])


def _add_part(batch: pa.Table, num_parts: int) -> pa.Table:
    """Hash-partition column over the triple key (vectorized).

    Hash collisions only affect partition placement, never correctness —
    the per-partition dedup still compares full keys — so a plain concat
    (no escaping) feeds the hash."""
    import pandas as pd

    parts = []
    for c in KEY_COLS:
        col = batch.column(c)
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            col = pc.cast(col, pa.large_string())
        parts.append(pc.cast(col.combine_chunks(), pa.large_string()))
    key = pc.binary_join_element_wise(*parts, pa.scalar("\x1f", pa.large_string()))
    h = pd.util.hash_pandas_object(key.to_pandas(), index=False).to_numpy()
    part = pa.array((h % num_parts).astype("int64"))
    return batch.append_column("part", part)


def _dedup_group(t: pa.Table) -> pa.Table:
    out = t.group_by(KEY_COLS).aggregate([("doc_id", "min")])
    return out.rename_columns(KEY_COLS + ["doc_id"])


def exact_dedup(triples_ds, num_parts: int = 256):
    """Hash-partitioned exact dedup.

    Measured at sf0.1×100 (4.7M rows, 32 cpus): a global 8-string-column
    sort-aggregate took 69 s; hash-partitioning on one int column and
    running the vectorized arrow group_by per partition takes ~8 s. The
    shuffle moves the same bytes but sorts a single int64 key; the
    full-key comparison happens in C inside each partition."""
    pre = triples_ds.map_batches(
        _prededup, batch_format="pyarrow", batch_size=65536
    ).map_batches(
        lambda b: _add_part(b, num_parts), batch_format="pyarrow", batch_size=65536
    )
    deduped = pre.groupby("part").map_groups(_dedup_group, batch_format="pyarrow")
    return deduped.select_columns(TRIPLE_COLUMNS)
