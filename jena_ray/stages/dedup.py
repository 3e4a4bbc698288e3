"""Exact triple deduplication — the set-semantics materialization step.

A Jena Graph is a *set* of triples (adding a duplicate is a no-op,
jena-core/.../graph/Graph.java; DISTINCT spills via
QueryIterDistinct.java:44-94 + DistinctDataBag). Distributed realization
(SURVEY.md §7.2.4):

1. REDUCED pre-pass (QueryIterReduced analog): drop duplicates *within*
   each batch before any shuffle — cheap, bounds every group's size by the
   number of blocks, which also defuses hot-key skew (a triple duplicated
   millions of times arrives at the groupby ≤ once per block).
2. One shuffle: groupby the full triple key, keep the row with min(doc_id)
   (deterministic across parallelism levels — the N-vs-4N byte-equality
   check needs this; an arbitrary "first" would not be stable).

The triple key is a single concatenated column (`tkey`) so the shuffle
hashes one string, not seven columns.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

KEY_COLS = ["s_kind", "s_lex", "p", "o_kind", "o_lex", "o_datatype", "o_lang", "g"]
_SEP = "\x1f"


def add_tkey(batch: pa.Table) -> pa.Table:
    parts = []
    for c in KEY_COLS:
        col = batch.column(c)
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            col = pc.cast(col, pa.large_string())
        parts.append(pc.cast(col.combine_chunks(), pa.large_string()))
    tkey = pc.binary_join_element_wise(*parts, pa.scalar(_SEP, pa.large_string()))
    return batch.append_column("tkey", tkey)


def _prededup(batch: pa.Table) -> pa.Table:
    batch = add_tkey(batch)
    # keep min doc_id per key within the batch (vectorized via sort+unique)
    order = pc.sort_indices(
        batch, sort_keys=[("tkey", "ascending"), ("doc_id", "ascending")]
    )
    sorted_batch = batch.take(order)
    keys = sorted_batch.column("tkey").combine_chunks()
    if len(keys) == 0:
        return sorted_batch
    prev = keys.slice(0, len(keys) - 1)
    cur = keys.slice(1)
    neq = pc.not_equal(cur, prev)
    if isinstance(neq, pa.ChunkedArray):
        neq = neq.combine_chunks()
    first_mask = pa.concat_arrays([pa.array([True]), neq])
    return sorted_batch.filter(first_mask)


def _keep_min_doc(g: pd.DataFrame) -> pd.DataFrame:
    return g.loc[[g["doc_id"].idxmin()]]


def exact_dedup(triples_ds, *, drop_tkey: bool = True):
    deduped = (
        triples_ds.map_batches(_prededup, batch_format="pyarrow")
        .groupby("tkey")
        .map_groups(_keep_min_doc, batch_format="pandas")
    )
    if drop_tkey:
        deduped = deduped.drop_columns(["tkey"])
    return deduped
