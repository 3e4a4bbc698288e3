"""Passage chunking for RAG indexing / pretraining sequence packing.

The reference's unit of work is a graph, not a training corpus; a
100 TB pipeline needs a chunker that turns documents into fixed-size
token windows with overlap (the standard passage shape for retrieval
indexes and packed pretraining sequences). Pure flat-map — no shuffle,
no state — so it scales embarrassingly; output grows by roughly
window/stride × input tokens, which is why the op keeps the window
text as the ONLY wide column (prune upstream columns at the read).
"""

from __future__ import annotations

import pyarrow as pa


def chunk_windows(docs_ds, *, window: int = 64, stride: int = 48,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Explode each document into whitespace-token windows of
    ``window`` tokens starting every ``stride`` tokens (the last
    windows may be short; empty documents produce no chunks).

    Returns (doc_id, chunk_id, start_tok, n_tokens, chunk_text) with
    chunk_id = start_tok // stride — deterministic, resumable, and
    exactly SQL-mirrorable (UNNEST(range(0, n_tokens, stride)) + list
    slicing)."""
    id_type = docs_ds.schema().base_schema.field(id_col).type

    def explode(b: pa.Table) -> pa.Table:
        ids, cids, starts, ns, texts = [], [], [], [], []
        for d, text in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            ts = (text or "").split()
            for ci, st in enumerate(range(0, len(ts), stride)):
                seg = ts[st:st + window]
                ids.append(d)
                cids.append(ci)
                starts.append(st)
                ns.append(len(seg))
                texts.append(" ".join(seg))
        return pa.table({
            "doc_id": pa.array(ids, id_type),
            "chunk_id": pa.array(cids, pa.int64()),
            "start_tok": pa.array(starts, pa.int64()),
            "n_tokens": pa.array(ns, pa.int64()),
            "chunk_text": pa.array(texts, pa.large_string()),
        })

    return docs_ds.map_batches(explode, batch_format="pyarrow")


def seq_pack(docs_ds, *, budget: int = 1024, id_col: str = "doc_id",
             text_col: str = "text"):
    """Pretraining sequence packing (concat-and-chunk): documents laid
    end-to-end in ``id_col`` order on one global token tape, then the
    tape is cut every ``budget`` tokens — the standard way training
    pipelines pack variable-length documents into fixed-length
    sequences (GPT-style "chunked" packing).

    Returns (doc_id, n_tokens, tape_start, pack_id, pack_off) where
    pack_id = tape_start // budget and pack_off = tape_start % budget.

    Distributed shape: one sort shuffle pins the tape order, the global
    prefix sum runs on BLOCK-level subtotals only — per-block token
    sums are computed in worker tasks, the driver folds the (tiny,
    one-number-per-block) subtotal list into block start offsets, and a
    second worker pass stamps each block's rows with cumsum + offset.
    No row data ever reaches the driver, so the op scales to any corpus
    whose BLOCK COUNT fits driver memory (it always does)."""
    import ray
    import ray.data as rd

    def toks(b: pa.Table) -> pa.Table:
        n = [len((t or "").split()) for t in b[text_col].to_pylist()]
        return pa.table({
            "doc_id": b[id_col].combine_chunks(),
            "n_tokens": pa.array(n, pa.int64()),
        })

    mat = docs_ds.map_batches(toks, batch_format="pyarrow") \
                 .sort("doc_id").materialize()
    refs = mat.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _subtotal(t: pa.Table) -> int:
        import pyarrow.compute as _pc

        return _pc.sum(t["n_tokens"]).as_py() or 0

    subtotals = ray.get([_subtotal.remote(r) for r in refs])
    starts, acc = [], 0
    for s in subtotals:
        starts.append(acc)
        acc += s

    @ray.remote(num_cpus=0.25)
    def _stamp(t: pa.Table, start: int, _budget: int) -> pa.Table:
        import numpy as np

        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        tape = start + np.concatenate(([0], np.cumsum(n)[:-1])) \
            if len(n) else np.array([], dtype=np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": t["n_tokens"],
            "tape_start": pa.array(tape, pa.int64()),
            "pack_id": pa.array(tape // _budget, pa.int64()),
            "pack_off": pa.array(tape % _budget, pa.int64()),
        })

    out = [_stamp.remote(r, st, budget) for r, st in zip(refs, starts)]
    return rd.from_arrow_refs(out)
