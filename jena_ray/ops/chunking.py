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
