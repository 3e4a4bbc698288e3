"""Triple extraction stage: interleaved docs → triple rows.

The per-document parse mirrors the reference's riot lifecycle (SURVEY.md
§3.1): all text spans of one document are concatenated and parsed as ONE
Turtle document (prefix/base directives apply positionally; blank-node
labels are shared document-wide — LabelToNode.createScopeByDocumentHash,
riot/lang/LabelToNode.java:48-64), with the per-doc base IRI.

Stateless ``map_batches`` kernel: parser state (prefixes, bnode labels,
anon counter) lives inside one document's parse and never crosses rows —
exactly the "order within a document preserved" constraint of SURVEY §2.10.
Rows are atomic in map_batches, so the span-sequence invariant holds by
construction.
"""

from __future__ import annotations

import pyarrow as pa

from ..model import KIND_BNODE, KIND_TRIPLE_TERM, TRIPLE_SCHEMA
from ..rdf.bnodes import BNodeScope
from ..rdf.iso import remap_triple_term_bnodes
from ..rdf.turtle import parse_turtle
from ..sources.docs import RUN_SEED, doc_base


def extract_batch(batch: pa.Table, *, on_error: str = "raise") -> pa.Table:
    """(doc_id, spans) rows → triple rows (TRIPLE_SCHEMA)."""
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans").to_pylist()
    cols: dict[str, list] = {name: [] for name in TRIPLE_SCHEMA.names}
    for doc_key, spans in zip(doc_ids, spans_col):
        text = "\n".join(s["text"] for s in (spans or []) if s["kind"] == "text")
        if not text:
            continue
        triples = parse_turtle(text, base=doc_base(doc_key), on_error=on_error)
        scope = BNodeScope(RUN_SEED, doc_key)
        for (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g) in triples:
            if s_kind == KIND_BNODE:
                s_lex = scope.get(s_lex)
            if o_kind == KIND_BNODE:
                o_lex = scope.get(o_lex)
            elif o_kind == KIND_TRIPLE_TERM:
                # same scope for labels inside reified terms (see readers)
                o_lex = remap_triple_term_bnodes(o_lex, scope.get)
            cols["s_kind"].append(s_kind)
            cols["s_lex"].append(s_lex)
            cols["p"].append(p)
            cols["o_kind"].append(o_kind)
            cols["o_lex"].append(o_lex)
            cols["o_datatype"].append(o_dt)
            cols["o_lang"].append(o_lang)
            cols["g"].append(g)
            cols["doc_id"].append(doc_key)
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA],
        schema=TRIPLE_SCHEMA,
    )
