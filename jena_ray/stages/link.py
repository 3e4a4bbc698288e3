"""Entity-linking stage — the actor-pool analog of the reference's
jena-text lookup surface (TextIndexLucene.query → TextHit(subject, score),
jena-text/.../text/TextIndexLucene.java:491-529; SPARQL glue
TextQueryPF.java:241-353).

``EntityLinker`` is a callable CLASS for ``map_batches(EntityLinker,
concurrency=N)``: the alias dictionary (and tokenizer regex) is built ONCE
per actor in ``__init__`` and reused across batches. Per batch it scans
media-span captions for dictionary mentions (n-gram lookup), scores
candidates by prior, links when the top prior clears the threshold, and
emits (doc, p:mentions, entity) plus (doc, p:hasMedia, media_ref) triples.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pyarrow as pa

from ..model import KIND_IRI, TRIPLE_SCHEMA
from ..sources.docs import PRED, build_aliases, doc_iri

LINK_THRESHOLD = 0.5
MAX_ALIAS_TOKENS = 3


class EntityLinker:
    def __init__(self, threshold: float = LINK_THRESHOLD):
        # once per actor: alias dictionary + compiled tokenizer
        self.threshold = threshold
        self.token_re = re.compile(r"[a-z0-9]+")
        cand: dict[str, list[tuple[str, float]]] = defaultdict(list)
        for alias, entity, prior in build_aliases():
            cand[alias].append((entity, prior))
        # resolve to the argmax-prior entity; None when no candidate clears
        # the threshold (ambiguous alias → dropped, FIXTURES §F2)
        self.resolved: dict[str, str | None] = {}
        for alias, cands in cand.items():
            best = max(cands, key=lambda c: c[1])
            self.resolved[alias] = best[0] if best[1] >= threshold else None

    def _mentions(self, caption: str) -> list[str]:
        toks = self.token_re.findall(caption.lower())
        out = []
        n = len(toks)
        for i in range(n):
            for width in range(MAX_ALIAS_TOKENS, 1, -1):
                if i + width > n:
                    continue
                alias = " ".join(toks[i : i + width])
                if alias in self.resolved:
                    ent = self.resolved[alias]
                    if ent is not None:
                        out.append(ent)
                    break  # longest match wins at this position
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        cols: dict[str, list] = {name: [] for name in TRIPLE_SCHEMA.names}

        def emit(d_iri, p, o, doc_key):
            cols["s_kind"].append(KIND_IRI)
            cols["s_lex"].append(d_iri)
            cols["p"].append(p)
            cols["o_kind"].append(KIND_IRI)
            cols["o_lex"].append(o)
            cols["o_datatype"].append("")
            cols["o_lang"].append("")
            cols["g"].append("")
            cols["doc_id"].append(doc_key)

        for doc_key, spans in zip(doc_ids, spans_col):
            d_iri = doc_iri(doc_key)
            for s in spans or []:
                if s["kind"] != "media":
                    continue
                if s["media_ref"]:
                    emit(d_iri, PRED + "hasMedia", s["media_ref"], doc_key)
                for ent in self._mentions(s["text"] or ""):
                    emit(d_iri, PRED + "mentions", ent, doc_key)
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA],
            schema=TRIPLE_SCHEMA,
        )


class ExtractAndLink(EntityLinker):
    """Fused extraction + linking: ONE pass over the docs stream.

    Running extract and link as two branches over the same source reads
    and repartitions the corpus twice and (worse) can deadlock tiny
    clusters — two all-to-all ops plus an actor pool contending for the
    same CPUs. Fusing them into one actor-pool stage keeps the alias
    dictionary per-actor AND makes the doc scan single-pass.
    """

    def __init__(self, threshold: float = LINK_THRESHOLD, on_error: str = "raise"):
        super().__init__(threshold)
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .extract import extract_batch

        text_triples = extract_batch(batch, on_error=self.on_error)
        link_triples = EntityLinker.__call__(self, batch)
        return pa.concat_tables([text_triples, link_triples])
