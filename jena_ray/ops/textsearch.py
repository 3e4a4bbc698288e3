"""Full-text query over literal objects — the jena-text surface rebuilt.

Parity: TextIndexLucene.query returns TextHit(subject, score, literal,
graph) for literals indexed by property
(jena-text/.../text/TextIndexLucene.java:491-529; SPARQL property function
text:query, TextQueryPF.java:241-353).

Ray realization: no global index actor — scoring is a stateful
map_batches stage (tokenizer + query terms compiled once per actor) over
the triple stream's literal objects; per-batch local top-k then a small
global merge, same shape as similarity.brute_force_topk.
"""

from __future__ import annotations

import math
import re

import pyarrow as pa
import pyarrow.compute as pc

from ..model import KIND_LITERAL


class TextScorer:
    """Actor: __init__ compiles the tokenizer and query-term weights once."""

    def __init__(self, query: str, property_iri: str | None = None):
        self.token_re = re.compile(r"[a-z0-9]+")
        self.qterms = set(self.token_re.findall(query.lower()))
        self.property_iri = property_iri

    def _score(self, text: str) -> float:
        toks = self.token_re.findall(text.lower())
        if not toks:
            return 0.0
        hits = sum(1 for t in toks if t in self.qterms)
        if hits == 0:
            return 0.0
        # TF x brevity norm (Lucene-flavored, not byte-identical scoring)
        return round(hits / math.sqrt(len(toks)), 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch["o_kind"], pa.scalar(KIND_LITERAL, pa.int8()))
        if self.property_iri:
            mask = pc.and_(mask, pc.equal(batch["p"], self.property_iri))
        t = batch.filter(mask)
        subjects, scores, literals = [], [], []
        for s, lex in zip(t["s_lex"].to_pylist(), t["o_lex"].to_pylist()):
            sc = self._score(lex)
            if sc > 0:
                subjects.append(s)
                scores.append(sc)
                literals.append(lex)
        return pa.table(
            {
                "subject": pa.array(subjects, pa.large_string()),
                "score": pa.array(scores, pa.float64()),
                "literal": pa.array(literals, pa.large_string()),
            }
        )


def text_query(
    triples_ds,
    query: str,
    *,
    property_iri: str | None = None,
    limit: int = 10,
    concurrency=2,
):
    """TextHit rows (subject, score, literal), best first — text:query."""
    hits = triples_ds.map_batches(
        TextScorer(query, property_iri).__call__ if concurrency is None
        else _actor_cls(query, property_iri),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    )
    return hits.sort(["score", "subject"], descending=[True, False]).limit(limit)


def _actor_cls(query: str, property_iri):
    class _Scorer(TextScorer):
        def __init__(self):
            super().__init__(query, property_iri)

    return _Scorer
