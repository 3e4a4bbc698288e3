"""Flagship KG-construction pipeline (the north star).

    interleaved docs (doc_id, spans)
      ├─ map_batches(extract)            text spans → triples (stateless)
      └─ map_batches(EntityLinker, ...)  media spans → link triples (actors)
    → union → map_batches(canonicalize)  IRI/literal/lang canon (stateless)
    → sameAs closure                     union-find + broadcast rewrite
    → exact dedup                        salt-free full-key shuffle
    → materialize                        partitioned parquet (optional)

Everything streams; the only driver-side state is the (small) sameAs rep
map. No stage materializes the corpus.
"""

from __future__ import annotations

from ..sources.docs import interleaved_docs
from ..stages.canonicalize import canonicalize_batch
from ..stages.dedup import exact_dedup
from ..stages.extract import extract_batch
from ..stages.link import EntityLinker
from ..stages.materialize import materialize
from ..stages.sameas import components_driver, extract_edges, rewrite_with_reps


def kg_triples(
    sf_dir: str,
    reps: int = 1,
    *,
    linker_concurrency: int | tuple = 2,
    dedup: bool = True,
):
    """The canonical triple Dataset for the corpus derived from sf_dir."""
    docs = interleaved_docs(sf_dir, reps)
    text_triples = docs.map_batches(extract_batch, batch_format="pyarrow")
    link_triples = docs.map_batches(
        EntityLinker,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=linker_concurrency,
    )
    triples = text_triples.union(link_triples)
    canon = triples.map_batches(canonicalize_batch, batch_format="pyarrow")

    # sameAs closure: the canon stream is consumed twice (edges + rewrite);
    # cache the canonical triples so extract/canonicalize run once.
    canon = canon.materialize()
    rep_map = components_driver(extract_edges(canon))
    closed = rewrite_with_reps(canon, rep_map)

    if dedup:
        closed = exact_dedup(closed)
    return closed


def kg_pipeline(sf_dir: str, out_dir: str, reps: int = 1, **kw):
    ds = kg_triples(sf_dir, reps, **kw)
    return materialize(ds, out_dir)
