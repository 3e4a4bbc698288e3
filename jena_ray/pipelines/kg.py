"""Flagship KG-construction pipeline (the north star).

    interleaved docs (doc_id, spans)
      ├─ map_batches(extract)            text spans → triples (stateless)
      └─ map_batches(EntityLinker, ...)  media spans → link triples (actors)
    → union → map_batches(canonicalize)  IRI/literal/lang canon (stateless)
    → sameAs closure                     union-find + broadcast rewrite
    → exact dedup                        salt-free full-key shuffle
    → materialize                        partitioned parquet (optional)

Everything streams. The sameAs closure AUTO-switches strategies on the
edge count (``close_sameas``): small equivalence graphs use the driver
union-find + broadcast rewrite, large ones run distributed label
propagation + a hash-join rewrite — above the threshold NO driver-sized
state remains anywhere in the pipeline. The one cached intermediate is
the canonical triple stream (consumed twice); large runs spill it to
Parquet shards instead of pinning it in the object store
(``spill_dir=``).
"""

from __future__ import annotations

from ..sources.docs import interleaved_docs
from ..stages.canonicalize import canonicalize_batch
from ..stages.dedup import exact_dedup
from ..stages.extract import extract_batch  # noqa: F401 (public pipeline API)
from ..stages.link import EntityLinker, ExtractAndLink  # noqa: F401
from ..stages.materialize import materialize
from ..stages.sameas import (
    components_distributed,
    components_driver,
    extract_edges,
    rewrite_with_reps,
    rewrite_with_reps_ds,
)

# Above this many distinct-ish sameAs edges the closure + rewrite run
# fully distributed (components_distributed + join-based rewrite): at the
# 100 TB design point the equivalence edge list is not guaranteed
# driver-sized. Below it, the driver union-find + broadcast rewrite is
# faster (no per-round shuffles, no two extra stream joins).
SAMEAS_DRIVER_THRESHOLD = 2_000_000


def close_sameas(canon, *, driver_threshold: int = SAMEAS_DRIVER_THRESHOLD):
    """sameAs closure + stream rewrite with an AUTO strategy switch,
    mirroring SPILL_DOC_THRESHOLD: one count() on the (map-side deduped)
    edge stream picks the driver union-find (small) or the distributed
    label propagation + hash-join rewrite (large)."""
    edges = extract_edges(canon)
    if edges.count() <= driver_threshold:
        return rewrite_with_reps(canon, components_driver(edges))
    return rewrite_with_reps_ds(canon, components_distributed(edges))


def _pool_size(requested) -> tuple[int, int]:
    """Autoscaling actor-pool bounds: never below 1, cap at the request —
    lets a 2-CPU test session run the same pipeline a 32-CPU bench does."""
    if isinstance(requested, tuple):
        return requested
    return (1, max(1, int(requested)))


def kg_triples(
    sf_dir: str,
    reps: int = 1,
    *,
    linker_concurrency: int | tuple = 2,
    dedup: bool = True,
    on_error: str = "raise",
    spill_dir: str | None = None,
    sameas_driver_threshold: int = SAMEAS_DRIVER_THRESHOLD,
):
    """The canonical triple Dataset for the corpus derived from sf_dir.

    The canon stream is consumed twice (sameAs edge extraction + rewrite),
    so phase-1 output must be cached. Two modes:

    - ``spill_dir=None`` (default, small/benchmark runs): pin it in the
      object store with ``materialize()`` — fastest when the canonical
      triple set fits cluster memory.
    - ``spill_dir=<path>`` (large runs): write phase-1 output to Parquet
      shards (``ds.write_parquet``, distributed) and stream BOTH consumers
      from the files — the pinned intermediate disappears and peak object
      store usage is bounded by the streaming working set, not the corpus.
    """
    docs = interleaved_docs(sf_dir, reps)
    # fused single-pass extract+link actor pool (see ExtractAndLink);
    # autoscaling (1, N) so a small session is never fully reserved
    triples = docs.map_batches(
        ExtractAndLink,
        fn_constructor_kwargs={"on_error": on_error},
        batch_format="pyarrow",
        # 128-doc batches measured fastest at 32 CPUs (64: 7.7s, 128:
        # 5.4s, 512: 6.9s for 100k docs — task overhead vs pipelining)
        batch_size=128,
        concurrency=_pool_size(linker_concurrency),
    )
    # large batches: the canonicalizer's per-unique-value dictionary rewrite
    # amortizes over batch size (Zipf-repeated IRIs)
    canon = triples.map_batches(
        canonicalize_batch, batch_format="pyarrow", batch_size=65536
    )

    if spill_dir is None:
        canon = canon.materialize()
    else:
        import os
        import shutil

        import ray.data as rd

        canon_dir = os.path.join(spill_dir, "canon")
        shutil.rmtree(canon_dir, ignore_errors=True)
        os.makedirs(canon_dir, exist_ok=True)
        canon.write_parquet(canon_dir)
        canon = rd.read_parquet(canon_dir)
    closed = close_sameas(canon, driver_threshold=sameas_driver_threshold)

    if dedup:
        closed = exact_dedup(closed)
    return closed


# Above this many interleaved documents the canonical triple stream is
# spilled to Parquet instead of pinned in the object store. Measured
# trade (sf0.1, 32 CPUs, 2M docs / 16M distinct triples): in-memory
# 180 s, spill 348 s — spill pays a full write+read of the canon stream,
# so it is only the right call when the stream would not fit cluster
# memory (always true at the 100 TB design point, never at bench scale).
SPILL_DOC_THRESHOLD = 4_000_000


def kg_pipeline(sf_dir: str, out_dir: str, reps: int = 1, **kw):
    """Full run with partitioned-parquet output. Phase-1 caching policy is
    AUTO: in-memory below SPILL_DOC_THRESHOLD estimated docs (fastest),
    Parquet spill above it (bounded object-store footprint). Pass
    ``spill_dir=`` to force spilling regardless of size."""
    import os

    if "spill_dir" not in kw:
        import pyarrow.parquet as pq

        n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows * reps
        if n_docs > SPILL_DOC_THRESHOLD:
            kw["spill_dir"] = os.path.join(out_dir, "_spill")
    ds = kg_triples(sf_dir, reps, **kw)
    return materialize(ds, out_dir)


# --------------------------------------------------------------------------
# Resumable two-phase run (north rule: per-partition lineage + resume)
# --------------------------------------------------------------------------


def _canon_triples_for_range(sf_dir: str, id_range, reps: int, linker_concurrency):
    docs = interleaved_docs(sf_dir, reps, id_range=id_range)
    return docs.map_batches(
        ExtractAndLink,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=_pool_size(linker_concurrency),
    ).map_batches(canonicalize_batch, batch_format="pyarrow")


def kg_resumable(
    sf_dir: str,
    out_dir: str,
    *,
    num_shards: int = 8,
    reps: int = 1,
    linker_concurrency=2,
):
    """Two-phase resumable run.

    Phase 1 (per-shard, resumable): extract+link+canonicalize each seed
    doc_id range → `<out>/extract/shard=<i>/` with a lineage manifest;
    completed shards are skipped on re-run (config-hash verified).

    Phase 2 (global): sameAs closure and exact dedup must see ALL shards
    (equivalence chains and duplicates cross shard boundaries), so they
    run over the union of phase-1 outputs → `<out>/triples/`.

    Returns (final Dataset, phase-1 stats dict).
    """
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..state.lineage import config_hash, shard_done, write_shard_dataset
    from ..util import compact_blocks

    seed_ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    lo, hi = min(seed_ids), max(seed_ids) + 1
    step = max(1, (hi - lo + num_shards - 1) // num_shards)
    extract_dir = os.path.join(out_dir, "extract")
    cfg = config_hash(
        {
            "stage": "extract+link+canon",
            "version": 1,
            "reps": reps,
            "sf_dir": sf_dir,
            "run_seed": "jena-ray-run-42",
        }
    )
    stats = {"shards_total": 0, "shards_skipped": 0, "shards_computed": 0}
    for i, start in enumerate(range(lo, hi, step)):
        shard = f"{i:04d}"
        stats["shards_total"] += 1
        if shard_done(extract_dir, shard, cfg):
            stats["shards_skipped"] += 1
            continue
        ds = compact_blocks(
            _canon_triples_for_range(
                sf_dir, (start, min(start + step, hi)), reps, linker_concurrency
            )
        )
        write_shard_dataset(
            extract_dir, shard, ds, cfg,
            extra={"id_range": [start, min(start + step, hi)]},
        )
        stats["shards_computed"] += 1

    canon = rd.read_parquet(extract_dir)
    canon = canon.drop_columns([c for c in ["shard"] if c in canon.schema().names])
    closed = close_sameas(canon)
    final = exact_dedup(closed)
    return final, stats
