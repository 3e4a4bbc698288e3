"""Shared Ray Data workarounds."""

from __future__ import annotations


def compact_blocks(ds):
    """Materialize and drop empty blocks.

    Ray groupby/join operators can emit (0-row, 0-column) blocks for
    empty partitions, and map_batches passes empty blocks through WITHOUT
    invoking the UDF — so they keep stale/absent schemas and
    nondeterministically crash downstream acero joins ("No match or
    multiple matches for key field"). Reassembling from the non-empty
    arrow refs removes them. Use on SMALL tables that feed Dataset.join
    (label/rank vectors, dimension tables).
    """
    import ray
    import ray.data as rd

    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    if not tables:
        return ds
    return rd.from_arrow(tables)
