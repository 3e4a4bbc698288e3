"""Lance-first IO facade for the interleaved document corpus.

BASELINE.json names Lance as the at-scale storage format for the
(doc_id, spans) interleaved table and the materialized triple table.
Ray Data ships native connectors (``ray.data.read_lance`` /
``Dataset.write_lance``, backed by the LanceDB datasource) — this
facade routes ``*.lance`` dataset paths through them and everything
else through Parquet, so the two layouts are drop-in twins: the rest
of the engine only ever sees a Dataset of the same schema.

The sandbox image does not carry the ``lance`` wheel, so the Lance
branch is import-gated with a actionable error and the test suite
exercises the Parquet twin plus the gate itself (skipping the live
Lance round-trip when the wheel is absent — it runs wherever
``pip install pylance`` has happened).
"""

from __future__ import annotations


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(path: str, *, columns: list[str] | None = None, **kw):
    """Read a columnar table as a Ray Dataset — Lance for ``*.lance``
    dataset directories, Parquet otherwise. ``columns`` prunes at the
    read in BOTH branches (Lance is columnar like Parquet; passing the
    projection down is what keeps a 2-column transform from shipping
    the media payload column)."""
    import ray.data as rd

    if str(path).rstrip("/").endswith(".lance"):
        if not _lance_available():
            raise ImportError(
                "read_table: the path names a Lance dataset but the "
                "'lance' library is not installed in this environment; "
                "install pylance or point at the Parquet twin of the table"
            )
        return rd.read_lance(path, columns=columns, **kw)
    return rd.read_parquet(path, columns=columns, **kw)


def write_table(ds, path: str, **kw):
    """Write a Dataset — Lance for ``*.lance`` paths (native
    ``Dataset.write_lance``), partitioned Parquet part-files otherwise.
    Both sinks stream one fragment per block; neither materializes the
    Dataset on the driver."""
    if str(path).rstrip("/").endswith(".lance"):
        if not _lance_available():
            raise ImportError(
                "write_table: Lance output requested but the 'lance' "
                "library is not installed; install pylance or write the "
                "Parquet twin"
            )
        ds.write_lance(path, **kw)
        return path
    ds.write_parquet(path, **kw)
    return path
