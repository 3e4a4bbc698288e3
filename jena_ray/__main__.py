"""Job entrypoint — the ``ray job submit`` front door (north rule).

On a real cluster the flagship pipeline runs as a Ray job:

    ray job submit --working-dir . -- \
        python -m jena_ray kg --sf-dir /data/corpus --out /data/triples \
            --shards 256 --metrics /data/triples/metrics.json

Subcommands:

- ``kg``     — the resumable two-phase flagship run
  (``pipelines.kg.kg_resumable``): per-shard extract+link+canonicalize
  with lineage manifests (completed shards skip on re-submit), then the
  global sameAs closure + exact dedup, materialized as a partitioned
  Parquet triple table. Emits a one-line metrics JSON (wall seconds,
  triples, shard counts, throughput) to stdout and ``--metrics``.
- ``query``  — load RDF files and run a SPARQL query; results to stdout
  or ``--out`` in csv/tsv/json/xml (SELECT/ASK) or N-Triples
  (CONSTRUCT).
- ``riot``   — parse RDF files and re-serialize in another syntax
  (the riot command analog).
- ``validate`` — SHACL or ShEx validation; JSON report (the shacl /
  shex command analogs).
- ``load``   — bulk-load RDF files into the partitioned Parquet triple
  table (the tdb2.tdbloader analog).

Session ownership: when launched as a script (``python -m jena_ray`` /
``ray job submit``) this module owns the Ray session — it initialises
from ``$RAY_ADDRESS`` (the job server sets it on a cluster; ``local``
here) and shuts down on exit. When ``main()`` is called in-process
(tests), an already-initialised session is reused and left running.

Reference analog: the ``riot`` / ``arq`` / ``tdb2.tdbloader`` command
wrappers (jena-cmds/src/main/java/arq/, .../tdb2/tdbloader.java) — one
process entrypoint per pipeline, argument-driven.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m jena_ray",
        description="jena_ray Ray job entrypoints",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("kg", help="resumable flagship KG-construction run")
    kg.add_argument("--sf-dir", required=True, help="input corpus directory")
    kg.add_argument("--out", required=True, help="output directory")
    kg.add_argument("--shards", type=int, default=8, help="phase-1 shard count")
    kg.add_argument("--reps", type=int, default=1, help="corpus replication factor")
    kg.add_argument(
        "--metrics", default=None, help="also write the metrics JSON to this path"
    )

    r = sub.add_parser(
        "riot", help="parse RDF files and re-serialize (riot analog)")
    r.add_argument("--data", nargs="+", required=True,
                   help="RDF file(s)/glob(s)")
    r.add_argument("--out", default=None, help="output file (else stdout)")
    r.add_argument(
        "--syntax", default="nt",
        choices=["nt", "nq", "turtle", "rdfxml", "jsonld", "trix",
                 "rdfjson"],
        help="output syntax (default nt)",
    )

    v = sub.add_parser(
        "validate", help="SHACL / ShEx validation (shacl, shex commands)")
    v.add_argument("--data", nargs="+", required=True,
                   help="RDF data file(s)/glob(s)")
    v.add_argument("--shacl", default=None, help="SHACL shapes file (.ttl)")
    v.add_argument("--shex", default=None, help="ShEx schema file")
    v.add_argument("--map", dest="shape_map", default=None,
                   help="ShEx shape map text or file")
    v.add_argument("--out", default=None,
                   help="write the JSON report here (else stdout)")

    ld = sub.add_parser(
        "load", help="bulk-load RDF files into a partitioned triple table "
                     "(tdb2.tdbloader analog)")
    ld.add_argument("--data", nargs="+", required=True,
                    help="RDF file(s)/glob(s)")
    ld.add_argument("--out", required=True, help="output table directory")
    ld.add_argument("--buckets", type=int, default=16,
                    help="predicate-hash partition count")

    q = sub.add_parser("query", help="run a SPARQL query over RDF files")
    q.add_argument("--data", nargs="+", required=True, help="RDF file(s)/glob(s)")
    src = q.add_mutually_exclusive_group(required=True)
    src.add_argument("--query", help="SPARQL query text")
    src.add_argument("--query-file", help="file holding the query")
    q.add_argument("--out", default=None, help="output file (else stdout)")
    q.add_argument(
        "--format",
        default=None,
        choices=["csv", "tsv", "json", "xml", "nt"],
        help="result format (default: from --out extension, else csv / nt)",
    )
    return p


def _run_kg(ns) -> dict:
    from .pipelines.kg import kg_resumable
    from .stages.materialize import materialize

    t0 = time.monotonic()
    final, stats = kg_resumable(
        ns.sf_dir, ns.out, num_shards=ns.shards, reps=ns.reps
    )
    triples_dir = os.path.join(ns.out, "triples")
    done_marker = triples_dir + "._DONE"
    if stats.get("shards_computed", 1) == 0 and os.path.exists(done_marker):
        # all phase-1 shards skipped via lineage manifests and the triple
        # table finished on a prior submit — phase 2 is idempotent on the
        # same shards, so the existing table is current; re-materializing
        # would APPEND a second full copy (Ray write_parquet appends with
        # per-run UUID filenames)
        pass
    else:
        if os.path.isdir(triples_dir):
            # partial/previous table: rewrite from scratch (atomic-ish:
            # the _DONE marker is only written after a full materialize)
            import shutil

            if os.path.exists(done_marker):
                os.remove(done_marker)
            shutil.rmtree(triples_dir)
        materialize(final, triples_dir)
        with open(done_marker, "w") as f:
            f.write("ok\n")
    wall = time.monotonic() - t0
    import ray.data as rd

    n = rd.read_parquet(triples_dir).count()
    metrics = {
        "metric": "kg_resumable",
        "sf_dir": ns.sf_dir,
        "out": ns.out,
        "wall_sec": round(wall, 3),
        "triples": n,
        "triples_per_sec": round(n / wall, 1) if wall > 0 else None,
        **stats,
    }
    if ns.metrics:
        with open(ns.metrics, "w") as f:
            json.dump(metrics, f, indent=1, sort_keys=True)
    return metrics


def _run_riot(ns) -> dict:
    """Parse → re-serialize (the riot command: RDFDataMgr.read +
    RDFDataMgr.write, jena-cmds/.../riot.java). NT/NQ stream one line
    per triple; the document formats assemble via the grouped writers."""
    from . import read
    from .stages.serialize import format_nt_batch
    from .stages.writers import (
        assemble,
        jsonld_groups,
        rdfjson_groups,
        rdfxml_groups,
        trix_groups,
        turtle_pretty_groups,
    )

    ds = read(ns.data)
    n = ds.count()
    if ns.syntax in ("nt", "nq"):
        lines = ds.map_batches(format_nt_batch, batch_format="pyarrow")
        rows = [r["line"] for r in lines.take_all()]
        payload = "\n".join(rows) + ("\n" if rows else "")
    else:
        groups = {
            "turtle": turtle_pretty_groups,
            "rdfxml": rdfxml_groups,
            "jsonld": jsonld_groups,
            "trix": trix_groups,
            "rdfjson": rdfjson_groups,
        }[ns.syntax]
        payload = assemble(groups(ds), ns.syntax)
    if ns.out:
        with open(ns.out, "w") as f:
            f.write(payload)
    else:
        sys.stdout.write(payload)
    return {"metric": "riot", "triples": n, "syntax": ns.syntax,
            "out": ns.out}


def _run_validate(ns) -> dict:
    """SHACL / ShEx validation front door (the shacl validate / shex
    validate commands)."""
    from . import read

    if (ns.shacl is None) == (ns.shex is None):
        raise SystemExit("validate: pass exactly one of --shacl / --shex")
    data = read(ns.data)
    if ns.shacl:
        from .stages.shacl import validate

        report = validate(data, open(ns.shacl).read())
        rows = report.take_all()
        doc = {"metric": "shacl_validate", "conforms": not rows,
               "violations": rows}
    else:
        from .stages.shex import validate_shex

        smap = ns.shape_map
        if smap and os.path.exists(smap):
            smap = open(smap).read()
        report = validate_shex(data, open(ns.shex).read(), smap or "")
        rows = report.take_all()
        doc = {"metric": "shex_validate",
               "conforms": all(r["status"] == "conformant" for r in rows),
               "results": rows}
    payload = json.dumps(doc, indent=1, sort_keys=True, default=str)
    if ns.out:
        with open(ns.out, "w") as f:
            f.write(payload + "\n")
    else:
        sys.stdout.write(payload + "\n")
    return {k: doc[k] for k in ("metric", "conforms")} | {
        "rows": len(rows), "out": ns.out}


def _run_load(ns) -> dict:
    """Bulk load into the partitioned Parquet triple table — the
    tdb2.tdbloader analog (TDB2 index build = our predicate-bucket
    materialize; stages/materialize.py)."""
    from . import read
    from .stages.materialize import materialize

    t0 = time.monotonic()
    ds = read(ns.data)
    materialize(ds, ns.out, num_buckets=ns.buckets)
    import ray.data as rd

    n = rd.read_parquet(ns.out).count()
    wall = time.monotonic() - t0
    return {"metric": "load", "triples": n, "out": ns.out,
            "wall_sec": round(wall, 3),
            "triples_per_sec": round(n / wall, 1) if wall > 0 else None}


_RESULT_WRITERS = {"csv", "tsv", "json", "xml"}


def _run_query(ns) -> dict:
    from . import query as run_query
    from .stages.serialize import (
        format_nt_batch,
        results_csv,
        results_json,
        results_tsv,
        results_xml,
    )

    text = ns.query if ns.query is not None else open(ns.query_file).read()
    res = run_query(ns.data, text, with_meta=True)

    fmt = ns.format
    if fmt is None and ns.out:
        ext = os.path.splitext(ns.out)[1].lstrip(".").lower()
        fmt = ext if ext in _RESULT_WRITERS | {"nt"} else None

    if isinstance(res, bool):  # ASK
        payload = json.dumps({"head": {}, "boolean": res})
        fmt = fmt or "json"
    elif "s_kind" in res.schema().names:  # CONSTRUCT → triples
        lines = res.map_batches(format_nt_batch, batch_format="pyarrow")
        rows = [r["line"] for r in lines.take_all()]
        payload = "\n".join(rows) + ("\n" if rows else "")
        fmt = "nt"
    else:  # SELECT bindings
        if fmt not in ("tsv", "xml", "json", "csv"):
            fmt = "csv"
        payload = {
            "tsv": results_tsv,
            "xml": results_xml,
            "json": results_json,
            "csv": results_csv,
        }[fmt](res)

    if ns.out:
        with open(ns.out, "w") as f:
            f.write(payload)
    else:
        sys.stdout.write(payload if payload.endswith("\n") else payload + "\n")
    rows = None if isinstance(res, bool) else res.count()
    return {"metric": "query", "rows": rows, "format": fmt, "out": ns.out}


def main(argv: list[str] | None = None) -> dict:
    """Parse args and run one subcommand; returns the metrics dict.

    Reuses an already-initialised Ray session (in-process callers / the
    pytest fixture); initialises one only when none exists and tears it
    down again in that case.
    """
    ns = _build_parser().parse_args(argv)
    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    try:
        metrics = {
            "kg": _run_kg,
            "query": _run_query,
            "riot": _run_riot,
            "validate": _run_validate,
            "load": _run_load,
        }[ns.cmd](ns)
    finally:
        if owns:
            ray.shutdown()
    return metrics


if __name__ == "__main__":
    m = main()
    print(json.dumps(m))
