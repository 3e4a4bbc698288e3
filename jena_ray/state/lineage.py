"""Per-partition lineage manifests + checkpoint/resume.

The reference has no loader checkpointing (transactions are
all-or-nothing, jena-tdb2/.../loader/base/); its change-log model is RDF
Patch (jena-rdfpatch/.../RDFChanges.java:30-120). For a 100 TB batch run
we need partition-level resume instead (SURVEY §4 "checkpoint/resume"):

- the input corpus is split into SHARDS (contiguous seed-row ranges);
  each shard's output is written to its own directory, atomically
  (write to `<out>/.tmp-<shard>`, fsync, rename to `<out>/shard=<shard>`)
- a manifest JSON per shard records: input shard spec, row counts, a
  content hash of the output, and a config hash of the pipeline stages
- resume = enumerate shards, skip those whose manifest verifies (same
  config hash + files present); only missing/stale shards are recomputed

This makes a failed 100 TB run re-run only unfinished shards; the
deterministic pipeline (fixed-seed bnode labels, min-doc_id dedup) makes
shard outputs byte-stable so the content hash doubles as an integrity
and determinism check.
"""

from __future__ import annotations

import hashlib
import json
import os


def config_hash(config: dict) -> str:
    blob = json.dumps(config, sort_keys=True).encode()
    return hashlib.blake2b(blob, digest_size=16).hexdigest()


def _manifest_path(out_dir: str, shard: str) -> str:
    return os.path.join(out_dir, "_manifests", f"{shard}.json")


def shard_done(out_dir: str, shard: str, cfg_hash: str) -> bool:
    path = _manifest_path(out_dir, shard)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    if m.get("config_hash") != cfg_hash:
        return False
    shard_dir = os.path.join(out_dir, f"shard={shard}")
    if not os.path.isdir(shard_dir):
        return False
    files = sorted(
        f for f in os.listdir(shard_dir) if not f.startswith(".")
    )
    return files == m.get("files")


_MOD128 = 1 << 128


def _row_hash_sum(tbl) -> int:
    """Vectorized order-insensitive row-hash fold (the sameas._sig_kernel
    pattern): rows encode as schema-tagged '\\x1f'-joined string columns
    (one pyarrow kernel), hashed by two fixed-key siphash passes
    (pd.util.hash_array — deterministic across worker processes,
    vectorized in C) for 128 bits, summed exactly in bigints."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return 0
    names = sorted(tbl.schema.names)
    sig = pa.scalar(
        "|".join(f"{n}:{tbl.schema.field(n).type}" for n in names),
        pa.large_string(),
    )
    cols = [
        pc.fill_null(
            pc.cast(tbl.column(n), pa.large_string()), "\x00NULL\x00"
        )
        for n in names
    ]
    joined = pc.binary_join_element_wise(
        sig, *cols, pa.scalar("\x1f", pa.large_string())
    )
    arr = np.asarray(joined.to_pylist(), dtype=object)
    h1 = pd.util.hash_array(arr, hash_key="jenaraycontent00")
    h2 = pd.util.hash_array(arr, hash_key="jenaraycontent01")
    s1 = int(h1.astype(object).sum())
    s2 = int(h2.astype(object).sum())
    return ((s1 << 64) + s2) % _MOD128


def content_hash_of_table(tbl) -> str:
    """Order-insensitive content hash of an Arrow table: vectorized
    per-row 128-bit hashes combined by addition mod 2^128."""
    return f"{_row_hash_sum(tbl):032x}"


def content_hash_of_dataset(ds) -> str:
    """Distributed variant of :func:`content_hash_of_table`: per-block
    partial sums computed in map_batches (rows never leave the object
    store), combined on the driver mod 2^128. Produces the SAME value as
    the table variant for the same rows (order-insensitive — the fold is
    commutative and linear across blocks)."""
    import pyarrow as pa

    def _partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {"partial": pa.array([f"{_row_hash_sum(t):032x}"], pa.string())}
        )

    acc = 0
    # one 32-char row per block — tiny driver-side result
    for row in ds.map_batches(_partial, batch_format="pyarrow").take_all():
        acc = (acc + int(row["partial"], 16)) % _MOD128
    return f"{acc:032x}"


def write_shard_dataset(
    out_dir: str, shard: str, ds, cfg_hash: str, extra: dict | None = None
):
    """Atomically write one shard from a Dataset — `ds.write_parquet` into
    the tmp dir (distributed, no driver concat), manifest hashed by the
    distributed content hash, then a rename commit."""
    import shutil

    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    tmp_dir = os.path.join(out_dir, f".tmp-{shard}")
    final_dir = os.path.join(out_dir, f"shard={shard}")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    ds = ds.materialize()
    ds.write_parquet(tmp_dir)
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)
    manifest = {
        "shard": shard,
        "rows": ds.count(),
        "content_hash": content_hash_of_dataset(ds),
        "config_hash": cfg_hash,
        "files": sorted(os.listdir(final_dir)),
        **(extra or {}),
    }
    mpath = _manifest_path(out_dir, shard)
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(mpath + ".tmp", mpath)
    return manifest


def write_shard(out_dir: str, shard: str, tbl, cfg_hash: str, extra: dict | None = None):
    """Atomically write one shard's output + its manifest."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    tmp_dir = os.path.join(out_dir, f".tmp-{shard}")
    final_dir = os.path.join(out_dir, f"shard={shard}")
    os.makedirs(tmp_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(tmp_dir, "part-0.parquet"))
    if os.path.isdir(final_dir):
        import shutil

        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)
    manifest = {
        "shard": shard,
        "rows": tbl.num_rows,
        "content_hash": content_hash_of_table(tbl),
        "config_hash": cfg_hash,
        "files": sorted(os.listdir(final_dir)),
        **(extra or {}),
    }
    mpath = _manifest_path(out_dir, shard)
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(mpath + ".tmp", mpath)
    return manifest


def read_manifests(out_dir: str) -> dict[str, dict]:
    mdir = os.path.join(out_dir, "_manifests")
    out = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out[name[:-5]] = json.load(f)
    return out
