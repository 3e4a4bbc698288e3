"""Byte-identical canonical output at two parallelism levels.

BASELINE.md determinism criterion: the same input at num_cpus=2 and
num_cpus=4 (fresh Ray sessions in fresh processes) must produce the same
canonical triple set hash — guaranteed by fixed-seed bnode labels,
min-doc_id dedup, and order-insensitive hashing of the output set.
"""

import json
import subprocess
import sys

import pytest

_SCRIPT = r"""
import hashlib, json, sys
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]), include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from jena_ray.pipelines.kg import kg_triples
from jena_ray.stages.serialize import format_nt_batch

ds = kg_triples("/root/testdata/sf0.001", linker_concurrency=2)
lines = []
for b in ds.map_batches(format_nt_batch, batch_format="pyarrow").iter_batches(
        batch_size=65536, batch_format="pyarrow"):
    lines.extend(b["line"].to_pylist())
lines.sort()
h = hashlib.blake2b("\n".join(lines).encode(), digest_size=16).hexdigest()
print(json.dumps({"n": len(lines), "hash": h}))
ray.shutdown()
"""


def _run(num_cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(num_cpus)],
        capture_output=True,
        text=True,
        check=True,
        cwd="/root/repo",
        timeout=420,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


@pytest.mark.slow
def test_output_identical_across_parallelism_levels():
    lo = _run(2)
    hi = _run(4)
    assert lo["n"] > 0
    assert lo == hi, f"non-deterministic output: {lo} vs {hi}"
