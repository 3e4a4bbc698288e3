"""Benchmark harness.

Headline: the flagship KG-construction pipeline (corpus synth → extract →
link → canonicalize → sameAs closure → dedup → count) over
$GRAFT_SF_DIR (default sf0.1), corpus scaled by $BENCH_REPS (default 20:
5000 seed docs × 20 = 100k interleaved documents).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "triples": N, "triples_per_sec": N}

--scaling: runs the headline twice in fresh processes at num_cpus=8 and
32 on the same input and reports throughputs + scaling efficiency
(the sandbox substitute for N vs 4N cluster sizes — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _init_ray(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _warm_cache(sf_dir: str):
    for name in ("documents", "orders", "lineitem", "customer", "events", "embeddings"):
        path = f"{sf_dir}/{name}.parquet"
        if os.path.exists(path):
            with open(path, "rb") as f:
                while f.read(1 << 22):
                    pass


def run_bench(sf_dir: str, num_cpus: int, reps: int) -> dict:
    from jena_ray.pipelines.kg import kg_triples
    from jena_ray.pipelines.queries import REGISTRY

    _warm_cache(sf_dir)

    t0 = time.perf_counter()
    n_triples = kg_triples(
        sf_dir, reps=reps, linker_concurrency=(max(1, num_cpus // 2), num_cpus)
    ).count()
    headline = time.perf_counter() - t0

    query_times: dict[str, float] = {}
    for name in (
        "agg_groupby",
        "join_broadcast",
        "topk",
        "distinct",
        "window_tumbling",
        "connected_components",
        "string_funcs",
        "datetime_funcs",
        # round-2 operator families (kept additive — earlier rounds'
        # queries stay comparable). dedup_ngram_jaccard is correctness-
        # gated at sf0.01 but excluded here: its sf0.1 shingle table is
        # ~15M string-keyed rows and the exact-parity requirement rules
        # out int-hashed keys, so it dominates the bench (~2 min).
        "bgp_star_join",
        "sparql_select",
        "path_star_alt",
        "owl_transitive_in",
        # round-3 operator families
        "sparql_update",
        "rule_forward_chain",
        # round-5 training-data families. dedup_winnow is correctness-
        # gated at sf0.01 but excluded here for the same reason as
        # dedup_ngram_jaccard: its exact fingerprint pair algebra on
        # this low-entropy synthetic corpus fans out quadratically at
        # sf0.1 and dominates the bench.
        "corpus_filter",
        "seq_pack",
        "source_mix",
    ):
        fn, _ = REGISTRY[name]
        t0 = time.perf_counter()
        res = fn(sf_dir)
        # consume (count) to force full execution
        res.count()
        query_times[name] = round(time.perf_counter() - t0, 3)

    return {
        "metric": "kg_construct_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": query_times,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "reps": reps,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / headline, 1),
    }


def _run_subprocess(num_cpus: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(num_cpus), BENCH_HEADLINE_ONLY="1")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_REPS", "20"))

    if "--scaling" in sys.argv:
        # N vs 4N parallelism (fresh processes, same input). Default pair
        # 2→8: on this single box, 8→32 additionally measures shared
        # object-store / memory-bus contention (all "nodes" share one
        # plasma store and memory bus), which a real multi-node cluster
        # does not have — both pairs are reported in BASELINE.md.
        lo = int(os.environ.get("SCALING_LO", "2"))
        hi = int(os.environ.get("SCALING_HI", str(lo * 4)))
        # larger corpus: amortize fixed per-run costs (actor ramp-up,
        # shuffle setup, driver-side closure) so the parallel fraction is
        # what gets measured
        os.environ.setdefault("BENCH_REPS", str(reps * 5))
        reps = int(os.environ["BENCH_REPS"])
        r_lo = _run_subprocess(lo)
        r_hi = _run_subprocess(hi)
        eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency",
                    f"sec_{lo}": r_lo["value"],
                    f"sec_{hi}": r_hi["value"],
                    f"triples_per_sec_{lo}": r_lo["triples_per_sec"],
                    f"triples_per_sec_{hi}": r_hi["triples_per_sec"],
                    "cpus_lo": lo,
                    "cpus_hi": hi,
                    "scaling_efficiency": round(eff, 3),
                    "sf": sf_dir,
                    "reps": reps,
                }
            )
        )
        return

    _init_ray(num_cpus)
    try:
        if os.environ.get("BENCH_HEADLINE_ONLY") == "1":
            from jena_ray.pipelines.kg import kg_triples

            _warm_cache(sf_dir)
            t0 = time.perf_counter()
            n = kg_triples(
                sf_dir, reps=reps,
                linker_concurrency=(max(1, num_cpus // 2), num_cpus),
            ).count()
            dt = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "metric": "kg_construct_pipeline_sec",
                        "value": round(dt, 3),
                        "unit": "sec",
                        "queries": {},
                        "sf": sf_dir,
                        "num_cpus": num_cpus,
                        "reps": reps,
                        "triples": n,
                        "triples_per_sec": round(n / dt, 1),
                    }
                )
            )
        else:
            print(json.dumps(run_bench(sf_dir, num_cpus, reps)))
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    main()
