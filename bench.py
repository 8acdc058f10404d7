"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "e2e_seconds", "value": <total>, "unit": "sec",
   "queries": {...per-pipeline seconds...}, "sf": ..., "num_cpus": N,
   "er_docs": D, "er_docs_per_s": R}

--scaling: runs the bench twice in fresh processes (RAY_GRAFT_CPUS=8 and
=32) on the same input and prints both throughputs + scaling efficiency
(T8/T32)/4 — the sandbox substitute for the N->4N-node cluster rule.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_scaling():
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, "bench.py"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                f"sec_{lo}": r_lo["value"],
                f"sec_{hi}": r_hi["value"],
                f"er_docs_per_s_{lo}": r_lo["er_docs_per_s"],
                f"er_docs_per_s_{hi}": r_hi["er_docs_per_s"],
                "num_cpus": [lo, hi],
            }
        )
    )


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    er_entities = int(os.environ.get("GRAFT_ER_ENTITIES", "4000"))

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from kiezray.pipelines import queries as Q
    from kiezray.pipelines.er import ERConfig, run_er
    from kiezray.synth import generate_docs

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        if hasattr(out, "materialize"):
            out = out.materialize()
            out.count()
        timings[name] = round(time.time() - t0, 3)
        return out

    # warm the page cache + actor pools once, untimed
    Q.q_knn_basic(sf_dir).materialize()

    timed("knn_basic", lambda: Q.q_knn_basic(sf_dir))
    timed("knn_csls", lambda: Q.q_knn_csls(sf_dir))
    timed("knn_dsl", lambda: Q.q_knn_dsl(sf_dir))
    timed("k_occurrence", lambda: Q.q_k_occurrence(sf_dir))
    timed("ann_cosine", lambda: Q.q_ann_cosine(sf_dir))
    timed("text_stats", lambda: Q.q_text_stats(sf_dir))
    timed("dedup_exact", lambda: Q.q_dedup_exact(sf_dir))

    # headline: synthetic interleaved-doc ER at bench scale (deterministic,
    # per input_hint: synthesize at small scale for benchmarks)
    docs, _, _ = generate_docs(
        n_entities=er_entities, seed=42, hub_entities=4, hub_copies=64
    )
    n_docs = docs.num_rows
    ds = ray.data.from_arrow(docs).repartition(num_cpus * 2)
    t0 = time.time()
    out = run_er(ds, ERConfig(concurrency=(1, max(2, num_cpus // 2))))
    n_docs_out = out["clusters"].count()
    assert n_docs_out == n_docs, (n_docs_out, n_docs)
    n_clusters = len(out["clusters"].unique("cluster_id"))
    er_s = round(time.time() - t0, 3)
    timings["er_pipeline"] = er_s

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "e2e_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "num_cpus": num_cpus,
                "er_docs": n_docs,
                "er_clusters": n_clusters,
                "er_docs_per_s": round(n_docs / er_s, 1),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        main()
