"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "e2e_seconds", "value": <total>, "unit": "sec",
   "queries": {...per-pipeline seconds...}, "sf": ..., "num_cpus": N,
   "er_docs": D, "er_docs_per_s": R}

--scaling: runs the headline workload twice in fresh processes
(RAY_GRAFT_CPUS=4 and =16, OS-affinity-capped) on the same input and
prints both throughputs + scaling efficiency (rate_16/rate_4)/4 — the
sandbox substitute for the N->4N-node cluster rule.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _gflops_probe() -> float:
    """Fixed single-thread GEMM: per-core host speed for this window.

    This shared host swings >2x between measurement windows (observed
    10-30 GFLOPS); shipping the probe with every result lets rounds be
    compared speed-normalized instead of blaming code for the window."""
    import numpy as np

    a = np.random.RandomState(0).rand(1500, 1500)
    t0 = time.time()
    a @ a
    return round(2 * 1500**3 / (time.time() - t0) / 1e9, 1)


def _mt_gflops_probe(threads: int | None = None) -> float:
    """Parallel GEMM across a pool of Python threads (BLAS releases the
    GIL): aggregate GFLOPS under multi-core load. The single-thread
    probe is blind to co-tenant contention that only shows up when all
    cores are busy — this probe sees it, so a scaling run can flag (or
    retry) a window where the probe degrades mid-measurement."""
    import threading as th

    import numpy as np

    if threads is None:
        threads = min(8, os.cpu_count() or 8)
    mats = [
        np.random.RandomState(i).rand(1200, 1200) for i in range(threads)
    ]

    def work(m):
        m @ m

    ts = [th.Thread(target=work, args=(m,)) for m in mats]
    t0 = time.time()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return round(threads * 2 * 1200**3 / (time.time() - t0) / 1e9, 1)


def run_scaling():
    """N->4N scaling evidence (sandbox substitute for two cluster sizes):
    the HEADLINE ER pipeline on the same deterministic corpus, sized so
    compute dominates fixed costs, in two fresh processes at
    num_cpus=8 and 32. Efficiency = (rate_32 / rate_8) / 4."""

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SCALING_ONLY="1",
            GRAFT_SCALING_ENTITIES=os.environ.get("GRAFT_SCALING_ENTITIES", "32000"),
        )
        out = subprocess.run(
            [sys.executable, "bench.py"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 4, 16
    # one run per level under hard OS cpu-affinity caps (set inside
    # bench main); affinity makes the level real, so single runs are
    # comparable despite co-tenant noise. The multi-core probe brackets
    # each leg: if it degrades >20% across the window (contention the
    # single-thread probe cannot see), the whole measurement re-runs
    # once and, failing that, ships flagged — self-validating either way.
    max_attempts = max(1, int(os.environ.get("GRAFT_SCALING_ATTEMPTS", "2")))
    for attempt in range(1, max_attempts + 1):
        probes = [_mt_gflops_probe()]
        r_hi = run(hi)
        probes.append(_mt_gflops_probe())
        r_lo = run(lo)
        probes.append(_mt_gflops_probe())
        drift = round((max(probes) - min(probes)) / max(probes), 3)
        eff = (r_hi["er_docs_per_s"] / r_lo["er_docs_per_s"]) / (hi / lo)
        # super-linear efficiency is physically impossible for this fixed
        # workload on fixed hardware: it means co-tenant load crushed the
        # low-parallelism leg in a gap the probes didn't bracket. Such a
        # run is INVALID (not merely unfavorable) — retry it the same as
        # a drifting window. The 1.05 margin covers measurement noise.
        window_stable = drift <= 0.2 and eff <= 1.05
        if window_stable:
            break
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
                "er_docs": r_hi["er_docs"],
                "num_cpus": [lo, hi],
                "host_gflops": _gflops_probe(),
                "host_gflops_mt": probes,
                "mt_probe_drift": drift,
                "window_stable": window_stable,
                "attempts": attempt,
            }
        )
    )


def run_scaling_workload(num_cpus: int):
    """Scaling criterion workload: the kiez headline job — embed the
    synthetic interleaved corpus, then hubness-reduced alignment (dual
    exact candidate search + CSLS rerank + top-k) source side vs target
    side. Compute-dominated (one GEMM per query batch per direction), so
    per-core work scales with the actor pool; shuffle-bound stages are
    benchmarked separately in the default mode (on ONE node they share
    memory bandwidth, which a multi-node 4N cluster would not)."""
    import time

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pcmp
    import ray.data

    from kiezray.embed import embed_docs
    from kiezray.kiez import Kiez
    from kiezray.synth import generate_docs

    n_ent = int(os.environ.get("GRAFT_SCALING_ENTITIES", "32000"))
    docs, _, _ = generate_docs(
        n_entities=n_ent, seed=42, hub_entities=4, hub_copies=64
    )
    n_docs = docs.num_rows
    docs = docs.append_column(
        "row_id", pa.array(np.arange(n_docs, dtype=np.int64))
    )
    ds = ray.data.from_arrow(docs).repartition(num_cpus * 2).materialize()

    t0 = time.time()
    emb = embed_docs(ds, concurrency=num_cpus).materialize()

    def side(parity: int):
        return emb.map_batches(
            lambda t, p=parity: pa.table(
                {
                    "row_id": pcmp.divide(
                        t.filter(
                            pcmp.equal(pcmp.bit_wise_and(t["row_id"], 1), p)
                        )["row_id"],
                        2,
                    ),
                    "embedding": t.filter(
                        pcmp.equal(pcmp.bit_wise_and(t["row_id"], 1), p)
                    )["embedding"],
                }
            ),
            batch_format="pyarrow",
        )

    kz = Kiez(
        n_candidates=10,
        algorithm="exact",
        # float32 + large query batches: GEMM streams the target matrix
        # once per 2048 queries instead of once per 256 -> 8x less memory
        # traffic on this bandwidth-bound host
        algorithm_kwargs={"metric": "euclidean", "dtype": "float32"},
        hubness="csls",
        batch_size=1024,
        concurrency=num_cpus,  # fixed pool: autoscaling ramps too slowly
    )
    kz.fit(side(0), side(1))
    n_out = kz.kneighbors_dataset(10).count()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "e2e_seconds",
                "value": round(dt, 3),
                "unit": "sec",
                "queries": {"alignment": round(dt, 3)},
                "sf": "synthetic",
                "num_cpus": num_cpus,
                "er_docs": n_docs,
                "er_clusters": n_out,
                "er_docs_per_s": round(n_docs / dt, 1),
            }
        )
    )


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    # hard-cap the process tree (ray inherits this) so the parallelism
    # level is enforced by the OS, not just by Ray's scheduler slots —
    # otherwise co-tenant noise on this shared host dominates the ratio
    try:
        os.sched_setaffinity(0, set(range(min(num_cpus, os.cpu_count()))))
    except OSError:
        pass
    er_entities = int(os.environ.get("GRAFT_ER_ENTITIES", "4000"))

    host_gflops = _gflops_probe()
    host_gflops_mt = _mt_gflops_probe()

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

    scaling_only = os.environ.get("GRAFT_SCALING_ONLY") == "1"
    if scaling_only:
        run_scaling_workload(num_cpus)
        ray.shutdown()
        return

    # drift robustness (this host's throughput swings >2x between
    # measurement windows): every query runs REPEATS times and the
    # reported per-query number is the MEDIAN; raw runs ship alongside
    # so windows can be compared honestly
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    all_runs: dict[str, list] = {}

    def timed(name: str, fn):
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            out = fn()
            if hasattr(out, "materialize"):
                out = out.materialize()
                out.count()
            runs.append(round(time.time() - t0, 3))
        runs.sort()
        timings[name] = runs[len(runs) // 2]
        all_runs[name] = runs

    # warm the page cache + actor pools once, untimed
    Q.q_knn_basic(sf_dir).materialize()

    timed("knn_basic", lambda: Q.q_knn_basic(sf_dir))
    timed("knn_csls", lambda: Q.q_knn_csls(sf_dir))
    timed("knn_dsl", lambda: Q.q_knn_dsl(sf_dir))
    timed("k_occurrence", lambda: Q.q_k_occurrence(sf_dir))
    timed("ann_cosine", lambda: Q.q_ann_cosine(sf_dir))
    timed("text_stats", lambda: Q.q_text_stats(sf_dir))
    timed("dedup_exact", lambda: Q.q_dedup_exact(sf_dir))
    # substring-dedup family (r4 verdict: regressions here were invisible
    # to the bench): the discovery+marking pass and the composed
    # curation funnel
    timed("dup_spans", lambda: Q.q_dup_spans(sf_dir))
    timed("curation", lambda: Q.q_curation(sf_dir))
    # capstone: the full raw-corpus -> curation -> mixing -> chunk
    # manifests funnel (final-session addition, regression-visible)
    timed("training_mixture", lambda: Q.q_training_mixture(sf_dir))

    # headline: synthetic interleaved-doc ER at bench scale (deterministic,
    # per input_hint: synthesize at small scale for benchmarks); median of
    # REPEATS full runs, with the median run's per-stage breakdown
    docs, _, _ = generate_docs(
        n_entities=er_entities, seed=42, hub_entities=4, hub_copies=64
    )
    n_docs = docs.num_rows
    ds = ray.data.from_arrow(docs).repartition(num_cpus * 2).materialize()
    er_runs = []
    for _ in range(repeats):
        t0 = time.time()
        out = run_er(ds, ERConfig(concurrency=(1, max(2, num_cpus // 2))))
        n_docs_out = out["clusters"].count()
        assert n_docs_out == n_docs, (n_docs_out, n_docs)
        n_clusters = len(out["clusters"].unique("cluster_id"))
        er_runs.append(
            (round(time.time() - t0, 3), out.get("stage_seconds", {}))
        )
    er_runs.sort(key=lambda r: r[0])
    er_s, er_stages = er_runs[len(er_runs) // 2]
    timings["er_pipeline"] = er_s
    all_runs["er_pipeline"] = [r[0] for r in er_runs]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "e2e_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "query_runs": all_runs,
                "er_stages": er_stages,
                "bench_repeats": repeats,
                "sf": sf_dir,
                "num_cpus": num_cpus,
                "host_gflops": host_gflops,
                "host_gflops_mt": host_gflops_mt,
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
