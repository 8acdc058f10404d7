"""CLI entry: ``python -m kiezray run conf.json`` (ray-job-submit shaped).

Config JSON mirrors the reference's Kiez kwargs (kiez.py:154-158) plus
pipeline keys:

{
  "pipeline": "er" | "align",
  "input": "<parquet/lance path of docs or embeddings>",
  "output": "<output dir>",
  "checkpoint_dir": "...",           # optional, enables resume
  "n_candidates": 10, "hubness": "CSLS", "hubness_kwargs": {...},
  "algorithm": "SklearnNN", "algorithm_kwargs": {...},
  "er": { ...ERConfig overrides... }
}

Owns its Ray session (guarded init) — the driver-contract entry points in
__ray_entry__ never reach this module.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="kiezray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run a pipeline from a JSON config")
    runp.add_argument("conf")
    runp.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    with open(args.conf) as f:
        conf = json.load(f)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            include_dashboard=False,
            logging_level="ERROR",
            **({"num_cpus": args.num_cpus} if args.num_cpus else {}),
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    try:
        pipeline = conf.get("pipeline", "er")
        out_dir = conf["output"]
        if pipeline == "er":
            from .io import read_docs
            from .pipelines.er import ERConfig, run_er

            er_kwargs = dict(conf.get("er", {}))
            if "checkpoint_dir" in conf:
                er_kwargs.setdefault("checkpoint_dir", conf["checkpoint_dir"])
            docs = read_docs(conf["input"])
            cols = set(docs.schema().names)
            if "spans" not in cols and "text" in cols:
                # plain (doc_id, text) table -> interleaved-span schema
                from .synth import docs_from_plain_text

                def adapt(t):
                    return docs_from_plain_text(
                        t.select(["doc_id", "text"])
                    )

                docs = docs.map_batches(adapt, batch_format="pyarrow")
            out = run_er(docs, ERConfig(**er_kwargs))
            out["clusters"].write_parquet(out_dir)
            print(json.dumps({"status": "ok", "output": out_dir}))
        elif pipeline == "align":
            from .kiez import Kiez

            kz = Kiez(
                n_candidates=conf.get("n_candidates", 10),
                algorithm=conf.get("algorithm"),
                algorithm_kwargs=conf.get("algorithm_kwargs"),
                hubness=conf.get("hubness"),
                hubness_kwargs=conf.get("hubness_kwargs"),
            )
            import ray.data as rd

            source = rd.read_parquet(conf["input"])
            target = (
                rd.read_parquet(conf["target"]) if "target" in conf else None
            )
            kz.fit(source, target)
            kz.kneighbors_dataset(conf.get("k")).write_parquet(out_dir)
            print(json.dumps({"status": "ok", "output": out_dir}))
        elif pipeline == "dedup":
            # config-driven corpus dedup over a (doc_id, text[, embedding])
            # table; writes (node, component) assignments (exact writes the
            # kept rows instead)
            from .io import read_docs

            method = conf.get("method", "minhash")
            kw = dict(conf.get("dedup", {}))
            ds = read_docs(conf["input"])
            if method == "exact":
                from .dedup import dedup_exact

                out = dedup_exact(
                    ds,
                    content_cols=list(conf.get("content_cols", ["text"])),
                    id_col=conf.get("id_col", "doc_id"),
                )
            elif method == "minhash":
                from .dedup import dedup_minhash_lsh

                out = dedup_minhash_lsh(
                    ds, id_col=conf.get("id_col", "doc_id"), **kw
                )
            elif method == "simhash":
                from .dedup import dedup_simhash

                out = dedup_simhash(
                    ds, id_col=conf.get("id_col", "doc_id"), **kw
                )
            elif method == "embedding":
                from .dedup import dedup_embedding_cosine

                out = dedup_embedding_cosine(
                    ds, id_col=conf.get("id_col", "row_id"), **kw
                )
            else:
                raise ValueError(f"unknown dedup method: {method}")
            out.write_parquet(out_dir)
            print(json.dumps({"status": "ok", "output": out_dir}))
        elif pipeline == "query":
            # run any registered driver query as a batch job: every
            # operator in the engine is submittable via ray job submit
            # with a two-key config ({"pipeline": "query", "name": ...,
            # "sf_dir": ..., "output": ...})
            from .pipelines.queries import QUERIES

            name = conf["name"]
            if name not in QUERIES:
                raise ValueError(
                    f"unknown query {name!r}; choose from "
                    f"{sorted(QUERIES)}"
                )
            res = QUERIES[name](conf["sf_dir"])
            if hasattr(res, "write_parquet"):
                res.write_parquet(out_dir)
                n = None
            else:  # small pandas/arrow result
                import os

                import pyarrow as pa
                import pyarrow.parquet as pq

                tbl = (
                    pa.Table.from_pandas(res, preserve_index=False)
                    if not isinstance(res, pa.Table)
                    else res
                )
                os.makedirs(out_dir, exist_ok=True)
                pq.write_table(tbl, f"{out_dir}/part-0.parquet")
                n = tbl.num_rows
            print(
                json.dumps({"status": "ok", "query": name, "output": out_dir,
                            "rows": n})
            )
        else:
            raise ValueError(f"unknown pipeline: {pipeline}")
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    main()
