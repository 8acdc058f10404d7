"""Per-stage checkpointing with lineage manifests (north-rule resume).

Layout (resumable output: one directory per stage, partitioned parquet,
atomic rename, manifest):

    <ckpt_dir>/stage=<name>/part-*.parquet
    <ckpt_dir>/stage=<name>/_lineage.json
        {"stage", "fingerprint", "row_count", "schema", "wall_s",
         "completed_at"}

``run_stage`` skips recomputation when a completed manifest's fingerprint
matches the requested one (fingerprint = hash of upstream fingerprints +
stage config), otherwise computes, writes to a temp dir, atomically
renames, and returns a Dataset reading the checkpoint. A failed run
leaves either no dir or a temp dir that is ignored — rerun = resume.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import ray.data


def fingerprint(*parts) -> str:
    h = hashlib.sha1()
    for p in parts:
        h.update(json.dumps(p, sort_keys=True, default=str).encode())
        h.update(b"\x1f")
    return h.hexdigest()[:16]


def _stage_dir(ckpt_dir: str, name: str) -> str:
    return os.path.join(ckpt_dir, f"stage={name}")


def stage_is_complete(ckpt_dir: str, name: str, fp: str) -> bool:
    mpath = os.path.join(_stage_dir(ckpt_dir, name), "_lineage.json")
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            m = json.load(f)
        return m.get("fingerprint") == fp
    except (json.JSONDecodeError, OSError):
        return False


def run_stage(
    name: str,
    fp: str,
    make_ds,
    ckpt_dir: str | None,
    resume: bool = True,
    metrics: dict | None = None,
) -> "ray.data.Dataset":
    """Compute-or-reload one pipeline stage.

    make_ds: () -> Dataset (lazy). Without a ckpt_dir the stage pins its
    output in the object store (each stage output is consumed by more than
    one downstream pass; without pinning, laziness re-executes the whole
    upstream pipeline per consumer). With a ckpt_dir the parquet
    checkpoint is the pin.
    """
    if ckpt_dir is None:
        return make_ds().materialize()
    sdir = _stage_dir(ckpt_dir, name)
    data_dir = os.path.join(sdir, "data")
    if resume and stage_is_complete(ckpt_dir, name, fp):
        return ray.data.read_parquet(data_dir)
    tmp = sdir + f".tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(sdir, ignore_errors=True)
    t0 = time.time()
    ds = make_ds()
    tmp_data = os.path.join(tmp, "data")
    ds.write_parquet(tmp_data)
    if not os.path.isdir(tmp_data):
        # Ray writes NO directory for an empty dataset; publish an explicit
        # empty parquet (with the dataset schema when known) so resume
        # reads don't crash on a legitimately-empty stage/shard
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(tmp_data, exist_ok=True)
        try:
            sch = ds.schema(fetch_if_missing=True)
            tbl = pa.table(
                {n: pa.array([], type=t) for n, t in zip(sch.names, sch.types)}
            )
        except Exception:
            tbl = pa.table({})
        pq.write_table(tbl, os.path.join(tmp_data, "empty.parquet"))
    rows = ray.data.read_parquet(tmp_data).count()
    # per-partition lineage: one entry per output file, from parquet
    # footers only (no data read) — a resumed/debugging run can see which
    # partition produced how many rows without scanning the stage
    import pyarrow.parquet as _pq

    partitions = []
    for fn in sorted(os.listdir(tmp_data)):
        fpath = os.path.join(tmp_data, fn)
        try:
            md = _pq.read_metadata(fpath)
            partitions.append(
                {
                    "file": fn,
                    "rows": md.num_rows,
                    "bytes": os.path.getsize(fpath),
                }
            )
        except Exception:
            continue
    manifest = {
        "stage": name,
        "fingerprint": fp,
        "row_count": rows,
        "partitions": partitions,
        "wall_s": round(time.time() - t0, 3),
        "completed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    if metrics:
        manifest["metrics"] = metrics
    # manifest lands inside tmp, then one atomic rename publishes the stage:
    # a torn write can never present a complete-looking stage
    with open(os.path.join(tmp, "_lineage.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, sdir)
    return ray.data.read_parquet(data_dir)


def run_stage_sharded(
    name: str,
    fp: "str | list[str]",
    make_shard_ds,
    n_shards: int,
    ckpt_dir: str | None,
    resume: bool = True,
) -> "ray.data.Dataset":
    """Per-PARTITION lineage (north-rule resume granularity): each shard
    writes its own ``stage=<name>.shardNNNN`` directory + manifest and is
    individually skipped on resume, so a failed run redoes only the
    unfinished shards. ``make_shard_ds(i)`` must return shard i's rows
    (a deterministic, disjoint cover of the stage output).

    ``fp`` may be a list of per-shard fingerprints (content-addressed
    shards): a re-run then recomputes exactly the shards whose
    fingerprint changed — the incremental-maintenance path.
    """
    if ckpt_dir is None:
        parts = [make_shard_ds(i) for i in range(n_shards)]
        ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
        return ds.materialize()
    outs = []
    for i in range(n_shards):
        sub = run_stage(
            f"{name}.shard{i:04d}",
            fp[i] if isinstance(fp, list) else fp,
            lambda i=i: make_shard_ds(i),
            ckpt_dir,
            resume,
        )
        if sub.count() > 0:  # parquet metadata only; skip empty shards
            outs.append(sub)
    if not outs:
        return sub  # all empty: any one (empty) shard read is the result
    return outs[0].union(*outs[1:]) if len(outs) > 1 else outs[0]


def read_manifests(ckpt_dir: str) -> dict[str, dict]:
    out = {}
    if not os.path.isdir(ckpt_dir):
        return out
    for d in sorted(os.listdir(ckpt_dir)):
        mpath = os.path.join(ckpt_dir, d, "_lineage.json")
        if d.startswith("stage=") and os.path.exists(mpath):
            with open(mpath) as f:
                out[d[len("stage="):]] = json.load(f)
    return out
