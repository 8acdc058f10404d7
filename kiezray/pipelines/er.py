"""Flagship entity-resolution pipeline (the north rule, end to end):

    interleaved docs -> embed (actor pool, zero-copy Arrow)
                     -> LSH blocking keys + skew-aware block splitting
                     -> per-block hubness-reduced pair scoring
                        (CSLS-family kernels on within-block kNN)
                     -> pair dedup + threshold
                     -> transitive clustering (label-propagation CC)

Every stage can checkpoint through kiezray.lineage (per-stage partitioned
parquet + manifest); rerunning with the same config resumes after the
last completed stage. The blocking key is the single partitioning key:
pair scoring is a ``groupby(block_key).map_groups`` whose group size is
bounded by the skew splitter, so no stage ever materializes an unbounded
group or the full corpus.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..arrowutil import emb_to_matrix
from ..block import blocking_keys
from ..cluster import connected_components
from ..embed import embed_docs
from ..lineage import fingerprint, run_stage, run_stage_sharded
from ..rerank import csls


# coarse scoring-partition count: make_scored's add_part AND
# _shard_fingerprints MUST use the same value — shard membership is
# (block_hash % SCORE_PARTITIONS) % n_shards on both sides, and a
# divergence would let incremental resume reuse a stale shard
SCORE_PARTITIONS = 64

_LOOKUP_CACHE: dict = {}


def _shard_lookup(refs):
    """Per-worker-process cache of the broadcast embedding shards as one
    (pd.Index, matrix) pair — fetched from the object store once per
    process, not per group/batch."""
    key = tuple(r.hex() for r in refs)
    if key not in _LOOKUP_CACHE:
        import ray

        from ..arrowutil import emb_to_matrix as _e2m

        ids_list, mats = [], []
        for r in refs:
            obj = ray.get(r)
            if isinstance(obj, tuple):
                i, m = obj
            else:  # arrow block from the worker-side normalize stage
                i = np.asarray(obj["doc_id"].to_pylist(), dtype=object)
                m = _e2m(obj["embedding"])
            ids_list.append(i)
            mats.append(m)
        index = pd.Index(np.concatenate(ids_list))
        _LOOKUP_CACHE.clear()
        _LOOKUP_CACHE[key] = (index, np.concatenate(mats))
    return _LOOKUP_CACHE[key]


@dataclass
class ERConfig:
    dim: int = 512
    bands: int = 8
    rows_per_band: int = 4
    shingle_k: int = 4
    seed: int = 42
    n_candidates: int = 8
    sim_threshold: float = 0.70
    hubness: str = "csls"  # 'csls' | 'nicdm' | 'ls' | 'none'
    max_block: int = 256
    checkpoint_dir: str | None = None
    resume: bool = True
    concurrency: tuple = (1, 8)
    #: how pair-scoring workers get embeddings:
    #:  - "ride" (default): raw float32 embeddings ride the band explode
    #:    into the ONE scoring shuffle (groupby part) and are normalized
    #:    inside the scorer. No join exchange at all, and x bands
    #:    duplication of the 2-KB float32 rows is half the wire bytes of
    #:    the join path's float64 packing — no node ever holds the
    #:    corpus, so this is also the 10^12-doc path;
    #:  - "join": embeddings ship via a hash join keyed on doc_id onto
    #:    the exploded keys (kept as the general-purpose fallback when
    #:    blocking keys are NOT derivable from the embedded batch alone);
    #:  - "broadcast": normalized shards in the object store, per-process
    #:    lookup cache — only viable while the corpus embedding table fits
    #:    every node's object store.
    emb_transport: str = "ride"
    extra: dict = field(default_factory=dict)

    def __post_init__(self):
        # JSON configs can only express lists; Ray requires tuple concurrency
        if isinstance(self.concurrency, list):
            self.concurrency = tuple(self.concurrency)
        # a typo'd transport must not silently fall through to the
        # broadcast tier (the whole-corpus-per-node path the caller may
        # have explicitly opted out of)
        if self.emb_transport not in ("ride", "join", "broadcast"):
            raise ValueError(
                "emb_transport must be 'ride', 'join' or 'broadcast',"
                f" got {self.emb_transport!r}"
            )


class BlockPairScorer:
    """Per-block pair scoring with within-block hubness reduction.

    Inside one block (bounded by max_block docs): cosine distance matrix,
    per-doc top-c neighbor lists, CSLS rescaling with the block-local
    calibration means (both directions are the same matrix for this
    self-alignment). CSLS governs candidate RANKING (hub demotion); the
    match decision thresholds the raw cosine similarity — CSLS values are
    recentered and not comparable against a fixed tau. Mirrors the
    reference rerank semantics (csls.py:88-93) with block = universe.
    """

    def __init__(self, n_candidates: int, sim_threshold: float, hubness: str):
        self.c = n_candidates
        self.tau = sim_threshold
        self.hubness = hubness

    def score_block(
        self, ids: np.ndarray, mat: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """ids (n,) object/str, mat (n, d) L2-normalized rows ->
        (a, b, score) numpy arrays."""
        n = len(ids)
        empty = (ids[:0], ids[:0], np.empty(0))
        if n < 2:
            return empty
        dist = 1.0 - mat @ mat.T
        np.fill_diagonal(dist, np.inf)
        c = min(self.c, n - 1)
        idx = np.argpartition(dist, kth=c - 1, axis=1)[:, :c]
        dvals = np.take_along_axis(dist, idx, axis=1)
        order = np.argsort(dvals, kind="stable", axis=1)
        I = np.take_along_axis(idx, order, axis=1)
        D = np.take_along_axis(dvals, order, axis=1)
        if self.hubness in ("csls", "nicdm", "ls"):
            from ..rerank import CalibrationStats, local_scaling
            from ..rerank import nicdm as nicdm_kernel

            if self.hubness == "csls":
                stats = CalibrationStats(
                    method="csls", r_mean=D.mean(axis=1)
                )
                sec = csls(D, I, stats)
            elif self.hubness == "nicdm":
                stats = CalibrationStats(
                    method="nicdm", r_mean=D.mean(axis=1)
                )
                sec = nicdm_kernel(D, I, stats)
            else:  # 'ls' standard local scaling
                stats = CalibrationStats(method="ls", r_kth=D[:, -1])
                sec = local_scaling(D, I, stats)
            order2 = np.argsort(sec, kind="stable", axis=1)
            I = np.take_along_axis(I, order2, axis=1)
            D = np.take_along_axis(D, order2, axis=1)
        score = 1.0 - D
        a_idx = np.repeat(np.arange(n), c)
        b_idx = I.ravel()
        sc = score.ravel()
        keep = sc >= self.tau
        if not keep.any():
            return empty
        a_ids = ids[a_idx[keep]]
        b_ids = ids[b_idx[keep]]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return lo, hi, np.round(sc[keep], 6)

    def __call__(self, part: pa.Table, lookup=None) -> pa.Table:
        """Score ONE COARSE PARTITION holding many whole blocks.

        Blocks are tiny (often 1-4 docs), so per-block pandas frames cost
        more than the math; instead groups are delimited with numpy over
        the partition sorted by block_key and each block is scored with
        pure-numpy slices. ``lookup`` = (pd.Index of doc ids, normalized
        embedding matrix) from the broadcast shards; ``lookup=None``
        means the partition carries its own normalized ``embedding``
        column (emb_transport="join").
        """
        if len(part) == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        if "block_hash" in part.column_names:
            # int64 grouping key: 8-byte sort instead of string sort (the
            # band index in the top bits makes cross-band aliasing
            # impossible; residual 56-bit collisions are ~n^2/2^57)
            keys = part["block_hash"].to_numpy(zero_copy_only=False)
        else:
            keys = np.asarray(part["block_key"].to_pylist(), dtype=object)
        ids = np.asarray(part["doc_id"].to_pylist(), dtype=object)
        # composite (block, doc_id) sort: scoring is a pure function of
        # the partition's row SET — arrival order (which shuffle/join
        # implementations do not guarantee) can no longer flip
        # equal-distance tie-breaks between runs
        order = np.lexsort((ids, keys))
        keys = keys[order]
        ids = ids[order]
        if lookup is not None:
            index, all_mat = lookup
            mat = all_mat[index.get_indexer(ids)]
        elif "embedding_bin" in part.column_names:
            # join transport: binary-packed normalized float64 rows
            # (Arrow's hash join rejects list columns)
            blobs = part["embedding_bin"].to_pylist()
            mat = np.frombuffer(b"".join(blobs), dtype=np.float64).reshape(
                len(blobs), -1
            )[order]
        else:
            # ride transport: raw float32 fsl rows rode the band explode;
            # normalize here (same float64 math as the join path's
            # norm_emb, so scores are identical)
            mat = emb_to_matrix(part["embedding"]).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mat = (mat / norms)[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1], [True]))
        )
        # batched-by-size scoring: all blocks of one size advance together
        # as a (B, s, d) tensor — one einsum + one (arg)sort family per
        # DISTINCT size instead of ~15 numpy calls per tiny block (77% of
        # blocks have <= 2 docs; measured 1.9x on the bench corpus kernel).
        # Tie-breaks among equal distances may differ from the per-block
        # path (both are valid top-c picks); scores are identical.
        starts = bounds[:-1]
        sizes = np.diff(bounds)
        out_a, out_b, out_s = [], [], []
        # bound the (B, s, s) distance tensor to ~64 MB per chunk: the
        # old per-block path peaked at O(max_block^2); without a cap,
        # thousands of max_block-sized chunks landing in one partition
        # (hub-heavy corpora) would build a multi-GB tensor at once
        TENSOR_BUDGET = 64 << 20
        for s in np.unique(sizes):
            if s < 2:
                continue
            sel_all = starts[sizes == s]
            b_max = max(1, int(TENSOR_BUDGET // (int(s) * int(s) * 8)))
            for chunk in range(0, len(sel_all), b_max):
                self._score_size_group(
                    ids, mat, sel_all[chunk : chunk + b_max], int(s),
                    out_a, out_b, out_s,
                )
        if not out_a:
            return pa.table(
                {
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a).tolist(), pa.string()),
                "b": pa.array(np.concatenate(out_b).tolist(), pa.string()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    def _score_size_group(
        self, ids, mat, sel, s, out_a, out_b, out_s
    ) -> None:
        """Score one bounded chunk of same-size blocks as (B, s, ...)
        tensors; appends surviving pairs to the out_* accumulators."""
        B = len(sel)
        if B == 0:
            return
        idx = sel[:, None] + np.arange(s)  # (B, s) global row indices
        M = mat[idx]  # (B, s, d)
        dist = 1.0 - np.einsum("bij,bkj->bik", M, M, optimize=True)
        ii = np.arange(s)
        dist[:, ii, ii] = np.inf
        c = min(self.c, s - 1)
        if c < s - 1:
            I3 = np.argpartition(dist, kth=c - 1, axis=2)[:, :, :c]
            D3 = np.take_along_axis(dist, I3, axis=2)
            o = np.argsort(D3, kind="stable", axis=2)
            I3 = np.take_along_axis(I3, o, axis=2)
            D3 = np.take_along_axis(D3, o, axis=2)
        else:
            I3 = np.argsort(dist, kind="stable", axis=2)[:, :, :c]
            D3 = np.take_along_axis(dist, I3, axis=2)
        if self.hubness in ("csls", "nicdm", "ls"):
            bidx = np.arange(B)[:, None, None]
            # block-local calibration per row: candidate-mean (csls /
            # nicdm) or kth-candidate distance (ls) — same formulas as
            # the 2-D rerank kernels, batched over blocks
            r = (
                D3[:, :, -1]
                if self.hubness == "ls"
                else D3.mean(axis=2)
            )  # (B, s)
            rI = r[bidx, I3]
            if self.hubness == "csls":
                sec = 2.0 * D3 - r[:, :, None] - rI
            elif self.hubness == "nicdm":
                sec = D3 / np.sqrt(r[:, :, None] * rI)
            else:
                sec = 1.0 - np.exp(-(D3**2) / (r[:, :, None] * rI))
            o2 = np.argsort(sec, kind="stable", axis=2)
            I3 = np.take_along_axis(I3, o2, axis=2)
            D3 = np.take_along_axis(D3, o2, axis=2)
        score = 1.0 - D3
        keep = score >= self.tau
        if not keep.any():
            return
        bidx = np.arange(B)[:, None, None]
        a_glob = np.broadcast_to(idx[:, :, None], I3.shape)[keep]
        b_glob = idx[np.broadcast_to(bidx, I3.shape), I3][keep]
        a_ids = ids[a_glob]
        b_ids = ids[b_glob]
        out_a.append(np.minimum(a_ids, b_ids))
        out_b.append(np.maximum(a_ids, b_ids))
        out_s.append(np.round(score[keep], 6))


def _docs_fingerprint(docs_ds: "ray.data.Dataset") -> str:
    """Order-independent CONTENT fingerprint of the input corpus:
    XOR-fold of per-doc hashes over (doc_id, full span sequence — kind,
    text, media_ref, position), plus the row count. One streaming pass,
    combiner partials only — makes every whole-stage checkpoint
    input-addressed, so a changed corpus (including a same-length text
    edit) can never silently reuse a stale checkpoint."""

    def partial(t: pa.Table) -> pa.Table:
        from ..dedup import _splitmix64

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(ids.astype(object)).astype(np.uint64)
        if "spans" in t.column_names:
            col = t["spans"].combine_chunks()
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            # content hash of every span field (vectorized siphash over
            # the flat child arrays), order-mixed by within-doc position
            flat = col.values
            hs = np.zeros(len(flat), dtype=np.uint64)
            for fname in ("kind", "text", "media_ref"):
                if fname in [f.name for f in flat.type]:
                    vals = flat.field(fname).to_pandas().to_numpy(dtype=object)
                    with np.errstate(over="ignore"):
                        hs = _splitmix64(
                            hs ^ pd.util.hash_array(vals).astype(np.uint64)
                        )
            pos = (
                np.arange(len(flat), dtype=np.int64)
                - np.repeat(offs[:-1], np.diff(offs))
            ).astype(np.uint64)
            with np.errstate(over="ignore"):
                hs = _splitmix64(hs + pos * np.uint64(0x9E3779B97F4A7C15))
            per_doc = np.zeros(len(ids), dtype=np.uint64)
            seg = np.repeat(np.arange(len(ids)), np.diff(offs))
            np.bitwise_xor.at(per_doc, seg, hs)
            h = _splitmix64(h ^ _splitmix64(per_doc))
        elif "text" in t.column_names:
            th = pd.util.hash_array(
                t["text"].to_pandas().fillna("").to_numpy(dtype=object)
            ).astype(np.uint64)
            h = _splitmix64(h ^ _splitmix64(th))
        x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table(
            {
                "x": pa.array([np.int64(np.uint64(x))], pa.int64()),
                "c": pa.array([len(h)], pa.int64()),
            }
        )

    parts = docs_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    x = np.bitwise_xor.reduce(parts["x"].to_numpy().view(np.uint64))
    return f"{int(parts['c'].sum())}-{int(x):016x}"


def _shard_fingerprints(
    keys_ds: "ray.data.Dataset", n_shards: int, P: int | None = None
) -> list[str]:
    """Per-scoring-shard content fingerprints: XOR-fold of hashed
    (doc_id, block_hash) rows grouped by shard = (block_hash % P) %
    n_shards, plus per-shard counts. A new/changed/removed doc flips
    exactly the shards its blocks map to, so resume re-scores ONLY
    those — incremental ER maintenance with byte-identical results (a
    block never spans partitions, so per-shard outputs compose).

    Identity proxy: a doc is its (id, band-signature set). Band keys
    are minhashes of the full span text, so a content change that
    leaves every band key identical has probability ~ sim^perms — the
    standard LSH identity assumption, documented here explicitly."""
    from ..dedup import _splitmix64

    if P is None:
        P = SCORE_PARTITIONS

    def partial(t: pa.Table) -> pa.Table:
        bh = t["block_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hid = pd.util.hash_array(ids.astype(object)).astype(np.uint64)
        row = _splitmix64(hid ^ _splitmix64(bh))
        shard = ((bh % np.uint64(P)) % np.uint64(n_shards)).astype(np.int64)
        x = np.zeros(n_shards, dtype=np.uint64)
        np.bitwise_xor.at(x, shard, row)
        c = np.bincount(shard, minlength=n_shards)
        return pa.table(
            {
                "shard": pa.array(np.arange(n_shards), pa.int64()),
                "x": pa.array(x.view(np.int64), pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    parts = keys_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    xs = parts["x"].to_numpy().view(np.uint64).reshape(-1, n_shards)
    cs = parts["c"].to_numpy().reshape(-1, n_shards)
    x = np.bitwise_xor.reduce(xs, axis=0)
    c = cs.sum(axis=0)
    return [f"{int(c[i])}-{int(x[i]):016x}" for i in range(n_shards)]


def run_er(
    docs_ds: "ray.data.Dataset",
    config: ERConfig | None = None,
) -> dict:
    """Run the full pipeline; returns dict with 'clusters' (doc_id,
    cluster_id), 'pairs' (a, b, score), and 'embedded' Datasets.

    With a checkpoint_dir, every stage fingerprint is INPUT-ADDRESSED
    (corpus content fingerprint mixed in) and the expensive scoring
    stage is fingerprinted PER SHARD from the blocking outcome — so
    re-running over a grown/changed corpus recomputes the cheap linear
    stages plus only the scoring shards whose blocks changed, and the
    clusters are byte-identical to a from-scratch run (incremental ER
    maintenance; see test_incremental_er_matches_full_run)."""
    import time as _time

    cfg = config or ERConfig()
    cfg_fp = fingerprint(asdict(cfg))  # config identity (scoring params)
    ck = cfg.checkpoint_dir
    # whole-stage checkpoints are input-addressed (config + corpus
    # content); scoring shards use per-shard blocking-content fps below
    stage_fp = (
        fingerprint(cfg_fp, _docs_fingerprint(docs_ds))
        if ck is not None
        else cfg_fp
    )
    stage_seconds: dict[str, float] = {}

    def _timed(name, fn):
        t0 = _time.time()
        out = fn()
        stage_seconds[name] = round(_time.time() - t0, 3)
        return out

    embedded = _timed("embed", lambda: run_stage(
        "embed",
        fingerprint(stage_fp, "embed"),
        lambda: embed_docs(
            docs_ds, dim=cfg.dim, concurrency=cfg.concurrency
        ),
        ck,
        cfg.resume,
    ))

    from ..block import oversized_block_payload, salt_stream

    # salt decisions are shared between the checkpointed narrow keys and
    # the ride transport's wide re-keying: stash the payload ref when the
    # block stage computes it fresh; the ride path recomputes it from a
    # narrow re-key only on checkpoint resume (make_keys skipped)
    _salt_box: dict = {}

    def _narrow_keys():
        return blocking_keys(
            embedded,
            bands=cfg.bands,
            rows_per_band=cfg.rows_per_band,
            shingle_k=cfg.shingle_k,
            seed=cfg.seed,
            carry_cols=(),
            concurrency=cfg.concurrency,
            # int64 block_hash is the pipeline's partition identity;
            # skipping the human-readable string keys drops the per-row
            # f-string pass and shrinks the blocking shuffle
            emit_string_keys=False,
        )

    def make_keys():
        # keys stay (doc_id, block_hash) ONLY — the checkpointed blocking
        # artifact is narrow; embeddings reach the scorer via the
        # configured transport instead
        keys = _narrow_keys().materialize()
        ref = oversized_block_payload(keys, cfg.max_block)
        _salt_box["ref"] = ref
        return salt_stream(keys, ref)

    if ck is None and cfg.emb_transport == "ride":
        # no checkpoint to write and the ride transport re-keys wide
        # inside scoring: the narrow salted-keys dataset would have no
        # consumer, so the block stage reduces to the salt payload (one
        # streaming histogram pass, nothing materialized)
        def _payload_only():
            _salt_box["ref"] = oversized_block_payload(
                _narrow_keys(), cfg.max_block
            )

        _timed("block", _payload_only)
        keys = None
    else:
        keys = _timed("block", lambda: run_stage(
            "block", fingerprint(stage_fp, "block"), make_keys, ck, cfg.resume
        ))

    def make_scored(shard: int | None = None, n_shards: int = 1):
        """Scored candidate pairs; with ``shard`` set, only the coarse
        partitions with part % n_shards == shard (a disjoint cover — a
        block never spans partitions, so per-shard scoring is exact)."""
        import zlib

        import ray

        from ..arrowutil import matrix_to_fsl

        # normalization runs in WORKER tasks; the driver never touches the
        # data (the round-1 driver-side iter_batches loop was the measured
        # serial floor in the scaling run)
        def norm_emb(t: pa.Table) -> pa.Table:
            mat = emb_to_matrix(t["embedding"]).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "embedding": matrix_to_fsl(mat / norms, pa.float64()),
                }
            )

        def make_emb_norm():
            return embedded.select_columns(
                ["doc_id", "embedding"]
            ).map_batches(
                norm_emb,  # per-input-block (no coalescing): parallel tasks
                batch_format="pyarrow",
                zero_copy_batch=True,
            )

        scorer = BlockPairScorer(cfg.n_candidates, cfg.sim_threshold, cfg.hubness)
        # coarse hash partitions: each map_groups call scores MANY whole
        # blocks with numpy (per-tiny-block overhead killed); a block never
        # spans two partitions because partition = f(block_key)
        P = SCORE_PARTITIONS

        def add_part(t: pa.Table) -> pa.Table:
            if "block_hash" in t.column_names:  # vectorized int path
                bh = t["block_hash"].to_numpy(zero_copy_only=False)
                part = pa.array(
                    (bh.astype(np.uint64) % P).astype(np.int32), pa.int32()
                )
            else:
                part = pa.array(
                    [
                        zlib.crc32(k.encode()) % P
                        for k in t["block_key"].to_pylist()
                    ],
                    pa.int32(),
                )
            return t.append_column("part", part)

        def shard_filter(t: pa.Table) -> pa.Table:
            part = t["part"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(part % n_shards == shard))

        if cfg.emb_transport == "ride":
            # no join at all: raw float32 embeddings ride the band
            # explode, the salt rewrite and the ONE scoring shuffle;
            # the scorer normalizes per partition. Unsharded, the wide
            # stream is never materialized — it flows straight into the
            # groupby.
            if "ref" not in _salt_box:  # checkpoint resume skipped make_keys
                _salt_box["ref"] = oversized_block_payload(
                    _narrow_keys(), cfg.max_block
                )

            def make_parted():
                wide = blocking_keys(
                    embedded,
                    bands=cfg.bands,
                    rows_per_band=cfg.rows_per_band,
                    shingle_k=cfg.shingle_k,
                    seed=cfg.seed,
                    carry_cols=("embedding",),
                    concurrency=cfg.concurrency,
                    emit_string_keys=False,
                )
                return salt_stream(wide, _salt_box["ref"]).map_batches(
                    add_part, batch_format="pyarrow"
                )

            if shard is None:
                parted = make_parted()
            else:
                # sharded-checkpoint path: rebuilding the band explode
                # per shard would re-shingle the corpus n_shards times —
                # materialize the parted wide stream ONCE per run (the
                # checkpointing caller already opted into IO-heavy
                # durability; resume-skipped shards never reach here, so
                # a mostly-done resume still blocks at most once)
                if "parted" not in _salt_box:
                    _salt_box["parted"] = make_parted().materialize()
                parted = _salt_box["parted"].map_batches(
                    shard_filter, batch_format="pyarrow", zero_copy_batch=True
                )
            return parted.groupby("part").map_groups(
                lambda g: scorer(g), batch_format="pyarrow"
            )

        parted = keys.map_batches(add_part, batch_format="pyarrow")
        if shard is not None:
            parted = parted.map_batches(
                shard_filter, batch_format="pyarrow", zero_copy_batch=True
            )

        if cfg.emb_transport == "join":
            # 10^12-doc path: embeddings ride the partition shuffle via a
            # hash join on doc_id (x bands duplication) — no node ever
            # holds the whole corpus embedding table. Rows are packed as
            # binary (Arrow's hash join rejects list payload columns).
            def to_bin(t: pa.Table) -> pa.Table:
                from ..arrowutil import matrix_to_binary

                return pa.table(
                    {
                        "doc_id": t["doc_id"],
                        "embedding_bin": matrix_to_binary(
                            emb_to_matrix(t["embedding"])
                        ),
                    }
                )

            emb_bin = make_emb_norm().map_batches(
                to_bin, batch_format="pyarrow", zero_copy_batch=True
            )
            parted = parted.join(
                emb_bin, join_type="inner", num_partitions=16, on=("doc_id",)
            )

            def score_partition_inline(g: pa.Table) -> pa.Table:
                return scorer(g)

            scored = parted.groupby("part").map_groups(
                score_partition_inline, batch_format="pyarrow"
            )
        else:
            # broadcast path: normalized shards in the object store, read
            # zero-copy once per node, per-process lookup cache
            emb_shards = make_emb_norm().materialize().to_arrow_refs()

            def score_partition(g: pa.Table) -> pa.Table:
                lookup = _shard_lookup(emb_shards)
                return scorer(g, lookup)

            scored = parted.groupby("part").map_groups(
                score_partition, batch_format="pyarrow"
            )
        return scored

    from ..dedup import dedup_pair_rows

    if ck is None:
        pairs = _timed("score_pairs", lambda: run_stage(
            "pairs",
            fingerprint(stage_fp, "pairs"),
            # exact pair dedup keeping the best score (hash-partitioned
            # vectorized unique; multi-key aggregates are slow in this Ray)
            lambda: dedup_pair_rows(make_scored(), score_col="score"),
            ck,
            cfg.resume,
        ))
    else:
        # per-PARTITION lineage (north rule): scoring — the expensive
        # stage — checkpoints in N_SHARDS independently-resumable shards.
        # Shard fingerprints are CONTENT-ADDRESSED from the blocking
        # outcome (per-shard XOR of hashed (doc_id, block_hash) rows), so
        # re-running over a grown corpus recomputes only the shards whose
        # blocks changed — incremental ER with byte-identical clusters.
        N_SHARDS = int(cfg.extra.get("pair_shards", 8))
        shard_fps = _shard_fingerprints(keys, N_SHARDS)
        scored_all = _timed("score", lambda: run_stage_sharded(
            "pairs_scored",
            [
                fingerprint(cfg_fp, "pairs_scored", shard_fps[i])
                for i in range(N_SHARDS)
            ],
            lambda i: make_scored(shard=i, n_shards=N_SHARDS),
            N_SHARDS,
            ck,
            cfg.resume,
        ))
        pairs = _timed("pair_dedup", lambda: run_stage(
            "pairs",
            fingerprint(stage_fp, "pairs"),
            lambda: dedup_pair_rows(scored_all, score_col="score"),
            ck,
            cfg.resume,
        ))

    def make_clusters():
        nodes = docs_ds.select_columns(["doc_id"]).map_batches(
            lambda t: pa.table({"node": t["doc_id"]}), batch_format="pyarrow"
        )
        comp = connected_components(pairs, extra_nodes_ds=nodes)
        return comp.map_batches(
            lambda t: pa.table(
                {"doc_id": t["node"], "cluster_id": t["component"]}
            ),
            batch_format="pyarrow",
        )

    clusters = _timed("cluster", lambda: run_stage(
        "clusters", fingerprint(stage_fp, "clusters"), make_clusters, ck, cfg.resume
    ))

    return {
        "embedded": embedded,
        "pairs": pairs,
        "clusters": clusters,
        "stage_seconds": stage_seconds,
    }


def oracle_clusters(
    docs_tbl: pa.Table, cfg: ERConfig | None = None
) -> dict[str, str]:
    """Exact-search reference implementation (no blocking, no Ray): the
    conformance target for pairwise F1. All-pairs cosine over the same
    embeddings + same CSLS scoring + same threshold + union-find."""
    from ..cluster import connected_components_local
    from ..embed import doc_text_and_media, embed_text
    from ..rerank import CalibrationStats

    cfg = cfg or ERConfig()
    ids = docs_tbl["doc_id"].to_pylist()
    spans = docs_tbl["spans"].to_pylist()
    mat = np.stack(
        [embed_text(*doc_text_and_media(sp), cfg.dim) for sp in spans]
    )
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1
    mat = mat / norms
    dist = 1.0 - mat @ mat.T
    np.fill_diagonal(dist, np.inf)
    n = len(ids)
    c = min(cfg.n_candidates, n - 1)
    idx = np.argsort(dist, axis=1)[:, :c]
    D = np.take_along_axis(dist, idx, axis=1)
    if cfg.hubness in ("csls", "nicdm", "ls"):
        from ..rerank import local_scaling
        from ..rerank import nicdm as nicdm_kernel

        if cfg.hubness == "csls":
            stats = CalibrationStats(method="csls", r_mean=D.mean(axis=1))
            sec = csls(D, idx, stats)
        elif cfg.hubness == "nicdm":
            stats = CalibrationStats(method="nicdm", r_mean=D.mean(axis=1))
            sec = nicdm_kernel(D, idx, stats)
        else:
            stats = CalibrationStats(method="ls", r_kth=D[:, -1])
            sec = local_scaling(D, idx, stats)
        order2 = np.argsort(sec, kind="stable", axis=1)
        idx = np.take_along_axis(idx, order2, axis=1)
        D = np.take_along_axis(D, order2, axis=1)
    score = 1.0 - D
    edges = []
    for i in range(n):
        for j_pos in range(c):
            if score[i, j_pos] >= cfg.sim_threshold:
                a, b = ids[i], ids[int(idx[i, j_pos])]
                edges.append((min(a, b), max(a, b)))
    comp = connected_components_local(edges, nodes=ids)
    return comp
