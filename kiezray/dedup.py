"""Deduplication operators for large-scale training-data pipelines.

All are Ray-Data-first: vectorized per-batch hashing/sketching inside
``map_batches``, grouped shuffles only over the (much smaller) key space,
and transitive closure via kiezray.cluster label propagation. The
reference has no dedup (SURVEY.md §2.6); these are the engine's
training-data extensions.

 - exact:        content hash -> hash-partitioned group -> keep min id
 - minhash-LSH:  shingle -> minhash sig -> band buckets -> candidate pairs
                 -> signature-jaccard verify -> connected components
 - simhash:      64-bit simhash -> band buckets -> hamming verify -> CC
 - n-gram jaccard: exact set jaccard on candidate pairs within buckets
 - embedding:    cosine near-dup via the sharded ANN search stage
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .cluster import connected_components

# deterministic 64-bit mix constants (splitmix64)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(30)
        x = (x * _M1) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(27)
        x = (x * _M2) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(31)
    return x


def content_keys(
    t: "pa.Table", content_cols: "list[str]"
) -> "tuple[np.ndarray, np.ndarray]":
    """The engine-wide vectorized 128-bit multi-column content identity:
    two independent 64-bit streams (pandas' C siphash with distinct
    keys) folded column-wise through splitmix64 — no per-row string
    join / sha1 (collision odds over the full pair space at 10^12 rows
    are ~2^-48; cryptographic strength is not required for grouping
    identity). The ONE definition ``dedup_exact``, ``dedup_keep_best``
    and ``dedup_canonical`` all key on — change it here or nowhere."""
    h1 = np.zeros(len(t), dtype=np.uint64)
    h2 = np.zeros(len(t), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in content_cols:
            arr = t[c].to_numpy(zero_copy_only=False)
            h1 = _splitmix64(
                h1 * np.uint64(31)
                + pd.util.hash_array(arr).astype(np.uint64)
            )
            h2 = _splitmix64(
                h2 * np.uint64(31)
                + pd.util.hash_array(
                    arr, hash_key="kiezraydedup2key"
                ).astype(np.uint64)
            )
    return h1, h2


def text_key128(txt: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Single-text-column 128-bit identity: the two independently keyed
    siphash64 streams WITHOUT the multi-column fold — the exact-text
    grouping convention of the curation pipeline and the corpus
    version diff. None hashes to its own constant, so NULL text forms
    its own group exactly like SQL's ``PARTITION BY text``."""
    h1 = pd.util.hash_array(txt).astype(np.uint64)
    h2 = pd.util.hash_array(txt, hash_key="kiezraydedup2key").astype(
        np.uint64
    )
    return h1, h2


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Deterministic 64-bit hashes of the character k-shingles of a text.

    Vectorized for k <= 8: the UTF-8 byte stream is viewed as sliding
    windows and packed into uint64 words, then mixed with splitmix64 —
    no per-shingle Python. Falls back to crc32 per shingle for k > 8.
    """
    t = text.lower()
    if len(t) < k:
        t = t + " " * (k - len(t))
    if k <= 8:
        buf = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(buf) < k:  # multibyte edge: re-pad in byte space
            buf = np.pad(buf, (0, k - len(buf)), constant_values=32)
        win = np.lib.stride_tricks.sliding_window_view(buf, k).astype(np.uint64)
        weights = (np.uint64(256) ** np.arange(k, dtype=np.uint64)).astype(
            np.uint64
        )
        with np.errstate(over="ignore"):
            packed = (win * weights[None, :]).sum(axis=1, dtype=np.uint64)
        return _splitmix64(np.unique(packed))
    raw = np.array(
        [zlib.crc32(t[i : i + k].encode("utf-8")) for i in range(len(t) - k + 1)],
        dtype=np.uint64,
    )
    return _splitmix64(np.unique(raw))


def dedup_pair_rows(
    ds: "ray.data.Dataset",
    score_col: str | None = None,
    num_partitions: int = 64,
    min_count: int = 1,
) -> "ray.data.Dataset":
    """Distinct (a, b) pair rows (keeping the max ``score_col`` if given);
    ``min_count`` keeps only pairs appearing at least that often (e.g. 2
    for mutual-direction edges).

    Multi-key groupby aggregates are slow in this Ray version, so pairs
    are hash-partitioned on (a, b) and deduped per partition with one
    vectorized np.unique/lexsort pass — 64 coarse groups instead of one
    group per pair.
    """

    def add_part(t: pa.Table) -> pa.Table:
        # partition = deterministic function of the (a, b) pair; pandas'
        # vectorized siphash replaces the per-row crc32 loop (the dedup
        # itself keys on the full pair inside the partition)
        ha = pd.util.hash_array(
            np.asarray(t["a"].to_pylist(), dtype=object)
        ).astype(np.uint64)
        hb = pd.util.hash_array(
            np.asarray(t["b"].to_pylist(), dtype=object)
        ).astype(np.uint64)
        with np.errstate(over="ignore"):
            mixed = _splitmix64(ha * np.uint64(3) + hb)
        part = pa.array(
            (mixed % np.uint64(num_partitions)).astype(np.int32), pa.int32()
        )
        return t.append_column("__part", part)

    def dedup_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__part"])
        if len(g) == 0:
            return g
        keys = (
            g["a"].astype(str) + "\x1f" + g["b"].astype(str)
        ).to_numpy(dtype=object)
        if score_col is not None:
            order = np.lexsort((-g[score_col].to_numpy(), keys))
        else:
            order = np.argsort(keys, kind="stable")
        keys = keys[order]
        first = np.concatenate(([True], keys[1:] != keys[:-1]))
        if min_count > 1:
            starts = np.flatnonzero(first)
            counts = np.diff(np.append(starts, len(keys)))
            first = first.copy()
            first[starts[counts < min_count]] = False
        return g.iloc[order[first]]

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(dedup_partition, batch_format="pandas")
    )


def batch_minhash(
    texts: list[str],
    a: np.ndarray,
    b: np.ndarray,
    shingle_k: int,
) -> np.ndarray:
    """(n_docs, num_perm) minhash signatures, fully vectorized.

    All docs' shingle hashes are concatenated once; each permutation is
    one fused multiply-add over the flat vector and the per-doc minima
    come from ``np.minimum.reduceat`` on the doc offsets — no per-doc
    Python in the permutation loop.
    """
    num_perm = len(a)
    n = len(texts)
    sigs = np.zeros((n, num_perm), dtype=np.uint64)
    if n == 0:
        return sigs
    if shingle_k <= 8:
        # whole-batch path: ONE sliding-window/pack/mix pass over the
        # concatenated byte buffer instead of ~10 tiny numpy calls per
        # doc (_shingle_hashes). Signatures are bit-identical to the
        # per-doc path: padding replicates _shingle_hashes exactly
        # (string-pad to k chars, then byte-pad to k), boundary-crossing
        # windows are dropped by the gather, and the per-doc np.unique
        # is unnecessary — the permutation MIN over a multiset equals
        # the min over its set.
        k = shingle_k
        bufs = []
        lens = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            s = (t or "").lower()
            if len(s) < k:
                s = s + " " * (k - len(s))
            bb = s.encode("utf-8")
            if len(bb) < k:  # multibyte edge: re-pad in byte space
                bb = bb + b" " * (k - len(bb))
            bufs.append(bb)
            lens[i] = len(bb)
        big = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        win = np.lib.stride_tricks.sliding_window_view(big, k)
        weights = (np.uint64(256) ** np.arange(k, dtype=np.uint64)).astype(
            np.uint64
        )
        with np.errstate(over="ignore"):
            # pack in window-axis chunks: a one-shot astype would
            # materialize (total_bytes, k) uint64 — 8k bytes per input
            # byte — whereas chunking caps the temporary at ~CH*k*8
            # bytes regardless of batch size (results are identical;
            # the loop body is pure elementwise)
            CH = 1 << 22
            packed = np.empty(len(win), dtype=np.uint64)
            for s in range(0, len(win), CH):
                e = min(s + CH, len(win))
                packed[s:e] = (
                    win[s:e].astype(np.uint64) * weights[None, :]
                ).sum(axis=1, dtype=np.uint64)
            hashes = _splitmix64(packed)
            # gather each doc's valid window starts (drop windows that
            # straddle a doc boundary); every doc has >= 1 by padding
            n_win = lens - k + 1
            out_off = np.zeros(n, dtype=np.int64)
            np.cumsum(n_win[:-1], out=out_off[1:])
            ar = (
                np.arange(int(n_win.sum()), dtype=np.int64)
                - np.repeat(out_off, n_win)
                + np.repeat(offs[:-1], n_win)
            )
            flat = hashes[ar]
            for p in range(num_perm):
                vals = flat * a[p] + b[p]
                sigs[:, p] = np.minimum.reduceat(vals, out_off)
        return sigs
    hash_list = [_shingle_hashes(t or "", shingle_k) for t in texts]
    lens = np.array([len(h) for h in hash_list], dtype=np.int64)
    nonempty = lens > 0
    if not nonempty.any():
        return sigs
    flat = np.concatenate([h for h in hash_list if len(h)])
    ne_lens = lens[nonempty]
    offsets = np.zeros(len(ne_lens), dtype=np.int64)
    np.cumsum(ne_lens[:-1], out=offsets[1:])
    out_ne = np.empty((int(nonempty.sum()), num_perm), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            vals = flat * a[p] + b[p]
            out_ne[:, p] = np.minimum.reduceat(vals, offsets)
    sigs[nonempty] = out_ne
    return sigs


def dedup_exact(
    ds: "ray.data.Dataset",
    content_cols: list[str],
    id_col: str = "doc_id",
    num_partitions: int = 64,
    keep_cols: list[str] | None = None,
) -> "ray.data.Dataset":
    """Keep the minimum-id row of each exact-content group.

    One shuffle, no driver state: rows are hash-partitioned on the content
    hash (a hash can never span two partitions) and each partition keeps
    its per-hash min-id row with a single vectorized lexsort pass. Coarse
    partitions — not per-hash groups — because per-group ``map_groups``
    overhead dominates at high key cardinality.

    ``keep_cols`` (id_col is always kept) restricts which columns ride
    the shuffle and appear in the output: a caller that only needs the
    surviving ids shuffles ~28 B/row of hashes instead of the document
    payload — the difference between a metadata shuffle and re-moving
    the corpus at the 100-TB tier. Default (None) keeps every column.
    """

    def add_keys(t: pa.Table) -> pa.Table:
        h1, h2 = content_keys(t, content_cols)
        part = (h1 % np.uint64(num_partitions)).astype(np.int32)
        if keep_cols is not None:
            carried = [id_col] + [c for c in keep_cols if c != id_col]
            t = t.select(carried)
        return (
            t.append_column("__ch1", pa.array(h1.astype(np.int64), pa.int64()))
            .append_column("__ch2", pa.array(h2.astype(np.int64), pa.int64()))
            .append_column("__part", pa.array(part, pa.int32()))
        )

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        aux = ["__ch1", "__ch2", "__part"]
        if len(g) == 0:
            return g.drop(columns=aux)
        c1 = g["__ch1"].to_numpy()
        c2 = g["__ch2"].to_numpy()
        order = np.lexsort((g[id_col].to_numpy(), c2, c1))
        c1, c2 = c1[order], c2[order]
        first = np.concatenate(
            ([True], (c1[1:] != c1[:-1]) | (c2[1:] != c2[:-1]))
        )
        return g.iloc[order[first]].drop(columns=aux)

    return (
        ds.map_batches(add_keys, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(keep_min, batch_format="pandas")
    )


class MinHasher:
    """Actor-pool stage: text -> (num_perm,) minhash signature.

    Permutation parameters are derived deterministically in __init__ (once
    per actor, the stateful-stage pattern).
    """

    def __init__(
        self, text_col: str = "text", num_perm: int = 64, shingle_k: int = 3,
        seed: int = 42,
    ):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 2**61 - 1, size=num_perm, dtype=np.uint64) | 1
        self.b = rng.randint(0, 2**61 - 1, size=num_perm, dtype=np.uint64)
        self.text_col = text_col
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.shingle_k)
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            vals = (h[None, :] * self.a[:, None] + self.b[:, None]) & np.uint64(
                0xFFFFFFFFFFFFFFFF
            )
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = batch_minhash(texts, self.a, self.b, self.shingle_k)
        flat = pa.array(sigs.astype(np.int64).ravel(), pa.int64())
        sig_col = pa.FixedSizeListArray.from_arrays(flat, self.num_perm)
        return batch.append_column("minhash", sig_col)


def minhash_signatures(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 3,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            text_col=text_col, num_perm=num_perm, shingle_k=shingle_k
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _bucket_partition_column(t: pa.Table, P: int) -> pa.Array:
    """Partition id per (bucket) row: splitmix on the int64 packed bucket
    (fast path — no Python strings anywhere), vectorized siphash fallback
    for string buckets from custom callers."""
    col = t["bucket"]
    if pa.types.is_integer(col.type):
        h = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (_splitmix64(h) % np.uint64(P)).astype(np.int32)
    else:
        part = (
            pd.util.hash_array(np.asarray(col.to_pylist(), dtype=object)) % P
        ).astype(np.int32)
    return pa.array(part, pa.int32())


def _bucket_sort_keys(g) -> np.ndarray:
    col = g["bucket"]
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False)
    return np.asarray(col.to_pylist(), dtype=object)


def _pack_bucket(band_idx: np.ndarray, mix: np.ndarray) -> pa.Array:
    """(band, 64-bit band hash) -> one int64 bucket key: band index in the
    top 8 bits, hash in the low 56 — the identity of the old 'b:hash'
    strings with zero string formatting and 8-byte instead of string
    shuffles."""
    packed = (
        (band_idx.astype(np.uint64) << np.uint64(56))
        ^ (mix.astype(np.uint64) >> np.uint64(8))
    ).astype(np.int64)
    return pa.array(packed, pa.int64())


def _candidate_pairs_from_buckets(
    exploded: "ray.data.Dataset", id_col: str, max_bucket: int = 200
) -> "ray.data.Dataset":
    """(bucket, id) rows -> distinct candidate pairs (a < b).

    ``max_bucket`` is the skew guard: a bucket with b members emits
    O(b^2) pairs, so oversized buckets (degenerate shingles, boilerplate)
    are truncated to the smallest ``max_bucket`` ids — the standard LSH
    hot-bucket cap.

    Buckets are mostly tiny, so they are scored per COARSE hash partition
    (one numpy pass over many whole buckets) rather than per-bucket pandas
    frames, and the pair dedup is a vectorized grouped Count.
    """
    from ray.data.aggregate import Count

    P = 64

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("part", _bucket_partition_column(t, P))

    def pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
        buckets = g["bucket"].to_numpy()
        order = np.argsort(buckets, kind="stable")
        buckets = buckets[order]
        ids = g[id_col].to_numpy()[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], buckets[1:] != buckets[:-1], [True]))
        )
        out_a, out_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            mem = np.sort(ids[s:e])[:max_bucket]
            ai, bi = np.triu_indices(len(mem), k=1)
            out_a.append(mem[ai])
            out_b.append(mem[bi])
        if not out_a:
            return pd.DataFrame(
                {"a": g[id_col].iloc[:0], "b": g[id_col].iloc[:0]}
            )
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    cand = (
        exploded.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_partition, batch_format="pandas")
    )
    return dedup_pair_rows(cand)


def _explode_band_buckets(
    t: pa.Table,
    id_col: str,
    num_perm: int,
    bands: int,
    carry_sigs: bool,
) -> pa.Table:
    """Shared LSH banding explode: one (id, int64-packed bucket) row per
    (doc, band); with ``carry_sigs`` the signature rides each row so the
    in-bucket verify needs no second shuffle. The ONE copy of the
    band-mix logic — every LSH pipeline (minhash, weighted minhash,
    ngram candidates) calls this."""
    rows_per_band = num_perm // bands
    ids = t[id_col].to_numpy(zero_copy_only=False)
    col = t["minhash"].combine_chunks()
    S = col.values.to_numpy(zero_copy_only=False).reshape(len(ids), num_perm)
    view = S.astype(np.uint64).reshape(len(ids), bands, rows_per_band)
    mix = view[:, :, 0]
    for r in range(1, rows_per_band):
        mix = _splitmix64(mix ^ view[:, :, r])
    band_idx = np.tile(np.arange(bands), len(ids))
    cols = {
        id_col: pa.array(np.repeat(ids, bands)),
        "bucket": _pack_bucket(band_idx, mix.ravel()),
    }
    if carry_sigs:
        rep = np.repeat(np.arange(len(ids)), bands)
        flat = pa.array(S[rep].astype(np.int64).ravel(), pa.int64())
        cols["minhash"] = pa.FixedSizeListArray.from_arrays(flat, num_perm)
    return pa.table(cols)


def dedup_minhash_lsh(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    shingle_k: int = 3,
) -> "ray.data.Dataset":
    """MinHash+LSH near-dup clustering -> (id, component) assignment.

    shingle -> minhash -> band buckets (groupby) -> candidate pairs ->
    signature-estimated jaccard >= threshold -> connected components.
    Signatures are carried with the ids through a broadcast map so the
    verify step needs no second shuffle of the texts.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sig_tbl = minhash_signatures(ds, text_col, num_perm, shingle_k).select_columns(
        [id_col, "minhash"]
    )

    # signatures RIDE the banding explode (one copy per (doc, band)
    # row) so the verify happens inside the bucket group — no
    # whole-corpus driver dict, no second shuffle
    exploded = sig_tbl.map_batches(
        lambda t: _explode_band_buckets(t, id_col, num_perm, bands, True),
        batch_format="pyarrow",
    )
    # distinct=False: connected components tolerates duplicate edges
    # (band-collision repeats), so the pair-dedup shuffle is skipped
    edges = _verified_pairs_from_buckets(
        exploded, id_col, num_perm=num_perm, threshold=threshold, distinct=False
    )
    nodes = ds.select_columns([id_col]).map_batches(
        lambda t: pa.table({"node": t[id_col]}), batch_format="pyarrow"
    )
    return connected_components(edges, extra_nodes_ds=nodes)


def _verified_pairs_from_buckets(
    exploded: "ray.data.Dataset",
    id_col: str,
    num_perm: int,
    threshold: float,
    max_bucket: int = 200,
    distinct: bool = True,
) -> "ray.data.Dataset":
    """(bucket, id, minhash) rows -> verified pairs (a < b), distinct
    unless the consumer (connected components) tolerates duplicates.

    Pair generation AND signature-jaccard verification run in one pass
    over each bucket group (the signatures arrived with the banding
    explode), so the only shuffles are the bucket groupby and the final
    pair dedup. ``max_bucket`` is the LSH hot-bucket cap.
    """
    P = 64

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("part", _bucket_partition_column(t, P))

    def pairs_partition(g: pa.Table) -> pa.Table:
        # stays Arrow end-to-end: the (n, num_perm) signature matrix is a
        # zero-copy reshape of the fixed_size_list values (a pandas batch
        # would box every signature row into a Python object)
        id_arr = g[id_col].combine_chunks()
        if pa.types.is_integer(id_arr.type):
            ids = id_arr.to_numpy(zero_copy_only=False)
        else:
            ids = np.asarray(id_arr.to_pylist(), dtype=object)
        buckets = _bucket_sort_keys(g)
        S = (
            g["minhash"].combine_chunks()
            .values.to_numpy(zero_copy_only=False)
            .reshape(len(g), num_perm)
        )
        order = np.argsort(buckets, kind="stable")
        buckets = buckets[order]
        ids = ids[order]
        S = S[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], buckets[1:] != buckets[:-1], [True]))
        )
        out_a, out_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            sub = np.argsort(ids[s:e])[:max_bucket]
            mem = ids[s:e][sub]
            sig = S[s:e][sub]
            ai, bi = np.triu_indices(len(mem), k=1)
            jac = (sig[ai] == sig[bi]).mean(axis=1)
            keep = jac >= threshold
            if keep.any():
                out_a.append(mem[ai][keep])
                out_b.append(mem[bi][keep])
        if not out_a:
            return pa.table({"a": id_arr.slice(0, 0), "b": id_arr.slice(0, 0)})
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), id_arr.type),
                "b": pa.array(np.concatenate(out_b), id_arr.type),
            }
        )

    cand = (
        exploded.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_partition, batch_format="pyarrow")
    )
    return dedup_pair_rows(cand) if distinct else cand


class SimHasher:
    """64-bit simhash over token hashes (weighted bit votes).

    Vectorized across the whole batch like ``batch_minhash``: one flat
    token-hash array with per-doc offsets, bit unpack + ``add.reduceat``
    for the votes, and a weights-dot to pack the sign bits — no per-doc
    Python beyond tokenization.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.bits = np.arange(64, dtype=np.uint64)
        self.weights = (np.uint64(1) << self.bits).astype(np.uint64)

    def batch_simhash(self, texts: list[str]) -> np.ndarray:
        n = len(texts)
        out = np.zeros(n, dtype=np.uint64)
        if n == 0:
            return out
        tok_lists = [(t or "").lower().split() for t in texts]
        lens = np.array([len(ts) for ts in tok_lists], dtype=np.int64)
        nonempty = lens > 0
        if not nonempty.any():
            return out
        flat = np.fromiter(
            (
                zlib.crc32(tok.encode("utf-8"))
                for ts in tok_lists
                for tok in ts
            ),
            dtype=np.uint64,
            count=int(lens.sum()),
        )
        hs = _splitmix64(flat)
        # (T, 64) sign votes, reduced per doc in one pass (int32 keeps the
        # intermediate at 256 B/token and can't overflow below 2^31 tokens)
        votes = (
            ((hs[:, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int32)
            * 2
            - 1
        )
        ne_lens = lens[nonempty]
        offsets = np.zeros(len(ne_lens), dtype=np.int64)
        np.cumsum(ne_lens[:-1], out=offsets[1:])
        doc_votes = np.add.reduceat(votes, offsets, axis=0)  # (n_ne, 64)
        packed = ((doc_votes > 0).astype(np.uint64) * self.weights[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[nonempty] = packed
        return out

    def simhash(self, text: str) -> np.uint64:
        return self.batch_simhash([text])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = self.batch_simhash(batch[self.text_col].to_pylist())
        return batch.append_column(
            "simhash", pa.array(vals.astype(np.int64), pa.int64())
        )


def dedup_simhash(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> "ray.data.Dataset":
    """SimHash near-dup: band the 64-bit hash into ``bands`` chunks (any
    pair within hamming distance < bands shares >= 1 identical chunk),
    bucket-group, verify hamming distance, cluster."""
    hashed = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow", concurrency=(1, 8),
    ).select_columns([id_col, "simhash"])

    width = 64 // bands

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_ids = np.repeat(ids, bands)
        band_idx = np.tile(np.arange(bands), len(ids))
        chunks = np.stack(
            [(h >> np.uint64(b * width)) & np.uint64((1 << width) - 1) for b in range(bands)],
            axis=1,
        ).ravel()
        # chunks are < 2^(64/bands) <= 2^32 bits wide, so they pack
        # losslessly under the band index (no >>8 truncation needed)
        packed = (
            (band_idx.astype(np.uint64) << np.uint64(56)) ^ chunks
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(out_ids),
                "bucket": pa.array(packed, pa.int64()),
                "simhash": pa.array(
                    np.repeat(h, bands).astype(np.int64), pa.int64()
                ),
            }
        )

    exploded = hashed.map_batches(explode, batch_format="pyarrow")

    P = 64

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("part", _bucket_partition_column(t, P))

    def pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
        buckets = g["bucket"].to_numpy()
        order = np.argsort(buckets, kind="stable")
        buckets = buckets[order]
        ids = g[id_col].to_numpy()[order]
        hs = g["simhash"].to_numpy().astype(np.uint64)[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], buckets[1:] != buckets[:-1], [True]))
        )
        out_a, out_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            sub = np.argsort(ids[s:e])[:200]
            mid = ids[s:e][sub]
            mh = hs[s:e][sub]
            ai, bi = np.triu_indices(len(mid), k=1)
            x = mh[ai] ^ mh[bi]
            # vectorized popcount via unpackbits over the 8 bytes
            ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(1)
            keep = ham <= max_hamming
            if keep.any():
                out_a.append(mid[ai][keep])
                out_b.append(mid[bi][keep])
        if not out_a:
            return pd.DataFrame(
                {"a": g[id_col].iloc[:0], "b": g[id_col].iloc[:0]}
            )
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    cand = (
        exploded.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_partition, batch_format="pandas")
    )
    edges = cand  # CC tolerates duplicate edges; skip the dedup shuffle
    nodes = ds.select_columns([id_col]).map_batches(
        lambda t: pa.table({"node": t[id_col]}), batch_format="pyarrow"
    )
    return connected_components(edges, extra_nodes_ds=nodes)


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    metric: str = "jaccard",
) -> "ray.data.Dataset":
    """Exact character-n-gram similarity over LSH candidate pairs ->
    (a, b, <metric>) rows with score >= threshold.

    ``metric="jaccard"`` scores |A∩B| / |A∪B|; ``"containment"`` scores
    |A∩B| / min(|A|, |B|) — the asymmetric near-dup test that catches a
    short document embedded in a longer one (jaccard dilutes it).
    Candidate generation is minhash-LSH in both cases, which recalls by
    JACCARD — the containment output is exhaustive only for pair
    populations whose high-containment pairs are also high-jaccard
    (true for edit-style duplicates; a tiny-doc-in-huge-doc pair has
    low jaccard and can be missed — use a substring/suffix method for
    that regime).

    LSH bounds the pair universe; candidate-pair texts arrive via hash
    joins keyed on the pair ids (nothing passes through the driver)."""
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"metric must be jaccard|containment, got {metric!r}")
    sigs = minhash_signatures(ds, text_col, num_perm, shingle_k)
    rows_per_band = num_perm // bands

    exploded = sigs.select_columns([id_col, "minhash"]).map_batches(
        lambda t: _explode_band_buckets(t, id_col, num_perm, bands, False),
        batch_format="pyarrow",
    )
    cand = _candidate_pairs_from_buckets(exploded, id_col)
    return _verify_ngram_pairs(
        ds, cand, id_col, text_col, shingle_k, threshold, metric
    )


def _verify_ngram_pairs(
    ds: "ray.data.Dataset",
    cand: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    shingle_k: int,
    threshold: float,
    metric: str,
) -> "ray.data.Dataset":
    """Shared exact-verify stage: join candidate pair ids (a, b) to
    their texts, score every pair with one vectorized lexsort
    intersection, keep score >= threshold, dedupe output rows."""
    # texts reach the verify via two hash joins keyed on the pair ids —
    # only candidate-pair texts move, and nothing passes through the
    # driver. The joins are the repo's tagged-union shuffle joins, NOT
    # Dataset.join: cand is map_groups output, and Ray's map_groups emits
    # ZERO-COLUMN blocks for empty hash partitions (tiny inputs / sparse
    # candidate sets) that Arrow's native hash join rejects ("no match
    # for FieldRef"; map_batches can't repair them either — Ray
    # short-circuits empty blocks around every UDF). The tagged-union
    # join's own key shuffle simply drops them. Schemas are passed
    # explicitly so the expensive cand pipeline is never pre-executed by
    # a schema probe.
    from .relops import _arrow_schema, _tagged_union

    texts = ds.select_columns([id_col, text_col])
    tsch = _arrow_schema(texts)
    id_t, txt_t = tsch.field(id_col).type, tsch.field(text_col).type

    # join partitions sized to the cluster: each shuffle partition runs
    # an aggregator, and two chained joins plus the bucket/dedup groupbys
    # can starve a small CPU budget into a scheduling deadlock
    # (observed at num_cpus=4 with 8+8 partitions)
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    nparts = max(2, min(8, cpus // 2))

    def gather(schema: pa.Schema, left_names: list, right_names: list, key: str):
        def fn(g: pa.Table) -> pa.Table:
            side = g["__side"]
            lf = g.filter(pc.equal(side, 0)).select(left_names).to_pandas()
            rf = g.filter(pc.equal(side, 1)).select(right_names).to_pandas()
            if len(lf) == 0 or len(rf) == 0:
                return schema.empty_table()
            m = lf.merge(rf, on=key, how="inner")
            return pa.Table.from_pandas(
                m.reset_index(drop=True), schema=schema, preserve_index=False
            )

        return fn

    schema_a = pa.schema([("a", id_t), ("b", id_t), ("text_a", txt_t)])
    schema_ab = pa.schema(
        [("a", id_t), ("b", id_t), ("text_a", txt_t), ("text_b", txt_t)]
    )
    t_a = texts.map_batches(
        lambda t: pa.table({"a": t[id_col], "text_a": t[text_col]}),
        batch_format="pyarrow",
    )
    with_a = (
        _tagged_union(
            cand, t_a, "a", "a",
            [("a", id_t), ("b", id_t), ("text_a", txt_t)], nparts,
        )
        .groupby("__part")
        .map_groups(
            gather(schema_a, ["a", "b"], ["a", "text_a"], "a"),
            batch_format="pyarrow",
        )
    )
    t_b = texts.map_batches(
        lambda t: pa.table({"b": t[id_col], "text_b": t[text_col]}),
        batch_format="pyarrow",
    )
    withtext = (
        _tagged_union(
            with_a, t_b, "b", "b",
            [("a", id_t), ("b", id_t), ("text_a", txt_t), ("text_b", txt_t)],
            nparts,
        )
        .groupby("__part")
        .map_groups(
            gather(schema_ab, ["a", "b", "text_a"], ["b", "text_b"], "b"),
            batch_format="pyarrow",
        )
    )

    def jaccard_batch(t: pa.Table) -> pa.Table:
        # vectorized exact-jaccard verify: shingle-hash each UNIQUE text
        # once (the per-side hash sets are unique by construction), then
        # compute every pair's intersection in ONE lexsort over the flat
        # (pair_idx, hash) concatenation — a value appearing twice within
        # a pair is exactly an intersection hit. No per-pair Python sets.
        n = len(t)
        empty = pa.table(
            {
                "a": pa.array([], t["a"].type),
                "b": pa.array([], t["b"].type),
                metric: pa.array([], pa.float64()),
            }
        )
        if n == 0:
            return empty
        ta = np.asarray(
            [x or "" for x in t["text_a"].to_pylist()], dtype=object
        )
        tb = np.asarray(
            [x or "" for x in t["text_b"].to_pylist()], dtype=object
        )
        uniq, inv = np.unique(np.concatenate([ta, tb]), return_inverse=True)
        sh = [_shingle_hashes(x, shingle_k) for x in uniq]
        lens = np.array([len(s) for s in sh], dtype=np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)))
        flat_u = (
            np.concatenate(sh) if offs[-1] else np.empty(0, dtype=np.uint64)
        )
        ia, ib = inv[:n], inv[n:]
        la, lb = lens[ia], lens[ib]
        tot = la + lb
        # gather each pair's (a-hashes, b-hashes) from the unique-text pool
        starts = np.empty(2 * n, dtype=np.int64)
        starts[0::2], starts[1::2] = offs[ia], offs[ib]
        counts = np.empty(2 * n, dtype=np.int64)
        counts[0::2], counts[1::2] = la, lb
        total = int(counts.sum())
        if total:
            shift = np.repeat(
                starts - np.concatenate(([0], np.cumsum(counts)[:-1])), counts
            )
            H = flat_u[shift + np.arange(total)]
            P = np.repeat(np.arange(n), tot)
            order = np.lexsort((H, P))
            Hs, Ps = H[order], P[order]
            dup = (Hs[1:] == Hs[:-1]) & (Ps[1:] == Ps[:-1])
            inter = np.bincount(Ps[1:][dup], minlength=n)
        else:
            inter = np.zeros(n, dtype=np.int64)
        if metric == "jaccard":
            union = tot - inter
            j = np.where(tot == 0, 1.0, inter / np.maximum(union, 1))
        else:
            small = np.minimum(la, lb)
            j = np.where(small == 0, 1.0, inter / np.maximum(small, 1))
        keep = j >= threshold
        if not keep.any():
            return empty
        sel = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table(
            {
                "a": t["a"].take(sel),
                "b": t["b"].take(sel),
                metric: pa.array(j[keep], pa.float64()),
            }
        )

    out = withtext.map_batches(jaccard_batch, batch_format="pyarrow")
    # distinct output rows: unlike the CC-bound dedup paths (duplicate
    # edges tolerated), this op EMITS pair rows, and a pair found by
    # several bands would otherwise appear once per band. Deduping the
    # (tiny) verified output keeps the join pipeline shape unchanged.
    return dedup_pair_rows(out, score_col=metric)


def containment_pairs_exact(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> "ray.data.Dataset":
    """EXACT n-gram containment join: every pair with
    |A∩B| / min(|A|, |B|) >= threshold — including the tiny-doc-in-huge-doc
    pairs whose jaccard is too low for minhash-LSH to recall.

    Candidate generation is deterministic prefix filtering (the
    AllPairs/PPJoin pigeonhole, set-containment-join flavor): with H a
    doc's sorted-unique shingle-hash set, if the smaller set of a
    qualifying pair misses at most (1-t)·|H| elements from the
    intersection, then its floor((1-t)·|H|)+1 SMALLEST hashes must
    contain a shared one. So each doc posts ALL its hashes to an
    inverted index and PROBES with only that prefix; every qualifying
    pair is found in the bucket of some probe hash — a proof, not a
    recall probability (the hash order is a fixed random permutation of
    shingles, so prefixes are frequency-agnostic samples).

    Scale shape: ONE shuffle of the inverted index (h, id, size) rows —
    O(total distinct shingles), the linear cost any exact set join
    pays — hash-COARSE-partitioned (64 groups, not one pandas group per
    shingle), with per-partition probe x postings pair generation as
    vectorized repeat/tile over sorted bucket bounds. Candidate pairs
    are deduped (a pair shares up to prefix-many hashes) before the
    shared hash-join + lexsort verify, so each pair is scored once.
    Bucket work is |probes| x |postings|, skew-bounded by hot-shingle
    posting lists — salt or cap those for adversarial corpora. Texts
    never enter the index; only candidate-pair texts move.
    """
    t = float(threshold)
    P = 64

    def emit(tbl: pa.Table) -> pa.Table:
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        texts = tbl[text_col].to_pylist()
        h_parts, id_parts, sz_parts, probe_parts = [], [], [], []
        for i, txt in enumerate(texts):
            H = _shingle_hashes(txt or "", shingle_k)
            m = len(H)
            if m == 0:
                continue
            H = np.sort(H)
            p = int(np.floor((1.0 - t) * m)) + 1
            h_parts.append(H)
            id_parts.append(np.full(m, ids[i], dtype=np.int64))
            sz_parts.append(np.full(m, m, dtype=np.int64))
            probe = np.zeros(m, dtype=np.int8)
            probe[: min(p, m)] = 1  # H is sorted: smallest hashes first
            probe_parts.append(probe)
        if not h_parts:
            return pa.table(
                {
                    "h": pa.array([], pa.uint64()),
                    "id": pa.array([], pa.int64()),
                    "size": pa.array([], pa.int64()),
                    "probe": pa.array([], pa.int8()),
                }
            )
        return pa.table(
            {
                "h": pa.array(np.concatenate(h_parts), pa.uint64()),
                "id": pa.array(np.concatenate(id_parts), pa.int64()),
                "size": pa.array(np.concatenate(sz_parts), pa.int64()),
                "probe": pa.array(np.concatenate(probe_parts), pa.int8()),
            }
        )

    inv = ds.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pyarrow"
    )

    def add_part(tbl: pa.Table) -> pa.Table:
        h = tbl["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (_splitmix64(h) % np.uint64(P)).astype(np.int32)
        return tbl.append_column("part", pa.array(part, pa.int32()))

    def pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
        # one numpy pass over ALL shingle buckets of the partition:
        # sort by hash, find bucket bounds, expand each probe against
        # its whole bucket with repeat + segment-arange (no per-bucket
        # frames, no Python loop over distinct shingles)
        empty = pd.DataFrame(
            {"a": np.array([], np.int64), "b": np.array([], np.int64)}
        )
        n = len(g)
        if n < 2:
            return empty
        h = g["h"].to_numpy()
        order = np.argsort(h, kind="stable")
        h = h[order]
        ids = g["id"].to_numpy()[order]
        sz = g["size"].to_numpy()[order]
        probe = g["probe"].to_numpy()[order].astype(bool)
        new_seg = h[1:] != h[:-1]
        seg_of = np.cumsum(np.concatenate(([0], new_seg.astype(np.int64))))
        seg_start = np.flatnonzero(np.concatenate(([True], new_seg)))
        seg_len = np.diff(np.concatenate((seg_start, [n])))
        p_idx = np.flatnonzero(probe)
        p_seg = seg_of[p_idx]
        sizes = seg_len[p_seg]
        big = sizes > 1  # singleton buckets pair with nothing
        p_idx, p_seg, sizes = p_idx[big], p_seg[big], sizes[big]
        if len(p_idx) == 0:
            return empty
        total = int(sizes.sum())
        starts_rep = np.repeat(seg_start[p_seg], sizes)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(sizes) - sizes, sizes
        )
        b_pos = starts_rep + offs
        A = np.repeat(ids[p_idx], sizes)
        SA = np.repeat(sz[p_idx], sizes)
        B = ids[b_pos]
        SB = sz[b_pos]
        # probe must be the smaller side (pigeonhole applies to it);
        # equal sizes keep one direction via id order (drops self-pairs)
        keep = (SA < SB) | ((SA == SB) & (A < B))
        A, B = A[keep], B[keep]
        if len(A) == 0:
            return empty
        lo = np.minimum(A, B)
        hi = np.maximum(A, B)
        # in-partition pre-dedupe (a pair recurs once per shared prefix
        # shingle landing in this partition) before the global pair dedup
        o2 = np.lexsort((hi, lo))
        lo, hi = lo[o2], hi[o2]
        first = np.concatenate(
            ([True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1]))
        )
        return pd.DataFrame({"a": lo[first], "b": hi[first]})

    cand = dedup_pair_rows(
        inv.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_partition, batch_format="pandas")
    )
    return _verify_ngram_pairs(
        ds, cand, id_col, text_col, shingle_k, threshold, "containment"
    )


def dedup_embedding_cosine(
    ds: "ray.data.Dataset",
    id_col: str = "row_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    n_candidates: int = 10,
    rows_per_shard: int = 65536,
    route_groups: int | None = None,
) -> "ray.data.Dataset":
    """Embedding near-dup: sharded cosine self-search, edges where
    similarity >= threshold, connected components. ``route_groups``
    engages the routed search tier (each search actor holds only 1/g of
    the index shards — the path for an indexed side too big for one
    node)."""
    from .search import knn_search, shard_refs_from_dataset

    shards, _, _ = shard_refs_from_dataset(
        ds, id_col=id_col, emb_col=emb_col, rows_per_shard=rows_per_shard
    )
    nds = knn_search(
        ds, shards, k=n_candidates, algorithm="exact",
        algorithm_kwargs={"metric": "cosine"}, id_col=id_col, emb_col=emb_col,
        exclude_self=True, route_groups=route_groups,
    )

    def to_edges(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        ids_col = t["neigh_ids"].combine_chunks()
        d_col = t["neigh_dists"].combine_chunks()
        k = len(ids_col[0]) if len(ids_col) else 0
        ids = ids_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
        dist = d_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
        sim = 1.0 - dist
        keep = ((ids >= 0) & (sim >= threshold)).ravel()
        a = np.repeat(q, k)[keep]
        b = ids.ravel()[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(a, b), pa.int64()),
                "b": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    edges = nds.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    nodes = ds.select_columns([id_col]).map_batches(
        lambda t: pa.table({"node": t[id_col]}), batch_format="pyarrow"
    )
    return connected_components(edges, extra_nodes_ds=nodes)


def semantic_dedup(
    ds: "ray.data.Dataset",
    id_col: str = "row_id",
    emb_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    iters: int = 8,
    seed: int = 0,
    max_cluster: int = 4096,
    split_depth: int = 2,
    split_width: int = 256,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means the embedding column, then inside each
    cluster mark every row whose cosine similarity to another cluster
    member reaches ``threshold``, keeping exactly one representative
    (minimum id) per within-cluster near-dup component.

    Scale shape: the k-means trainer is shuffle-free (broadcast
    centroids + per-batch partial sums, kiezray.cluster.kmeans); the
    final centroid matrix is tiny (k×d floats), so the assignment pass
    is ONE map_batches that keeps the embedding column riding along —
    no join, no second scan of the id space. Clusters larger than
    ``max_cluster`` are then recursively re-k-means'd (up to
    ``split_depth`` rounds, ``<= split_width`` sub-centroids each; the
    cluster-size census is a per-batch bincount fold, O(clusters)
    driver rows) so the prune worker's group is bounded by
    ``max_cluster`` whenever the cluster is separable — near-identical
    rows always land in the same sub-cluster because the assignment
    argmin is deterministic. The prune is ONE groupby(cluster) shuffle.
    A cluster the splitter cannot break (e.g. one giant clump of
    near-identical vectors) falls back to a carry-forward greedy prune
    over id-ascending ``max_cluster`` chunks: each chunk first drops
    rows near an earlier SURVIVOR, then resolves its own near-dup
    components — cross-chunk duplicates are never missed, and for a
    clump (all rows mutually similar) the survivor is exactly the
    min id, matching the in-cluster rule. The one approximation: a
    chain component spanning chunks (A~C, B~C, A!~B, C dropped) can
    keep more than one representative — conservative, never zero.
    Cross-chunk state is bounded: similarity products run one
    kept-chunk slice (<= max_cluster x max_cluster floats) at a time,
    plus O(survivors x dim) kept rows.

    Returns (id_col, cluster int64, keep bool) — filter on ``keep`` for
    the surviving rows; split clusters report their final sub-cluster
    id (>= n_clusters). Deterministic under any partitioning: k-means
    init is hash-priority sampling, sub-k-means seeds derive from
    (seed, depth, cluster id), and the prune orders each group by
    (dist-to-centroid, id) — plain id for oversized fallback groups.
    """
    import ray

    from .arrowutil import emb_to_matrix
    from .cluster import kmeans, sq_assign

    _, cent = kmeans(
        ds, id_col=id_col, vec_col=emb_col, k=n_clusters, iters=iters,
        seed=seed,
    )
    cref = ray.put(cent)

    def assign_with_vec(t: pa.Table) -> pa.Table:
        # cluster.sq_assign — the SAME kernel as the kmeans trainer, so
        # assignment can never desynchronize from training — but the
        # vectors stay in the row so they ride the single cluster
        # shuffle instead of needing a join
        x = emb_to_matrix(t[emb_col]).astype(np.float64)
        a, best = sq_assign(x, ray.get(cref))
        return pa.table(
            {
                id_col: pc.cast(t[id_col], pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "dist": pa.array(np.sqrt(best), pa.float64()),
                emb_col: t[emb_col],
            }
        )

    joined = ds.map_batches(assign_with_vec, batch_format="pyarrow")

    def cluster_sizes(d: "ray.data.Dataset") -> "pd.Series":
        # O(live clusters) driver fold of per-batch bincount partials —
        # the vectors never move for the census
        def partial(t: pa.Table) -> pa.Table:
            u, c = np.unique(
                t["cluster"].to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table(
                {
                    "cluster": pa.array(u, pa.int64()),
                    "n": pa.array(c.astype(np.int64), pa.int64()),
                }
            )

        parts = (
            d.select_columns(["cluster"])
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()
        )
        return parts.groupby("cluster")["n"].sum()

    # hot-cluster recursion: re-k-means any cluster over max_cluster so
    # no prune group outgrows one worker's heap (unless inseparable)
    next_id = n_clusters
    for depth in range(split_depth):
        # census FIRST, on the lazy stream: it selects only the cluster
        # column, so the common no-hot-cluster case never writes the
        # corpus (+ embeddings) into the object store — the stream flows
        # straight into the ONE groupby shuffle below. Splitting pays
        # one extra assignment pass for that.
        sizes = cluster_sizes(joined)
        hot = sorted(int(c) for c, n in sizes.items() if n > max_cluster)
        if not hot:
            break
        joined = joined.materialize()
        sub_cents: dict[int, tuple[int, np.ndarray]] = {}
        for c in hot:
            n_c = int(sizes[c])
            k_sub = min(split_width, max(2, -(-n_c // max_cluster) * 2))
            # materialize the filtered slice ONCE: the sub-kmeans then
            # iterates over only this cluster's rows (n_c of them)
            # instead of filter-scanning the full corpus per iteration
            sub_ds = joined.map_batches(
                lambda t, c=c: t.filter(pc.equal(t["cluster"], c)),
                batch_format="pyarrow",
            ).materialize()
            _, cents_c = kmeans(
                sub_ds,
                id_col=id_col,
                vec_col=emb_col,
                k=k_sub,
                iters=max(2, iters // 2),
                seed=seed + 1_000_003 * (depth + 1) + 7_919 * c,
            )
            sub_cents[c] = (next_id, cents_c)
            next_id += len(cents_c)
        sref = ray.put(sub_cents)

        def reassign(t: pa.Table) -> pa.Table:
            sub = ray.get(sref)
            cl = t["cluster"].to_numpy(zero_copy_only=False).copy()
            dist = t["dist"].to_numpy(zero_copy_only=False).copy()
            x = None
            for c, (base, cents) in sub.items():
                rows = np.flatnonzero(cl == c)
                if len(rows) == 0:
                    continue
                if x is None:
                    x = emb_to_matrix(t[emb_col]).astype(np.float64)
                xc = x[rows]
                a, best = sq_assign(xc, cents)
                cl[rows] = base + a
                dist[rows] = np.sqrt(best)
            return pa.table(
                {
                    id_col: t[id_col],
                    "cluster": pa.array(cl, pa.int64()),
                    "dist": pa.array(dist, pa.float64()),
                    emb_col: t[emb_col],
                }
            )

        joined = joined.map_batches(reassign, batch_format="pyarrow")

    def components_keep(m: np.ndarray, sub_ids: np.ndarray) -> np.ndarray:
        # min-id-per-component over the near-dup graph of one chunk:
        # vectorized min-label propagation with pointer doubling (no
        # per-edge Python)
        sim = m @ m.T
        np.fill_diagonal(sim, -np.inf)
        adj = sim >= threshold
        n_sub = len(sub_ids)
        labels = np.arange(n_sub)
        for _ in range(64):
            nb = np.where(adj, labels[None, :], n_sub).min(axis=1)
            nl = np.minimum(labels, nb)
            nl = np.minimum(nl, nl[nl])
            if np.array_equal(nl, labels):
                break
            labels = nl
        while True:  # settle to roots
            nxt = labels[labels]
            if np.array_equal(nxt, labels):
                break
            labels = nxt
        # keep the min-id member of each component: sort by (root, id);
        # the first row of each root run wins
        o2 = np.lexsort((sub_ids, labels))
        r_sorted = labels[o2]
        first = np.concatenate(([True], r_sorted[1:] != r_sorted[:-1]))
        k_local = np.zeros(n_sub, dtype=bool)
        k_local[o2[first]] = True
        return k_local

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        dist = g["dist"].to_numpy()
        n = len(ids)
        if n <= max_cluster:
            # row order is cosmetic here (the keeper is the min id of
            # each component regardless); centroid-nearest first, id ties
            order = np.lexsort((ids, dist))
        else:
            # greedy fallback: id-ascending so the first chunk holds the
            # globally smallest ids — for a clump (all mutually similar)
            # the survivor is then exactly the min id, matching the
            # <=max_cluster contract
            order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(g[emb_col].to_numpy()[order]).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat /= norms
        if n <= max_cluster:
            keep = components_keep(mat, ids)
        else:
            # the splitter could not break this cluster (inseparable
            # clump): carry-forward greedy — a chunk row near ANY
            # earlier survivor is dropped first, so cross-chunk
            # duplicates are never missed; then the remainder resolves
            # its own components. Chain components spanning chunks can
            # keep >1 representative (conservative; documented in the
            # docstring). Peak memory: one max_cluster x max_cluster
            # product slice at a time plus O(survivors x dim) kept
            # chunks — survivors of a degenerate clump are ~1 row.
            keep = np.zeros(n, dtype=bool)
            kept_chunks: list[np.ndarray] = []
            for s in range(0, n, max_cluster):
                e = min(s + max_cluster, n)
                m = mat[s:e]
                dup_prev = np.zeros(e - s, dtype=bool)
                for kc in kept_chunks:
                    alive = np.flatnonzero(~dup_prev)
                    if not len(alive):
                        break
                    dup_prev[alive] = (m[alive] @ kc.T >= threshold).any(
                        axis=1
                    )
                rem = np.flatnonzero(~dup_prev)
                k_chunk = np.zeros(e - s, dtype=bool)
                if len(rem):
                    k_chunk[rem] = components_keep(m[rem], ids[s:e][rem])
                keep[s:e] = k_chunk
                if k_chunk.any():
                    kept_chunks.append(m[k_chunk])
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": g["cluster"].to_numpy()[order],
                "keep": keep,
            }
        )

    return joined.groupby("cluster").map_groups(prune, batch_format="pandas")


def dedup_against_corpus(
    incoming: "ray.data.Dataset",
    base: "ray.data.Dataset",
    text_col: str = "text",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Incremental (delta) dedup: keep only incoming rows whose
    ``text_col`` does NOT already appear in the base corpus — the
    "new crawl snapshot vs. everything already ingested" pass that runs
    before any expensive near-dup stage.

    Scale shape: this is exactly a distributed anti join on the content
    key — the base side is reduced to its key column, both sides
    hash-partition on it (ONE shuffle each, the base corpus is never
    broadcast or collected), and membership is a vectorized ``is_in``
    per partition (``relops.semi_join``). At 100 TB the base side key
    column is the only thing that moves, and a pre-hashed fingerprint
    column (int64) can stand in for raw text to shrink the shuffle."""
    from .relops import semi_join

    return semi_join(
        incoming,
        base,
        key_left=text_col,
        key_right=text_col,
        anti=True,
        num_partitions=num_partitions,
    )


def dedup_keep_best(
    ds: "ray.data.Dataset",
    content_cols: list[str],
    order_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Exact dedup keeping the BEST row of each content group — ordered
    by ``order_col`` (descending by default, e.g. a quality score), ties
    by minimum ``id_col`` — instead of ``dedup_exact``'s min-id rule.
    The "keep the highest-quality duplicate" trainer pass.

    Same scale shape as ``dedup_exact``: vectorized 128-bit content
    keys, ONE hash-partition shuffle (a content hash never spans two
    partitions), one lexsort per partition. No driver state.
    """

    def add_keys(t: pa.Table) -> pa.Table:
        h1, h2 = content_keys(t, content_cols)
        part = (h1 % np.uint64(num_partitions)).astype(np.int32)
        return (
            t.append_column("__ch1", pa.array(h1.astype(np.int64), pa.int64()))
            .append_column("__ch2", pa.array(h2.astype(np.int64), pa.int64()))
            .append_column("__part", pa.array(part, pa.int32()))
        )

    def keep_best(g: pd.DataFrame) -> pd.DataFrame:
        aux = ["__ch1", "__ch2", "__part"]
        if len(g) == 0:
            return g.drop(columns=aux)
        c1 = g["__ch1"].to_numpy()
        c2 = g["__ch2"].to_numpy()
        o = g[order_col].to_numpy()
        if descending:
            o = -o if o.dtype.kind in "iuf" else -np.unique(
                o, return_inverse=True
            )[1]
        order = np.lexsort((g[id_col].to_numpy(), o, c2, c1))
        c1, c2 = c1[order], c2[order]
        first = np.concatenate(
            ([True], (c1[1:] != c1[:-1]) | (c2[1:] != c2[:-1]))
        )
        return g.iloc[order[first]].drop(columns=aux)

    return (
        ds.map_batches(add_keys, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(keep_best, batch_format="pandas")
    )


def batch_levenshtein(a_texts, b_texts) -> np.ndarray:
    """Exact Levenshtein distance for a batch of string pairs, DP
    vectorized ACROSS the batch (cf. DuckDB ``levenshtein``; the
    reference engine has no string-similarity kernel — this is the ER
    pair-verify primitive its alignment scores would feed).

    The classic row recurrence has a sequential dependency on the
    insertion term ``cur[j] = min(cand[j], cur[j-1] + 1)``; that is a
    min-plus prefix scan, solved in one vectorized pass as
    ``np.minimum.accumulate(cand - j) + j``. So each DP row advances
    the WHOLE batch with O(P * maxlen_b) numpy work and the only
    Python-level loop is over maxlen_a rows — no per-pair Python.
    Encoding to codepoint matrices is one C-level pass per string.
    Cost O(maxlen_a * P * maxlen_b); pad columns beyond a pair's own
    ``len_b`` cannot contaminate its result because the scan only
    moves information left-to-right and each answer is read at column
    ``len_b`` of row ``len_a``.
    """
    P = len(a_texts)
    out = np.zeros(P, dtype=np.int64)
    if P == 0:
        return out
    la = np.fromiter((len(s) for s in a_texts), np.int64, P)
    lb = np.fromiter((len(s) for s in b_texts), np.int64, P)
    La, Lb = int(la.max()), int(lb.max())
    out[la == 0] = lb[la == 0]
    if La == 0 or P == 0:
        return out
    A = np.zeros((P, La), dtype=np.uint32)
    B = np.full((P, max(Lb, 1)), 0xFFFFFFFF, dtype=np.uint32)
    for i, s in enumerate(a_texts):
        if s:
            A[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    for i, s in enumerate(b_texts):
        if s:
            B[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    j = np.arange(Lb + 1, dtype=np.int64)
    prev = np.broadcast_to(j, (P, Lb + 1)).copy()
    cand = np.empty((P, Lb + 1), dtype=np.int64)
    for i in range(1, La + 1):
        sub = (A[:, i - 1 : i] != B[:, :Lb]).astype(np.int64)
        cand[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + sub, out=cand[:, 1:])
        cur = np.minimum.accumulate(cand - j, axis=1) + j
        sel = la == i
        if sel.any():
            out[sel] = cur[sel, lb[sel]]
        prev = cur
    return out


def batch_damerau_levenshtein(a_texts, b_texts, chunk: int = 2048) -> np.ndarray:
    """Exact Damerau-Levenshtein distance (TRUE unrestricted-edit
    Lowrance-Wagner form, NOT the OSA restriction) for a batch of
    string pairs, vectorized ACROSS the batch and fuzz-verified
    bitwise against DuckDB ``damerau_levenshtein``.

    The transposition term ``d[i1-1][j1-1] + (i-i1-1) + 1 + (j-j1-1)``
    references arbitrary earlier DP cells, so the kernel keeps the
    whole (chunk, La+1, Lb+1) int32 history and resolves, per DP row,
    ``i1`` (last row whose A-char matches each B column — a running
    where-update) and ``j1`` (last column in B matching the current
    A-char — an exclusive running-max scan) with whole-batch numpy;
    the only Python loop is over maxlen_a rows. Designed for SHORT
    fields (names, titles, codes): memory is chunk*(La+1)*(Lb+1)*4
    bytes, so the batch is processed in ``chunk``-pair slices."""
    n = len(a_texts)
    res = np.zeros(n, dtype=np.int64)
    for s0 in range(0, n, chunk):
        sl = slice(s0, min(s0 + chunk, n))
        res[sl] = _dl_chunk(list(a_texts[sl]), list(b_texts[sl]))
    return res


def _dl_chunk(a_texts, b_texts) -> np.ndarray:
    P = len(a_texts)
    out = np.zeros(P, dtype=np.int64)
    if P == 0:
        return out
    la = np.fromiter((len(s) for s in a_texts), np.int64, P)
    lb = np.fromiter((len(s) for s in b_texts), np.int64, P)
    La, Lb = int(la.max()), int(lb.max())
    out[la == 0] = lb[la == 0]
    if La == 0:
        return out
    A = np.zeros((P, La), dtype=np.uint32)
    B = np.full((P, max(Lb, 1)), 0xFFFFFFFF, dtype=np.uint32)
    for i, s in enumerate(a_texts):
        if s:
            A[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    for i, s in enumerate(b_texts):
        if s:
            B[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    BIG = np.int32(1 << 29)
    j = np.arange(Lb + 1, dtype=np.int32)
    D = np.empty((P, La + 1, Lb + 1), dtype=np.int32)
    D[:, 0, :] = j
    D[:, :, 0] = np.arange(La + 1, dtype=np.int32)
    # lastA[p, jj] = last row index i' with A[p, i'-1] == B[p, jj]
    lastA = np.zeros((P, max(Lb, 1)), dtype=np.int32)
    pidx = np.arange(P)
    cand = np.empty((P, Lb + 1), dtype=np.int32)
    for i in range(1, La + 1):
        ai = A[:, i - 1 : i]
        sub = (ai != B[:, :Lb]).astype(np.int32)
        prev = D[:, i - 1, :]
        cand[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + sub, out=cand[:, 1:])
        if i >= 2 and Lb >= 1:
            # j1 per column j: last j' < j with B[j'-1] == A[i-1]
            match_j = np.where(ai == B[:, :Lb], j[1:], 0).astype(np.int32)
            j1 = np.empty((P, Lb + 1), dtype=np.int32)
            j1[:, 0] = 0
            np.maximum.accumulate(match_j, axis=1, out=match_j)
            j1[:, 1:] = match_j  # j1 at column j uses matches <= j-1
            j1 = np.concatenate(
                [np.zeros((P, 1), np.int32), j1[:, :-1]], axis=1
            )
            i1 = lastA  # (P, Lb): last row matching B[:, j-1], j=1..Lb
            valid = (i1[:, : Lb] > 0) & (j1[:, 1:] > 0)
            ii = np.maximum(i1[:, :Lb], 1)
            jj = np.maximum(j1[:, 1:], 1)
            base = D[pidx[:, None], ii - 1, jj - 1]
            t_cost = (
                base
                + (np.int32(i) - ii - 1)
                + 1
                + (j[1:][None, :] - jj - 1)
            )
            t_cost = np.where(valid, t_cost, BIG)
            np.minimum(cand[:, 1:], t_cost, out=cand[:, 1:])
        cur = (
            np.minimum.accumulate(cand - j, axis=1, dtype=np.int32) + j
        )
        D[:, i, :] = cur
        sel = la == i
        if sel.any():
            out[sel] = cur[sel, lb[sel]]
        lastA = np.where(ai == B[:, :Lb], np.int32(i), lastA)
    return out


def edit_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 16,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Blocked exact edit-distance verify: every unordered pair of rows
    sharing a lowercased ``prefix_len``-char text prefix, with its
    exact Levenshtein distance -> (a_id, b_id, dist) rows, a_id < b_id.

    Scale shape: the prefix is THE blocking key — pairs only form
    inside a block, the block key hash is the ONE shuffle, and each
    partition enumerates its blocks' pairs with the vectorized
    ``_run_pairs`` expansion (no per-block Python) before a single
    ``batch_levenshtein`` call per partition. Pair count is bounded by
    the block-size distribution, exactly like the LSH buckets in
    ``dedup_minhash_lsh``; oversized natural-key blocks should be
    pre-split upstream (``block.split_oversized_blocks``).

    Oracle parity note: the lowercased prefix matches SQL
    ``lower(substr(text, 1, n))`` exactly for text whose lowercase is
    1:1 (all ASCII); locale-special mappings (e.g. U+0130) lowercase
    differently across unicode libraries and may block differently.
    """
    import pyarrow.compute as pc

    from .block import _run_pairs

    def add_key(t: pa.Table) -> pa.Table:
        # slice THEN lower, matching SQL lower(substr(...)): lowering
        # first can change codepoint length (e.g. U+0130 -> 2 codepoints)
        # and shift which characters the prefix covers
        pfx = pc.utf8_lower(
            pc.utf8_slice_codeunits(
                pc.coalesce(t[text_col], ""), 0, prefix_len
            )
        )
        # vectorized string hash (pd.util.hash_array over the prefix
        # column) — the same no-per-row-Python keying as dedup_exact
        h = pd.util.hash_array(
            pfx.to_pandas().to_numpy(dtype=object)
        ).astype(np.uint64)
        part = (_splitmix64(h) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                id_col: t[id_col],
                text_col: t[text_col],
                "__pfx": pfx,
                "__part": pa.array(part, pa.int32()),
            }
        )

    def pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a_id": pd.Series(dtype=np.int64),
                "b_id": pd.Series(dtype=np.int64),
                "dist": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        pfx = g["__pfx"].to_numpy(dtype=object)
        ids = g[id_col].to_numpy()
        texts = g[text_col].to_numpy(dtype=object)
        order = np.lexsort((ids, pfx))
        pfx, ids, texts = pfx[order], ids[order], texts[order]
        starts = np.flatnonzero(np.concatenate(([True], pfx[1:] != pfx[:-1])))
        lengths = np.diff(np.append(starts, len(pfx)))
        a_idx, b_idx = _run_pairs(starts, lengths)
        if len(a_idx) == 0:
            return empty
        dist = batch_levenshtein(
            [t or "" for t in texts[a_idx]], [t or "" for t in texts[b_idx]]
        )
        return pd.DataFrame(
            {"a_id": ids[a_idx], "b_id": ids[b_idx], "dist": dist}
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(add_key, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_partition, batch_format="pandas")
    )


def batch_jaro_winkler(a_texts, b_texts) -> np.ndarray:
    """Jaro-Winkler similarity for a batch of string pairs, vectorized
    ACROSS the batch (DuckDB ``jaro_winkler_similarity`` semantics,
    verified empirically: match window ``max(la,lb)//2 - 1`` clamped
    >= 0, transpositions = mismatched matched-sequence positions / 2,
    Winkler prefix <= 4 chars at weight 0.1 applied only when
    jaro > 0.7).

    The greedy left-to-right matching pass is the only sequential part;
    it advances the WHOLE batch per (i, j) cell with O(La * Lb) boolean
    numpy work — no per-pair Python. The matched sequences needed for
    the transposition count are compacted with two stable argsorts
    (matched-first in i order / j order) instead of per-pair loops."""
    P = len(a_texts)
    out = np.zeros(P, dtype=np.float64)
    if P == 0:
        return out
    la = np.fromiter((len(s) for s in a_texts), np.int64, P)
    lb = np.fromiter((len(s) for s in b_texts), np.int64, P)
    La, Lb = int(la.max()), int(lb.max())
    if La == 0 or Lb == 0:
        return out  # any empty side -> 0.0 (DuckDB convention)
    A = np.zeros((P, La), dtype=np.uint32)
    B = np.full((P, Lb), 0xFFFFFFFF, dtype=np.uint32)
    for i, s in enumerate(a_texts):
        if s:
            A[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    for i, s in enumerate(b_texts):
        if s:
            B[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    wmax = int(w.max())
    b_matched = np.zeros((P, Lb), dtype=bool)
    match_j = np.full((P, La), -1, np.int64)
    for i in range(La):
        active = i < la
        if not active.any():
            break
        lo = np.maximum(i - w, 0)
        hi = np.minimum(i + w + 1, lb)
        found = np.zeros(P, dtype=bool)
        for j in range(max(0, i - wmax), min(Lb, i + wmax + 1)):
            ok = (
                active
                & ~found
                & (j >= lo)
                & (j < hi)
                & ~b_matched[:, j]
                & (B[:, j] == A[:, i])
            )
            if ok.any():
                b_matched[ok, j] = True
                match_j[ok, i] = j
                found |= ok
    matched = match_j >= 0
    m = matched.sum(axis=1)
    has = m > 0
    if not has.any():
        return out
    # matched chars of A in i order / of B in j order, compacted left
    key_a = np.where(matched, 0, La) + np.arange(La)[None, :]
    a_seq = np.take_along_axis(
        A, np.argsort(key_a, axis=1, kind="stable"), axis=1
    )
    key_b = np.where(b_matched, 0, Lb) + np.arange(Lb)[None, :]
    b_seq = np.take_along_axis(
        B, np.argsort(key_b, axis=1, kind="stable"), axis=1
    )
    K = min(La, Lb)
    valid = np.arange(K)[None, :] < m[:, None]
    # the two matched sequences are the same multiset, so the mismatch
    # count is even and t = mismatches / 2 is exact
    t = ((a_seq[:, :K] != b_seq[:, :K]) & valid).sum(axis=1) // 2
    mf = m.astype(np.float64)
    jaro = np.zeros(P, dtype=np.float64)
    jaro[has] = (
        mf[has] / la[has] + mf[has] / lb[has] + (mf[has] - t[has]) / mf[has]
    ) / 3.0
    # Winkler prefix boost (<= 4 leading equal chars, only if jaro > 0.7)
    Kp = min(4, La, Lb)
    eq = (A[:, :Kp] == B[:, :Kp]) & (
        np.arange(Kp)[None, :] < np.minimum(la, lb)[:, None]
    )
    prefix = np.cumprod(eq, axis=1).sum(axis=1).astype(np.float64)
    boost = jaro > 0.7
    out[:] = jaro
    out[boost] += prefix[boost] * 0.1 * (1.0 - jaro[boost])
    return out


def jw_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    block_chars: int = 1,
    threshold: float = 0.75,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Blocked Jaro-Winkler similarity join over the DISTINCT values of
    a string column: every unordered pair sharing a ``block_chars``
    prefix whose similarity (rounded half-away to 6 decimals, the
    oracle-stable cut) reaches ``threshold`` -> (name_a, name_b, jw).

    Scale shape: in-batch distinct combiner first (values, not rows,
    move), the prefix is THE blocking key — its hash is the ONE
    shuffle — and each partition enumerates block pairs with the
    vectorized ``_run_pairs`` expansion feeding a single
    ``batch_jaro_winkler`` call: no per-pair Python, pair count
    bounded by the block-size distribution. The string-similarity
    rerank tier the reference's alignment pipeline lacks
    (kiez has no lexical scorer; cf. kiez/kiez.py:1 docstring scope)."""
    import pyarrow.compute as pc

    from .arrowutil import round_away
    from .block import _run_pairs

    def distinct_keyed(t: pa.Table) -> pa.Table:
        names = np.unique(
            pc.coalesce(t[text_col], "").to_numpy(zero_copy_only=False)
        )
        pfx = np.array([s[:block_chars] for s in names], dtype=object)
        h = pd.util.hash_array(pfx).astype(np.uint64)
        part = (_splitmix64(h) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "name": pa.array(names, pa.string()),
                "__pfx": pa.array(pfx, pa.string()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "name_a": pd.Series(dtype=object),
                "name_b": pd.Series(dtype=object),
                "jw": pd.Series(dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        names = np.unique(g["name"].to_numpy(dtype=object))
        pfx = np.array([s[:block_chars] for s in names], dtype=object)
        order = np.lexsort((names, pfx))
        names, pfx = names[order], pfx[order]
        starts = np.flatnonzero(
            np.concatenate(([True], pfx[1:] != pfx[:-1]))
        )
        lengths = np.diff(np.append(starts, len(pfx)))
        a_idx, b_idx = _run_pairs(starts, lengths)
        if len(a_idx) == 0:
            return empty
        jw = round_away(
            batch_jaro_winkler(list(names[a_idx]), list(names[b_idx])), 6
        )
        keep = jw >= threshold
        return pd.DataFrame(
            {
                "name_a": names[a_idx][keep],
                "name_b": names[b_idx][keep],
                "jw": jw[keep],
            }
        )

    return (
        ds.select_columns([text_col])
        .map_batches(distinct_keyed, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_partition, batch_format="pandas")
    )


def batch_weighted_minhash(
    texts: list[str], num_perm: int = 64, seed: int = 7
) -> np.ndarray:
    """Ioffe consistent weighted sampling (ICWS, "Improved Consistent
    Sampling, Weighted Minhash and L1 Sketching", ICDM 2010) over
    whitespace-token COUNT vectors: (n_docs, num_perm) uint64
    signatures with P[sig_k(A) == sig_k(B)] = weighted Jaccard
    sum_t min(w_A, w_B) / sum_t max(w_A, w_B) — the sketch tier for
    repetition-aware near-dup (plain minhash saturates on duplicated
    boilerplate because set semantics drop counts).

    Fully vectorized: one flat (token-hash, count) array across the
    batch; per permutation the Gamma(2,1)/uniform draws come from
    splitmix chains on (token-hash, perm), and the per-doc argmin is a
    ``minimum.reduceat`` + first-match gather — no per-doc Python in
    the permutation loop. Signature element = hash(token, t) of the
    winning feature, so equal samples collide exactly as ICWS requires.
    """
    n = len(texts)
    sigs = np.zeros((n, num_perm), dtype=np.uint64)
    if n == 0:
        return sigs
    hs, ws, lens = [], [], np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if not toks:
            continue
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        hh = pd.util.hash_array(u).astype(np.uint64)
        hs.append(hh)
        ws.append(c.astype(np.float64))
        lens[i] = len(u)
    if not hs:
        return sigs
    nonempty = lens > 0
    h = np.concatenate(hs)
    lnw = np.log(np.concatenate(ws))
    ne_lens = lens[nonempty]
    offsets = np.zeros(len(ne_lens), dtype=np.int64)
    np.cumsum(ne_lens[:-1], out=offsets[1:])
    seg = np.repeat(np.arange(len(ne_lens)), ne_lens)
    out_ne = np.empty((len(ne_lens), num_perm), dtype=np.uint64)

    def uniforms(z: np.ndarray) -> np.ndarray:
        # (0, 1] uniform from the top 53 bits; never exactly 0
        return ((z >> np.uint64(11)) + np.uint64(1)) * (2.0 ** -53)

    with np.errstate(over="ignore"):
        for p in range(num_perm):
            z = _splitmix64(h ^ _splitmix64(np.uint64(seed + p)))
            u1 = uniforms(z)
            z = _splitmix64(z)
            u2 = uniforms(z)
            z = _splitmix64(z)
            u3 = uniforms(z)
            z = _splitmix64(z)
            u4 = uniforms(z)
            z = _splitmix64(z)
            beta = uniforms(z)
            r = -np.log(u1 * u2)  # Gamma(2, 1)
            lnc = np.log(-np.log(u3 * u4))  # ln of Gamma(2, 1)
            t = np.floor(lnw / r + beta)
            ln_a = lnc - r * (t - beta) - r
            mins = np.minimum.reduceat(ln_a, offsets)
            eq = ln_a == np.repeat(mins, ne_lens)
            pos = np.flatnonzero(eq)
            _, first = np.unique(seg[pos], return_index=True)
            win = pos[first]
            out_ne[:, p] = _splitmix64(
                h[win] ^ _splitmix64(t[win].astype(np.int64).astype(np.uint64))
            )
    sigs[nonempty] = out_ne
    return sigs


def dedup_weighted_minhash(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 7,
) -> "ray.data.Dataset":
    """Weighted-Jaccard near-dup clustering: ICWS signatures -> LSH band
    buckets -> in-bucket signature-collision verify (the collision
    fraction IS the weighted-jaccard estimate) -> connected components.
    Same banding-explode / int64-packed-bucket / in-group verify shape
    as ``dedup_minhash_lsh`` (signatures ride the explode; nothing
    passes through the driver); the sketch differs, not the shuffle
    plan."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    class WeightedSigner:
        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_pylist()
            sigs = batch_weighted_minhash(texts, num_perm, seed)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "minhash": pa.FixedSizeListArray.from_arrays(
                        pa.array(
                            sigs.ravel().view(np.int64), pa.int64()
                        ),
                        num_perm,
                    ),
                }
            )

    sigs = ds.select_columns([id_col, text_col]).map_batches(
        WeightedSigner, concurrency=(1, 8), batch_size=4096,
        batch_format="pyarrow",
    )

    exploded = sigs.map_batches(
        lambda t: _explode_band_buckets(t, id_col, num_perm, bands, True),
        batch_format="pyarrow",
    )
    edges = _verified_pairs_from_buckets(
        exploded, id_col, num_perm=num_perm, threshold=threshold,
        distinct=False,
    )
    nodes = ds.select_columns([id_col]).map_batches(
        lambda t: pa.table({"node": t[id_col]}), batch_format="pyarrow"
    )
    return connected_components(edges, extra_nodes_ds=nodes)


def source_overlap(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    group_col: str = "source",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Cross-source contamination census: for every pair of sources,
    how many distinct bag-of-words documents (identical unique-token
    sets) appear in BOTH — the "did split A leak into split B" check a
    training-data pipeline runs before mixing corpora. Token-set
    identity (not raw-string identity) so reorderings and repetitions
    of the same vocabulary still count as the same content.

    Output: (source_a, source_b, n_shared) with source_a < source_b.

    Scale shape: each batch computes a 128-bit COMMUTATIVE token-set
    hash per doc (flat token array -> per-doc unique codes -> two
    independent summed splitmix64 mixes via ``np.add.reduceat``; set
    equality needs no canonical string rebuild and no per-row Python),
    dedupes (key, source) within the batch, and ships only those tiny
    rows. One hash shuffle on the key (a token-set never spans two
    partitions), then each partition counts source pairs per key with a
    vectorized self-merge and emits (source_a, source_b, partial_n)
    combiner rows; the final fold is a groupby-sum over O(|sources|^2)
    rows. Raw texts never shuffle; no stage holds more than a batch.
    """

    def add_keys(t: pa.Table) -> pa.Table:
        texts = pd.Series(
            t[text_col].to_numpy(zero_copy_only=False)
        ).fillna("")
        tok_lists = texts.str.split(" ")
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        if len(texts) == 0 or total == 0:
            return pa.Table.from_pandas(
                pd.DataFrame(
                    {
                        "__k1": pd.Series(dtype=np.int64),
                        "__k2": pd.Series(dtype=np.int64),
                        group_col: pd.Series(dtype=object),
                        "__part": pd.Series(dtype=np.int32),
                    }
                ),
                preserve_index=False,
            )
        flat = np.empty(total, dtype=object)
        pos = 0
        for ts in tok_lists:
            flat[pos : pos + len(ts)] = ts
            pos += len(ts)
        doc = np.repeat(np.arange(len(texts)), lens)
        ct, ut = pd.factorize(flat)
        # per-doc unique token codes (sorted within doc => dedupe adjacents)
        order = np.lexsort((ct, doc))
        sd, st = doc[order], ct[order]
        keep = np.concatenate(
            ([True], (sd[1:] != sd[:-1]) | (st[1:] != st[:-1]))
        )
        kd, kt = sd[keep], st[keep]
        th1 = _splitmix64(
            pd.util.hash_array(ut).astype(np.uint64)
        )
        th2 = _splitmix64(
            pd.util.hash_array(ut, hash_key="kiezraysetovlap1").astype(
                np.uint64
            )
        )
        starts = np.flatnonzero(
            np.concatenate(([True], kd[1:] != kd[:-1]))
        )
        with np.errstate(over="ignore"):
            h1 = np.add.reduceat(th1[kt], starts)
            h2 = np.add.reduceat(th2[kt], starts)
        src = t[group_col].to_numpy(zero_copy_only=False)[kd[starts]]
        out = pd.DataFrame(
            {
                "__k1": h1.astype(np.int64),
                "__k2": h2.astype(np.int64),
                group_col: src,
            }
        ).drop_duplicates()
        part = (
            out["__k1"].to_numpy().astype(np.uint64)
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return pa.Table.from_pandas(
            out.assign(__part=part), preserve_index=False
        )

    def pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "source_a": pd.Series(dtype=object),
                "source_b": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.drop_duplicates(["__k1", "__k2", group_col])
        k1 = g["__k1"].to_numpy()
        k2 = g["__k2"].to_numpy()
        order = np.lexsort((k2, k1))
        s1, s2 = k1[order], k2[order]
        kc = np.cumsum(
            np.concatenate(([True], (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])))
        )
        d = pd.DataFrame(
            {"kc": kc, "src": g[group_col].to_numpy()[order]}
        )
        m = d.merge(d, on="kc")
        m = m[m["src_x"] < m["src_y"]]
        if len(m) == 0:
            return empty
        out = (
            m.groupby(["src_x", "src_y"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out.columns = ["source_a", "source_b", "n"]
        out["n"] = out["n"].astype(np.int64)
        return out

    from ray.data.aggregate import Sum

    return (
        docs.select_columns([text_col, group_col])
        .map_batches(add_keys, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_partition, batch_format="pandas")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n", alias_name="n_shared"))
    )


def dedup_canonical(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Canonicalized exact dedup — lowercase, strip non-alphanumerics to
    single spaces, trim, THEN group: catches the near-exact duplicates
    raw hashing misses (case / punctuation / whitespace variants), the
    standard first dedup rung after byte-exact. Rows whose canonical
    form is empty are dropped (no signal to group on).

    Output: (id_col = the group's min id, n_copies int64) per surviving
    canonical group.

    Scale shape: canonicalization is three Arrow kernels (utf8_lower,
    RE2 replace, trim) — zero Python per row; the canonical TEXT never
    shuffles: each batch reduces it to the same 128-bit hash pair used
    by ``dedup_exact`` plus an in-batch (hash, min_id, count) combiner,
    so ONE coarse hash shuffle moves only O(distinct canonicals per
    batch) 4-column rows; each partition folds min-id/count with one
    lexsort + reduceat.
    """
    import pyarrow.compute as pc

    def add_keys(t: pa.Table) -> pa.Table:
        canon = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(t[text_col]), "[^a-z0-9]+", " "
            )
        )
        arr = canon.to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = arr != ""
        arr, ids = arr[keep], ids[keep]
        h1 = pd.util.hash_array(arr).astype(np.uint64)
        h2 = pd.util.hash_array(arr, hash_key="kiezraycanonkey2").astype(
            np.uint64
        )
        # in-batch combiner: one row per distinct canonical in the batch
        code = pd.factorize(h1 ^ _splitmix64(h2))[0]
        order = np.argsort(code, kind="stable")
        sc = code[order]
        first = np.concatenate(([True], sc[1:] != sc[:-1]))
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(sc)))
        mins = np.minimum.reduceat(ids[order], starts)
        sel = order[starts]
        part = (h1[sel] % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "__ch1": pa.array(h1[sel].astype(np.int64), pa.int64()),
                "__ch2": pa.array(h2[sel].astype(np.int64), pa.int64()),
                id_col: pa.array(mins, pa.int64()),
                "n_copies": pa.array(cnt.astype(np.int64), pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype=np.int64),
                "n_copies": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        c1 = g["__ch1"].to_numpy()
        c2 = g["__ch2"].to_numpy()
        ids = g[id_col].to_numpy()
        cnt = g["n_copies"].to_numpy()
        order = np.lexsort((ids, c2, c1))
        c1, c2, ids, cnt = c1[order], c2[order], ids[order], cnt[order]
        first = np.concatenate(
            ([True], (c1[1:] != c1[:-1]) | (c2[1:] != c2[:-1]))
        )
        starts = np.flatnonzero(first)
        return pd.DataFrame(
            {
                id_col: ids[starts],  # sorted ascending within group
                "n_copies": np.add.reduceat(cnt, starts).astype(np.int64),
            }
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(add_keys, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold, batch_format="pandas")
    )


def dl_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "p_partkey",
    text_col: str = "p_name",
    max_dist: int = 3,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Blocked Damerau-Levenshtein similarity join over a SHORT name
    field: every unordered pair sharing the name's first word, kept
    when the TRUE (unrestricted) DL distance is <= ``max_dist`` ->
    (a_id, b_id, dist), a_id < b_id. The first word is THE blocking
    key (one shuffle); each partition expands its blocks with the
    vectorized ``_run_pairs`` and scores them with ONE chunked
    ``batch_damerau_levenshtein`` call — no per-pair Python."""
    import pyarrow.compute as pc

    from .block import _run_pairs

    def add_key(t: pa.Table) -> pa.Table:
        first = pc.list_element(
            pc.split_pattern(pc.coalesce(t[text_col], ""), " "), 0
        )
        h = pd.util.hash_array(
            first.to_pandas().to_numpy(dtype=object)
        ).astype(np.uint64)
        part = (_splitmix64(h) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                id_col: t[id_col],
                text_col: t[text_col],
                "__blk": first,
                "__part": pa.array(part, pa.int32()),
            }
        )

    def pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a_id": pd.Series(dtype=np.int64),
                "b_id": pd.Series(dtype=np.int64),
                "dist": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        blk = g["__blk"].to_numpy(dtype=object)
        ids = g[id_col].to_numpy()
        texts = g[text_col].to_numpy(dtype=object)
        order = np.lexsort((ids, blk))
        blk, ids, texts = blk[order], ids[order], texts[order]
        starts = np.flatnonzero(np.concatenate(([True], blk[1:] != blk[:-1])))
        lengths = np.diff(np.append(starts, len(blk)))
        a_idx, b_idx = _run_pairs(starts, lengths)
        if len(a_idx) == 0:
            return empty
        dist = batch_damerau_levenshtein(
            np.array([t or "" for t in texts[a_idx]], dtype=object),
            np.array([t or "" for t in texts[b_idx]], dtype=object),
        )
        keep = dist <= max_dist
        return pd.DataFrame(
            {
                "a_id": ids[a_idx][keep],
                "b_id": ids[b_idx][keep],
                "dist": dist[keep],
            }
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(add_key, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_partition, batch_format="pandas")
    )


def batch_byte_jaccard(a_texts, b_texts) -> np.ndarray:
    """Distinct-BYTE Jaccard similarity for a batch of string pairs
    (DuckDB ``jaccard`` semantics, probed empirically: distinct UTF-8
    bytes, so ASCII text behaves as distinct characters). Vectorized:
    one presence bitmap per side over the batch's 256-wide byte
    alphabet, built with a single scatter per side — no per-pair
    Python sets."""
    P = len(a_texts)
    out = np.zeros(P, dtype=np.float64)
    if P == 0:
        return out
    pa_ = np.zeros((P, 256), dtype=bool)
    pb_ = np.zeros((P, 256), dtype=bool)
    for i, s in enumerate(a_texts):
        if s:
            pa_[i, np.frombuffer(s.encode("utf-8"), np.uint8)] = True
    for i, s in enumerate(b_texts):
        if s:
            pb_[i, np.frombuffer(s.encode("utf-8"), np.uint8)] = True
    inter = (pa_ & pb_).sum(axis=1).astype(np.float64)
    union = (pa_ | pb_).sum(axis=1).astype(np.float64)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out


def pair_features(
    ds: "ray.data.Dataset",
    id_col: str = "p_partkey",
    text_col: str = "p_name",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """ER matcher feature extraction: for every blocked candidate pair
    (first word of the name = the blocking key), the similarity
    feature vector a learned / Fellegi-Sunter matcher consumes —
    distinct-byte Jaccard, Jaro-Winkler, Levenshtein distance, and
    length ratio. One block-key shuffle; each partition expands its
    blocks with ``_run_pairs`` and scores the WHOLE pair batch with
    one call per kernel (all batch-vectorized, fuzz-verified against
    the DuckDB reference functions)."""
    import pyarrow.compute as pc

    from .block import _run_pairs

    def add_key(t: pa.Table) -> pa.Table:
        first = pc.list_element(
            pc.split_pattern(pc.coalesce(t[text_col], ""), " "), 0
        )
        h = pd.util.hash_array(
            first.to_pandas().to_numpy(dtype=object)
        ).astype(np.uint64)
        part = (_splitmix64(h) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                id_col: t[id_col],
                text_col: t[text_col],
                "__blk": first,
                "__part": pa.array(part, pa.int32()),
            }
        )

    def feats_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a_id": pd.Series(dtype=np.int64),
                "b_id": pd.Series(dtype=np.int64),
                "jac": pd.Series(dtype=np.float64),
                "jw": pd.Series(dtype=np.float64),
                "lev": pd.Series(dtype=np.int64),
                "len_ratio": pd.Series(dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        blk = g["__blk"].to_numpy(dtype=object)
        ids = g[id_col].to_numpy()
        texts = g[text_col].to_numpy(dtype=object)
        order = np.lexsort((ids, blk))
        blk, ids, texts = blk[order], ids[order], texts[order]
        starts = np.flatnonzero(np.concatenate(([True], blk[1:] != blk[:-1])))
        lengths = np.diff(np.append(starts, len(blk)))
        a_idx, b_idx = _run_pairs(starts, lengths)
        if len(a_idx) == 0:
            return empty
        at = [t or "" for t in texts[a_idx]]
        bt = [t or "" for t in texts[b_idx]]
        la = np.fromiter((len(s) for s in at), np.float64, len(at))
        lb = np.fromiter((len(s) for s in bt), np.float64, len(bt))
        return pd.DataFrame(
            {
                "a_id": ids[a_idx],
                "b_id": ids[b_idx],
                "jac": batch_byte_jaccard(at, bt),
                "jw": batch_jaro_winkler(at, bt),
                "lev": batch_levenshtein(at, bt),
                "len_ratio": np.minimum(la, lb) / np.maximum(la, lb),
            }
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(add_key, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(feats_partition, batch_format="pandas")
    )


def monge_elkan_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "p_partkey",
    text_col: str = "p_name",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Monge-Elkan token-level similarity over blocked candidate pairs
    (Monge & Elkan 1996): ``ME(a->b) = mean over tokens of a of the
    best Jaro-Winkler match in b`` — the hybrid matcher feature that
    tolerates token reordering ("green forest" vs "forest green"),
    which whole-string JW / Levenshtein penalize. Emits both
    directions (``me_ab``, ``me_ba``) since ME is asymmetric.

    Scale shape: identical to ``pair_features`` — first-word blocking
    key, ONE coarse key-hash shuffle, per-partition vectorized pair
    expansion (``_run_pairs``). The token cross-product per pair is
    flattened across the WHOLE partition and scored with ONE
    ``batch_jaro_winkler`` call; per-(pair, token) maxima and per-pair
    means come from ``reduceat`` over segment offsets — no per-pair
    Python in the kernel path. Cross size is bounded by (tokens/name)^2
    per pair (~25 for part names), so traffic stays O(pairs).

    Reference scope: the reference (kiez) ranks by vector-space
    distance only; this is the string-matcher companion a linkage
    pipeline runs on blocked pairs (cf. SURVEY §2 ER tier).
    """
    import pyarrow.compute as pc

    from .block import _run_pairs

    def add_key(t: pa.Table) -> pa.Table:
        first = pc.list_element(
            pc.split_pattern(pc.coalesce(t[text_col], ""), " "), 0
        )
        h = pd.util.hash_array(
            first.to_pandas().to_numpy(dtype=object)
        ).astype(np.uint64)
        part = (_splitmix64(h) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                id_col: t[id_col],
                text_col: t[text_col],
                "__blk": first,
                "__part": pa.array(part, pa.int32()),
            }
        )

    def me_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a_id": pd.Series(dtype=np.int64),
                "b_id": pd.Series(dtype=np.int64),
                "me_ab": pd.Series(dtype=np.float64),
                "me_ba": pd.Series(dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        blk = g["__blk"].to_numpy(dtype=object)
        ids = g[id_col].to_numpy()
        texts = g[text_col].to_numpy(dtype=object)
        order = np.lexsort((ids, blk))
        blk, ids, texts = blk[order], ids[order], texts[order]
        starts = np.flatnonzero(np.concatenate(([True], blk[1:] != blk[:-1])))
        lengths = np.diff(np.append(starts, len(blk)))
        a_idx, b_idx = _run_pairs(starts, lengths)
        if len(a_idx) == 0:
            return empty
        # tokenize each distinct row once (DuckDB string_split(' ')
        # semantics: no token merging, empty string -> [''])
        toks = [(t or "").split(" ") for t in texts]
        tok_arr = np.array([w for ts in toks for w in ts], dtype=object)
        n_tok = np.fromiter(map(len, toks), np.int64, len(toks))
        tok_start = np.concatenate(([0], np.cumsum(n_tok)))[:-1]
        na, nb = n_tok[a_idx], n_tok[b_idx]
        sa, sb = tok_start[a_idx], tok_start[b_idx]
        cs = na * nb  # cross-product size per pair
        total = int(cs.sum())
        P = len(a_idx)
        pair_of = np.repeat(np.arange(P, dtype=np.int64), cs)
        cross0 = np.concatenate(([0], np.cumsum(cs)))[:-1]
        j = np.arange(total, dtype=np.int64) - cross0[pair_of]
        a_off = j // nb[pair_of]
        b_off = j - a_off * nb[pair_of]
        jw = batch_jaro_winkler(
            list(tok_arr[sa[pair_of] + a_off]),
            list(tok_arr[sb[pair_of] + b_off]),
        )

        def directed_mean(scores, inner, outer):
            # scores laid out outer-major: per (pair, outer-token)
            # segment of length inner -> max, then per-pair mean over
            # the outer tokens (sequential reduceat = SQL list order)
            seg_starts = np.concatenate(
                ([0], np.cumsum(np.repeat(inner, outer)))
            )[:-1]
            best = np.maximum.reduceat(scores, seg_starts)
            p0 = np.concatenate(([0], np.cumsum(outer)))[:-1]
            return np.add.reduceat(best, p0) / outer

        me_ab = directed_mean(jw, nb, na)
        # re-lay the same scores b-major (b_off*na + a_off) — one
        # scatter instead of a second O(cross) JW kernel pass
        perm = cross0[pair_of] + b_off * na[pair_of] + a_off
        jw_b = np.empty_like(jw)
        jw_b[perm] = jw
        me_ba = directed_mean(jw_b, na, nb)
        return pd.DataFrame(
            {
                "a_id": ids[a_idx],
                "b_id": ids[b_idx],
                "me_ab": me_ab,
                "me_ba": me_ba,
            }
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(add_key, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(me_partition, batch_format="pandas")
    )


def tfidf_cosine_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "p_partkey",
    text_col: str = "p_name",
    num_partitions: int = 32,
    scale: int = 1_000_000,
) -> "ray.data.Dataset":
    """TF-IDF-weighted cosine similarity over blocked candidate pairs
    (Cohen/Ravikumar/Fienberg's vector-space matcher feature): tokens
    weighted ``tf * idf``, ``cos = <wa, wb> / (|wa| |wb|)``.

    Exactness: idf is quantized to fixed-point int64
    (``round(ln(N/df) * scale)``), so dot products and norms are EXACT
    integer sums — order/partition-invariant, and bit-identical to a
    SQL oracle doing the same integer arithmetic; only the final
    ``dot / sqrt(n2a * n2b)`` touches floating point (one deterministic
    division per pair).

    Scale shape: pass 1 folds per-batch (token, df-partial) combiner
    rows to an idf table — ASSUMES a bounded vocabulary (part-name
    vocab here is ~10^2; for open web vocab swap the broadcast for a
    token-key hash join, the ``fs_scores``-style transport). Pass 2 is
    the one block-key shuffle shared by every pair operator; inside a
    partition, per-pair dot products come from the (block, token)
    co-occurrence runs (``_run_pairs`` + one lexsort + reduceat), the
    same wedge enumeration the triangle counter uses — no per-pair
    Python, contribution volume is Σ_t |rows(t)|² within blocks.
    """
    import pyarrow.compute as pc

    from .arrowutil import round_away
    from .block import _run_pairs

    n_docs = ds.count()

    def df_partial(t: pa.Table) -> pa.Table:
        toks = [
            np.unique((s or "").split(" "))
            for s in t[text_col].to_pandas().to_numpy(dtype=object)
        ]
        flat = np.concatenate(toks) if toks else np.array([], dtype=object)
        uu, cnt = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "tok": pa.array(uu.astype(object), pa.string()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    dfp = (
        ds.select_columns([text_col])
        .map_batches(df_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("tok", as_index=False)["c"]
        .sum()
    )
    idf_fixed = round_away(
        np.log(float(n_docs) / dfp["c"].to_numpy().astype(np.float64))
        * scale,
        0,
    ).astype(np.int64)
    vhash = pd.util.hash_array(
        dfp["tok"].to_numpy(dtype=object)
    ).astype(np.uint64)
    vorder = np.argsort(vhash)
    vhash, vwt = vhash[vorder], idf_fixed[vorder]

    def add_key(t: pa.Table) -> pa.Table:
        first = pc.list_element(
            pc.split_pattern(pc.coalesce(t[text_col], ""), " "), 0
        )
        h = pd.util.hash_array(
            first.to_pandas().to_numpy(dtype=object)
        ).astype(np.uint64)
        part = (_splitmix64(h) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                id_col: t[id_col],
                text_col: t[text_col],
                "__blk": first,
                "__part": pa.array(part, pa.int32()),
            }
        )

    def cos_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a_id": pd.Series(dtype=np.int64),
                "b_id": pd.Series(dtype=np.int64),
                "cos_sim": pd.Series(dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        blk = g["__blk"].to_numpy(dtype=object)
        ids = g[id_col].to_numpy()
        texts = g[text_col].to_numpy(dtype=object)
        order = np.lexsort((ids, blk))
        blk, ids, texts = blk[order], ids[order], texts[order]
        R = len(g)
        starts = np.flatnonzero(np.concatenate(([True], blk[1:] != blk[:-1])))
        lengths = np.diff(np.append(starts, R))
        blk_of = np.repeat(np.arange(len(starts)), lengths)
        a_idx, b_idx = _run_pairs(starts, lengths)
        if len(a_idx) == 0:
            return empty
        toks = [(s or "").split(" ") for s in texts]
        n_tok = np.fromiter(map(len, toks), np.int64, R)
        row_of = np.repeat(np.arange(R, dtype=np.int64), n_tok)
        th = pd.util.hash_array(
            np.array([w for ts in toks for w in ts], dtype=object)
        ).astype(np.uint64)
        # tf per (row, token): collapse duplicate tokens within a row
        o2 = np.lexsort((th, row_of))
        row_s, th_s = row_of[o2], th[o2]
        new = np.concatenate(
            ([True], (row_s[1:] != row_s[:-1]) | (th_s[1:] != th_s[:-1]))
        )
        rs = np.flatnonzero(new)
        tf = np.diff(np.append(rs, len(th_s))).astype(np.int64)
        urow, uth = row_s[rs], th_s[rs]
        pos = np.searchsorted(vhash, uth)
        w = tf * vwt[pos]  # exact int64 weights
        n2 = np.zeros(R, dtype=np.int64)
        np.add.at(n2, urow, w * w)
        # per-(block, token) runs -> pairwise dot contributions
        o3 = np.lexsort((urow, uth, blk_of[urow]))
        br, bt, bw = urow[o3], uth[o3], w[o3]
        bb = blk_of[br]
        run_new = np.concatenate(
            ([True], (bb[1:] != bb[:-1]) | (bt[1:] != bt[:-1]))
        )
        rstarts = np.flatnonzero(run_new)
        rlens = np.diff(np.append(rstarts, len(br)))
        ci, cj = _run_pairs(rstarts, rlens)
        if len(ci):
            contrib = bw[ci] * bw[cj]  # exact int64
            pkey = br[ci] * np.int64(R) + br[cj]  # row order = id order
            o4 = np.argsort(pkey, kind="stable")
            pkey, contrib = pkey[o4], contrib[o4]
            pnew = np.concatenate(([True], pkey[1:] != pkey[:-1]))
            ps = np.flatnonzero(pnew)
            dot_key = pkey[ps]
            dot_val = np.add.reduceat(contrib, ps)
        else:
            dot_key = np.empty(0, np.int64)
            dot_val = np.empty(0, np.int64)
        want = a_idx * np.int64(R) + b_idx
        loc = np.searchsorted(dot_key, want)
        locc = np.minimum(loc, max(len(dot_key) - 1, 0))
        hit = (
            (dot_key[locc] == want) if len(dot_key) else np.zeros(len(want), bool)
        )
        dots = np.where(hit, dot_val[locc] if len(dot_val) else 0, 0).astype(
            np.float64
        )
        denom = np.sqrt(
            n2[a_idx].astype(np.float64) * n2[b_idx].astype(np.float64)
        )
        return pd.DataFrame(
            {
                "a_id": ids[a_idx],
                "b_id": ids[b_idx],
                "cos_sim": dots / denom,
            }
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(add_key, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(cos_partition, batch_format="pandas")
    )
