"""Locality-sensitive blocking with explicit skew handling.

Stage 1 of the north-rule pipeline: give every document a small set of
blocking keys (MinHash band buckets over its span text) such that
duplicates of one entity collide in >= 1 block with high probability.
The block key is THE partitioning key of the whole pipeline: index build,
pair scoring and the first clustering shuffle all group by it.

Skew: blocks are data-dependent, and hub surface forms produce huge
blocks. ``split_oversized_blocks`` measures the block histogram (an
A1-style grouped count) and deterministically salts any block above
``max_block`` into ceil(b / max_block) sub-blocks by doc-id hash. Pair
recall inside a split block drops (documented trade); the alternative
cap-and-truncate is what dedup.py uses. Both bound every downstream
group to O(max_block^2) work.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _shingle_hashes, _splitmix64


class BlockKeyer:
    """(doc_id, spans|text) -> exploded (doc_id, block_key) rows.

    MinHash over character shingles of the document text; ``bands`` keys
    per doc (band index + band hash). Permutation params derived once per
    actor from the seed.
    """

    def __init__(
        self,
        bands: int = 8,
        rows_per_band: int = 4,
        shingle_k: int = 4,
        seed: int = 42,
        text_from_spans: bool = True,
        extra_cols: tuple = (),
        emit_string_keys: bool = True,
    ):
        num_perm = bands * rows_per_band
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 2**61 - 1, size=num_perm, dtype=np.uint64) | 1
        self.b = rng.randint(0, 2**61 - 1, size=num_perm, dtype=np.uint64)
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.text_from_spans = text_from_spans
        self.extra_cols = extra_cols
        # the int64 block_hash is the partition/group identity everywhere;
        # the human-readable string key is optional (per-row f-string cost)
        self.emit_string_keys = emit_string_keys

    @staticmethod
    def _doc_texts_from_spans(col: pa.ChunkedArray | pa.Array) -> list[str]:
        """Per-doc text: span text for text spans, media_ref otherwise,
        space-joined in span order — pure Arrow kernels (flatten the
        list<struct>, if_else on kind, binary_join per list)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.values
        piece = pc.if_else(
            pc.equal(flat.field("kind"), "text"),
            flat.field("text"),
            flat.field("media_ref"),
        )
        lst = pa.ListArray.from_arrays(col.offsets, piece)
        return pc.binary_join(lst, " ").to_pylist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        if self.text_from_spans:
            texts = [
                t or "" for t in self._doc_texts_from_spans(batch["spans"])
            ]
        else:
            texts = [t or "" for t in batch["text"].to_pylist()]
        n = len(ids)
        from .dedup import batch_minhash

        sigs = batch_minhash(texts, self.a, self.b, self.shingle_k)
        view = sigs.reshape(n, self.bands, self.rows_per_band)
        mix = view[:, :, 0]
        for r in range(1, self.rows_per_band):
            mix = _splitmix64(mix ^ view[:, :, r])
        out_ids = np.repeat(np.array(ids, dtype=object), self.bands)
        band_idx = np.tile(np.arange(self.bands), n)
        # int64 key: every downstream partition/group step hashes/sorts
        # 8-byte ints instead of strings (same identity — the band index
        # rides the top bits, so cross-band collisions of the 64-bit band
        # hash cannot alias)
        bhash = (
            (band_idx.astype(np.uint64) << np.uint64(56))
            ^ (mix.ravel() >> np.uint64(8))
        ).astype(np.int64)
        cols = {"doc_id": pa.array(out_ids.tolist(), pa.string())}
        if self.emit_string_keys:
            keys = [f"b{b}:{h:x}" for b, h in zip(band_idx, mix.ravel())]
            cols["block_key"] = pa.array(keys, pa.string())
        cols["block_hash"] = pa.array(bhash, pa.int64())
        for c in self.extra_cols:
            src = batch[c]
            idx = np.repeat(np.arange(n), self.bands)
            cols[c] = src.take(pa.array(idx))
        return pa.table(cols)


def blocking_keys(
    docs_ds: "ray.data.Dataset",
    bands: int = 8,
    rows_per_band: int = 4,
    shingle_k: int = 4,
    seed: int = 42,
    text_from_spans: bool = True,
    carry_cols: tuple = ("embedding",),
    concurrency=(1, 8),
    emit_string_keys: bool = True,
) -> "ray.data.Dataset":
    # the keyer's state (seeded permutation params) is microseconds to
    # build, so it ships as a pickled INSTANCE and runs in the shared
    # task pool — paying a fresh actor-pool spin-up per call was the
    # measured bulk of the blocking stage at bench scale (~2.5s fixed)
    keyer = BlockKeyer(
        bands=bands,
        rows_per_band=rows_per_band,
        shingle_k=shingle_k,
        seed=seed,
        text_from_spans=text_from_spans,
        extra_cols=tuple(carry_cols),
        emit_string_keys=emit_string_keys,
    )
    cap = max(concurrency) if isinstance(concurrency, tuple) else concurrency
    return docs_ds.map_batches(
        keyer,
        batch_format="pyarrow",
        concurrency=cap,
        zero_copy_batch=True,
    )


def block_histogram(keys_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(block_key, n_docs) — the skew detector (A1-style grouped count)."""
    from ray.data.aggregate import Count

    return keys_ds.groupby("block_key").aggregate(Count(alias_name="n_docs"))


def oversized_block_payload(
    keys_ds: "ray.data.Dataset",
    max_block: int = 256,
):
    """Object-store ref of the (small) oversized-block -> fanout map, or
    None when no block exceeds ``max_block``. One narrow histogram
    shuffle; only the oversized keys (rare by construction) reach the
    driver."""
    import ray
    from ray.data.aggregate import Count

    has_hash = "block_hash" in keys_ds.schema().names
    # filter DISTRIBUTED: only the oversized keys (rare by construction)
    # reach the driver — the full histogram is corpus-sized at 10^12 docs.
    # The histogram groups on the int64 companion hash when present (8-byte
    # shuffle instead of strings); a 56-bit band-hash collision between two
    # distinct keys merely co-salts them — harmless and deterministic.
    if has_hash:
        # coarse-partition histogram: 64 hash partitions, one np.unique
        # per partition (Ray's sort-based per-key aggregate is the slow
        # path at high key cardinality on this version)
        HP = 64

        def add_hist_part(t: pa.Table) -> pa.Table:
            bh = t["block_hash"].to_numpy(zero_copy_only=False)
            part = (
                _splitmix64(bh.astype(np.uint64)) % np.uint64(HP)
            ).astype(np.int32)
            return pa.table(
                {
                    "block_hash": t["block_hash"],
                    "__part": pa.array(part, pa.int32()),
                }
            )

        def over_partition(g: pd.DataFrame) -> pd.DataFrame:
            vals, counts = np.unique(
                g["block_hash"].to_numpy(), return_counts=True
            )
            keep = counts > max_block
            return pd.DataFrame(
                {
                    "block_hash": vals[keep],
                    "n_docs": counts[keep].astype(np.int64),
                }
            )

        over = (
            keys_ds.map_batches(add_hist_part, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(over_partition, batch_format="pandas")
            .to_pandas()
        )
    else:
        over = (
            keys_ds.groupby("block_key")
            .aggregate(Count(alias_name="n_docs"))
            .map_batches(
                lambda t: t.filter(pc.greater(t["n_docs"], max_block)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .to_pandas()
        )
    if len(over) == 0:
        return None
    fanouts = np.ceil(over["n_docs"].to_numpy() / max_block).astype(np.int64)
    if has_hash:
        hashes = over["block_hash"].to_numpy().astype(np.int64)
        hs_order = np.argsort(hashes)
        payload = (hashes[hs_order], fanouts[hs_order])
    else:
        payload = (
            dict(zip(over["block_key"], (int(f) for f in fanouts))),
        )
    return ray.put(payload)


# per-worker-process LRU of resolved salt payloads: _Salt ships as a
# pickled instance (task pool, no actor spin-up) holding only the ref;
# each process ray.get's the small map once. Capped (not clear-then-
# insert) so two salted streams interleaving batches in one worker
# process don't thrash re-gets — keyed by ref hex, so results stay
# correct either way.
_SALT_CACHE: dict = {}
_SALT_CACHE_CAP = 4


class _Salt:
    def __init__(self, ref):
        self.ref = ref

    def _payload(self):
        import ray

        key = self.ref.hex()
        p = _SALT_CACHE.pop(key, None)
        if p is None:
            raw = ray.get(self.ref)
            if len(raw) == 2:
                p = (raw[0], raw[1], None)  # sorted int64 + aligned fanout
            else:
                p = (None, None, raw[0])
            while len(_SALT_CACHE) >= _SALT_CACHE_CAP:
                _SALT_CACHE.pop(next(iter(_SALT_CACHE)))
        _SALT_CACHE[key] = p  # re-insert = LRU touch
        return p

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from .dedup import _splitmix64

        hashes, fanouts, fanout_map = self._payload()
        if hashes is not None:
            # vectorized membership: searchsorted over the small sorted
            # oversized-hash array (no per-row dict probes)
            bh_all = t["block_hash"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(hashes, bh_all)
            pos_c = np.minimum(pos, len(hashes) - 1)
            flags = hashes[pos_c] == bh_all
            if not flags.any():
                return t
            fan = fanouts[pos_c[flags]]
        else:
            keys_all = np.asarray(t["block_key"].to_pylist(), dtype=object)
            flags = np.array([k in fanout_map for k in keys_all])
            if not flags.any():
                return t
            fan = np.array(
                [fanout_map[k] for k in keys_all[flags]],
                dtype=np.int64,
            )
        # only oversized-block rows pay per-row work (rare by
        # construction); untouched rows never leave Arrow
        flagnz = pa.array(np.flatnonzero(flags), pa.int64())
        ids_f = t["doc_id"].take(flagnz).to_pylist()
        salts = (
            np.array(
                [zlib.crc32(d.encode()) for d in ids_f], dtype=np.uint64
            )
            % fan.astype(np.uint64)
        )
        mask = pa.array(flags)
        out = t
        if "block_key" in t.column_names:
            keys_f = t["block_key"].take(flagnz).to_pylist()
            new_keys = pc.replace_with_mask(
                t["block_key"].combine_chunks(),
                mask,
                pa.array(
                    [f"{k}#s{s}" for k, s in zip(keys_f, salts)],
                    pa.string(),
                ),
            )
            out = t.set_column(
                t.schema.get_field_index("block_key"),
                "block_key",
                new_keys,
            )
        if "block_hash" in t.column_names:
            bh_f = (
                t["block_hash"].take(flagnz).to_numpy(zero_copy_only=False)
            )
            new_bh = pc.replace_with_mask(
                t["block_hash"].combine_chunks(),
                mask,
                pa.array(
                    (
                        bh_f.astype(np.uint64)
                        ^ _splitmix64(salts + np.uint64(1))
                    ).astype(np.int64),
                    pa.int64(),
                ),
            )
            out = out.set_column(
                out.schema.get_field_index("block_hash"),
                "block_hash",
                new_bh,
            )
        return out


def salt_stream(ds: "ray.data.Dataset", ref) -> "ray.data.Dataset":
    """Apply the oversized-block salt rewrite (from
    ``oversized_block_payload``) to a stream carrying block_hash /
    block_key columns; extra columns (e.g. riding embeddings) pass
    through untouched. Pure map — no shuffle, no actor pool."""
    if ref is None:
        return ds
    return ds.map_batches(
        _Salt(ref), batch_format="pyarrow", zero_copy_batch=True
    )


def split_oversized_blocks(
    keys_ds: "ray.data.Dataset",
    max_block: int = 256,
) -> "ray.data.Dataset":
    """Salt any block with > max_block docs into hash sub-blocks.

    Two grouped passes: histogram, then broadcast the (small) oversized-key
    -> fanout map into a rewrite of the key column. Deterministic: salt =
    crc32(doc_id) % fanout. The input is pinned first because both passes
    consume it.
    """
    keys_ds = keys_ds.materialize()
    ref = oversized_block_payload(keys_ds, max_block)
    if ref is None:
        return keys_ds
    return salt_stream(keys_ds, ref)


def _run_pairs(starts: np.ndarray, lengths: np.ndarray):
    """All within-run unordered pairs (a before b), fully vectorized.

    ``starts``/``lengths`` describe key runs of an array sorted by key
    (``starts[r]`` = global index of run r's first element). Enumeration
    rule: the element at local index ``l`` is the 'b' of exactly ``l``
    pairs whose 'a's are the ``l`` elements before it. Returns global
    (a_idx, b_idx) arrays of length ``sum(s*(s-1)/2)`` — no Python loop
    over runs/blocks.
    """
    total = int(lengths.sum())
    z = np.empty(0, dtype=np.int64)
    if total == 0:
        return z, z
    run_start = np.repeat(starts.astype(np.int64), lengths)
    local = np.arange(total, dtype=np.int64) - run_start  # 0..s-1 per run
    n_pairs = int(local.sum())
    if n_pairs == 0:
        return z, z
    b_idx = np.repeat(run_start + local, local)
    before = np.cumsum(np.append(0, local[:-1]))
    within = np.arange(n_pairs, dtype=np.int64) - np.repeat(before, local)
    a_idx = np.repeat(run_start, local) + within
    return a_idx, b_idx


def blocking_metrics(
    keys_ds: "ray.data.Dataset",
    gold_pairs: pa.Table,
    n_docs: int,
    hll_p: int = 14,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Blocking quality diagnostics — the numbers you check BEFORE
    trusting an ER run: ``comparisons`` (sum of s*(s-1)/2 over block
    sizes, i.e. scoring work including band multiplicity, exact),
    ``distinct_pairs`` (HLL estimate of the deduplicated candidate-pair
    universe, ~0.8% rel. error at p=14), ``reduction_ratio``
    (1 - distinct_pairs / C(n_docs,2)), and ``pair_completeness`` (exact
    fraction of gold pairs sharing >= 1 block key — blocking recall).

    Scale shape: comparisons ride the existing block histogram (grouped
    count + a scalar sum); distinct pairs come from within-partition
    vectorized pair enumeration (a block key lives in one partition;
    :func:`_run_pairs`, no per-block Python) feeding HLL register
    partials — candidate pairs are HASHED and sketched, never shuffled;
    completeness is two gold-side hash joins (gold is the small side)
    plus a distinct count over covered pair ids. Nothing driver-side is
    proportional to the candidate-pair universe.
    """
    from .relops import hash_join
    from .sketch import approx_distinct

    hist = block_histogram(keys_ds)

    def comp_partial(t: pa.Table) -> pa.Table:
        n = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"c": pa.array([int((n * (n - 1) // 2).sum())], pa.int64()),
             "b": pa.array([len(n)], pa.int64())}
        )

    agg = hist.map_batches(comp_partial, batch_format="pyarrow")
    tot = agg.sum(["c", "b"])
    comparisons, n_blocks = int(tot["sum(c)"]), int(tot["sum(b)"])

    def add_part(t: pa.Table) -> pa.Table:
        k = np.asarray(t["block_key"].to_pylist(), dtype=object)
        part = (
            pd.util.hash_array(k).astype(np.uint64)
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def pair_hashes(g: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _splitmix64

        if len(g) == 0:
            return pd.DataFrame({"ph": pd.Series(dtype=np.int64)})
        keys = g["block_key"].to_numpy()
        ids = pd.util.hash_array(
            g["doc_id"].to_numpy(dtype=object)
        ).astype(np.uint64)
        order = np.lexsort((ids, keys))
        sk, sid = keys[order], ids[order]
        starts = np.flatnonzero(
            np.concatenate(([True], sk[1:] != sk[:-1]))
        )
        lengths = np.diff(np.append(starts, len(sk)))
        a, b = _run_pairs(starts, lengths)
        lo = np.minimum(sid[a], sid[b])
        hi = np.maximum(sid[a], sid[b])
        ph = _splitmix64(_splitmix64(lo) + hi).astype(np.int64)
        return pd.DataFrame({"ph": ph})

    pair_ds = (
        keys_ds.select_columns(["doc_id", "block_key"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pair_hashes, batch_format="pandas")
    )
    distinct_pairs = float(approx_distinct(pair_ds, "ph", p=hll_p))

    n_gold = len(gold_pairs)
    ga = pa.table(
        {
            "pid_a": pa.array(np.arange(n_gold, dtype=np.int64)),
            "ga": gold_pairs["a"],
        }
    )
    gb = pa.table(
        {
            "pid_b": pa.array(np.arange(n_gold, dtype=np.int64)),
            "gb": gold_pairs["b"],
        }
    )
    keys_a = keys_ds.select_columns(["doc_id", "block_key"])
    keys_b = keys_a.map_batches(
        lambda t: pa.table({"doc_id_b": t["doc_id"], "key_b": t["block_key"]}),
        batch_format="pyarrow",
    )
    j1 = hash_join(
        ray.data.from_arrow(ga), keys_a, "ga", "doc_id",
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table(
            {
                "pk_a": pc.binary_join_element_wise(
                    pc.cast(t["pid_a"], pa.string()),
                    pc.cast(t["block_key"], pa.string()), "|",
                )
            }
        ),
        batch_format="pyarrow",
    )
    j2 = hash_join(
        ray.data.from_arrow(gb), keys_b, "gb", "doc_id_b",
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table(
            {
                "pk_b": pc.binary_join_element_wise(
                    pc.cast(t["pid_b"], pa.string()),
                    pc.cast(t["key_b"], pa.string()), "|",
                )
            }
        ),
        batch_format="pyarrow",
    )
    covered_keys = hash_join(
        j1, j2, "pk_a", "pk_b", num_partitions=num_partitions
    ).map_batches(
        lambda t: pa.table(
            {
                "pid": pc.cast(
                    pc.list_element(pc.split_pattern(t["pk_a"], "|"), 0),
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    )
    covered = covered_keys.groupby("pid").count().count()
    completeness = covered / n_gold if n_gold else 1.0
    universe = n_docs * (n_docs - 1) / 2
    return pd.DataFrame(
        {
            "n_docs": [np.int64(n_docs)],
            "n_blocks": [np.int64(n_blocks)],
            "comparisons": [np.int64(comparisons)],
            "distinct_pairs": [float(distinct_pairs)],
            "reduction_ratio": [1.0 - distinct_pairs / max(universe, 1.0)],
            "n_gold_pairs": [np.int64(n_gold)],
            "pair_completeness": [float(completeness)],
        }
    )


def sorted_neighborhood_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    window: int = 3,
    prefix_len: int = 8,
    bucket_rows: int = 4096,
) -> "ray.data.Dataset":
    """Sorted-neighborhood (SNM) blocking: order all records by a
    blocking key — the lowercased ``prefix_len``-char text prefix — and
    emit every pair within ``window`` positions of the global order
    (Hernandez & Stolfo's merge/purge alternative to hash blocking:
    catches near-boundary matches that equality blocking splits).
    ASCII scope as in ``dedup.edit_pairs``: the key packs the prefix's
    first 8 BYTES big-endian into int64, which equals DuckDB's binary
    string order for ASCII text (and any ≤8-byte UTF-8 run).

    Scale shape: the packed key rides ``relops.global_rank`` (sampled
    range partitioning, per-range lexsort, prefix-sum offsets — no
    global sort shuffle). Ranks within a range bucket of size
    ``bucket_rows`` are CONTIGUOUS by construction, so pair generation
    is pure slice arithmetic: each row goes to its home bucket
    ``(rank-1) // bucket_rows`` and the first ``window`` rows of each
    bucket are also copied to the previous bucket (overlap), then one
    groupby emits, per bucket, the offset-d pairs for d = 1..window
    with the left element a home row. ONE extra shuffle after
    global_rank, output O(n * window) id pairs — embeddings and texts
    never move.
    """
    from .relops import global_rank

    shifts = np.arange(56, -8, -8, dtype=np.uint64)

    def add_key(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(
            pc.utf8_slice_codeunits(
                pc.fill_null(t[text_col], ""), 0, prefix_len
            )
        )
        b = pc.cast(low, pa.binary()).combine_chunks()
        n = len(b)
        offs = np.frombuffer(b.buffers()[1], np.int32, count=n + 1)
        data = b.buffers()[2]
        flat = (
            np.frombuffer(data, np.uint8, count=offs[-1])
            if data is not None and offs[-1] > 0
            else np.zeros(0, np.uint8)
        )
        lens = np.minimum(np.diff(offs), 8)
        mat = np.zeros((n, 8), np.uint8)
        rows = np.repeat(np.arange(n), lens)
        pos = np.arange(len(rows)) - np.repeat(
            np.cumsum(np.concatenate(([0], lens[:-1]))), lens
        )
        src = np.repeat(offs[:-1], lens) + pos
        mat[rows, pos] = flat[src]
        key = (mat.astype(np.uint64) << shifts).sum(axis=1)
        # ASCII prefixes keep the top byte < 0x80, so int64-safe
        return pa.table(
            {
                id_col: t[id_col],
                "__snm_key": pa.array(key.astype(np.int64), pa.int64()),
            }
        )

    ranked = global_rank(
        ds.select_columns([id_col, text_col]).map_batches(
            add_key, batch_format="pyarrow"
        ),
        "__snm_key",
        id_col,
    )

    def to_buckets(t: pa.Table) -> pa.Table:
        rank = t["rank"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        home = (rank - 1) // bucket_rows
        over = ((rank - 1) % bucket_rows < window) & (home > 0)
        b = np.concatenate((home, home[over] - 1))
        r = np.concatenate((rank, rank[over]))
        i = np.concatenate((ids, ids[over]))
        return pa.table(
            {
                "__bucket": pa.array(b.astype(np.int64), pa.int64()),
                "rank": pa.array(r, pa.int64()),
                id_col: pa.array(i, pa.int64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["__bucket"].iloc[0])
        order = np.argsort(g["rank"].to_numpy(), kind="stable")
        rank = g["rank"].to_numpy()[order]
        ids = g[id_col].to_numpy()[order]
        home_end = (p + 1) * bucket_rows  # ranks > this are overlap rows
        a_parts, b_parts, g_parts = [], [], []
        for d in range(1, window + 1):
            if len(ids) <= d:
                break
            a, b = ids[:-d], ids[d:]
            ra, rb = rank[:-d], rank[d:]
            keep = (rb == ra + d) & (ra <= home_end)
            a_parts.append(a[keep])
            b_parts.append(b[keep])
            g_parts.append(np.full(int(keep.sum()), d, dtype=np.int64))
        if not a_parts:
            return pd.DataFrame(
                {"a_id": np.array([], np.int64),
                 "b_id": np.array([], np.int64),
                 "gap": np.array([], np.int64)}
            )
        return pd.DataFrame(
            {
                "a_id": np.concatenate(a_parts),
                "b_id": np.concatenate(b_parts),
                "gap": np.concatenate(g_parts),
            }
        )

    return (
        ranked.map_batches(to_buckets, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


def meta_blocking(
    docs_ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    cap: int = 20,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Weighted-node-pruned meta-blocking (Papadakis et al., TKDE'14
    family): turn redundancy-positive token blocks into a pruned
    candidate-pair graph.

    Stages (each one bounded, no all-pairs anywhere):
      1. block keys = distinct word BIGRAMS of the canonical text
         (bigrams are selective where raw unigrams degenerate);
      2. block purging — keys with document frequency outside
         ``[2, cap]`` are dropped, so no block emits more than
         C(cap, 2) pairs;
      3. candidate pairs (a < b) per surviving block, folded to CBS
         weights (= number of shared blocks) by a mixed-hash pair
         shuffle;
      4. weighted node pruning — a pair survives iff its weight
         reaches EITHER endpoint's mean neighborhood weight, as the
         EXACT integer compare ``cbs * deg >= sum_w`` (no float
         averages); node stats arrive via two hash joins, never a
         driver dict.

    Output: (a, b, cbs int64) — the reduced comparison set a
    downstream matcher actually scores.
    """
    import pyarrow.compute as pc

    pair_schema = pa.schema(
        [("tok", pa.string()), (id_col, pa.int64())]
    )

    def doc_bigrams(t: pa.Table) -> pa.Table:
        canon = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(t[text_col]), "[^a-z0-9]+", " "
            )
        )
        toks = pc.split_pattern(canon, " ")
        flat = toks.combine_chunks() if hasattr(toks, "combine_chunks") \
            else toks
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        offsets = flat.offsets.to_numpy(zero_copy_only=False)
        values = flat.values.to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.diff(offsets)
        if len(values) < 2:
            return pair_schema.empty_table()
        # adjacent-token join, masking positions that cross a doc edge
        left = values[:-1]
        right = values[1:]
        pos = np.arange(len(values) - 1)
        # position i is a valid bigram start iff i and i+1 are in the
        # same doc: i+1 < that doc's end offset
        doc_of = np.searchsorted(offsets, pos, side="right") - 1
        valid = (pos + 1) < offsets[doc_of + 1]
        bg = np.char.add(
            np.char.add(left[valid].astype(str), "_"),
            right[valid].astype(str),
        )
        doc_ids = np.repeat(ids, np.maximum(n_tok - 1, 0))
        # distinct (doc, bigram) within the batch
        df = pd.DataFrame({"tok": bg, id_col: doc_ids})
        df = df.drop_duplicates()
        return pa.table(
            {
                "tok": pa.array(df["tok"].to_numpy(), pa.string()),
                id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
            }
        )

    tok_ds = docs_ds.select_columns([id_col, text_col]).map_batches(
        doc_bigrams, batch_format="pyarrow", zero_copy_batch=True
    )

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": np.array([], np.int64), "b": np.array([], np.int64),
             "w": np.array([], np.int64)}
        )
        ids = np.unique(g[id_col].to_numpy())
        n = len(ids)
        if n < 2 or n > cap:
            return empty
        iu, ju = np.triu_indices(n, k=1)
        return pd.DataFrame(
            {"a": ids[iu], "b": ids[ju],
             "w": np.ones(len(iu), np.int64)}
        )

    raw_pairs = tok_ds.groupby("tok").map_groups(
        block_pairs, batch_format="pandas"
    )

    P = num_partitions
    cbs_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("w", pa.int64())]
    )

    def pair_combine(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return cbs_schema.empty_table()
        b = t["b"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, w = a[order], b[order], w[order]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "a": pa.array(a[starts], pa.int64()),
                "b": pa.array(b[starts], pa.int64()),
                "w": pa.array(np.add.reduceat(w, starts), pa.int64()),
            }
        )

    def add_pair_part(t: pa.Table) -> pa.Table:
        mixed = pc.bit_wise_xor(
            t["a"], pc.multiply(t["b"], pa.scalar(2654435761, pa.int64()))
        )
        return t.append_column(
            "__part",
            pc.cast(pc.bit_wise_and(mixed, pa.scalar(P - 1, pa.int64())),
                    pa.int32()),
        )

    cbs = (
        raw_pairs.map_batches(pair_combine, batch_format="pyarrow",
                              zero_copy_batch=True)
        .map_batches(add_pair_part, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("__part")
        .map_groups(
            lambda g: pair_combine(g.select(["a", "b", "w"])),
            batch_format="pyarrow",
        )
    ).materialize()

    # node neighborhood stats: sum of weights + degree per endpoint
    def explode_nodes(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(np.concatenate([a, b]), pa.int64()),
                "s": pa.array(np.concatenate([w, w]), pa.int64()),
                "deg": pa.array(np.ones(2 * len(a), np.int64), pa.int64()),
            }
        )

    from .pipelines.queries import _int_sum_fold  # shared exact fold

    nodes = _int_sum_fold(
        cbs.map_batches(explode_nodes, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["s", "deg"],
    )

    # node stats reach pairs via hash joins (never a driver dict)
    pa_side = cbs.map_batches(
        lambda t: pa.table(
            {"k": t["a"], "b": t["b"], "w": t["w"]}
        ),
        batch_format="pyarrow",
    ).join(nodes, join_type="inner", num_partitions=8, on=("k",))
    pb_side = pa_side.map_batches(
        lambda t: pa.table(
            {
                "k": t["b"], "a": t["k"], "w": t["w"],
                "sa": t["s"], "dega": t["deg"],
            }
        ),
        batch_format="pyarrow",
    ).join(nodes, join_type="inner", num_partitions=8, on=("k",))

    def prune(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False)
        keep = (
            (w * t["dega"].to_numpy(zero_copy_only=False)
             >= t["sa"].to_numpy(zero_copy_only=False))
            | (w * t["deg"].to_numpy(zero_copy_only=False)
               >= t["s"].to_numpy(zero_copy_only=False))
        )
        sub = t.filter(pa.array(keep))
        return pa.table(
            {"a": sub["a"], "b": sub["k"], "cbs": sub["w"]}
        )

    return pb_side.map_batches(prune, batch_format="pyarrow",
                               zero_copy_batch=True)
