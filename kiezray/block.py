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
    return docs_ds.map_batches(
        BlockKeyer,
        fn_constructor_kwargs=dict(
            bands=bands,
            rows_per_band=rows_per_band,
            shingle_k=shingle_k,
            seed=seed,
            text_from_spans=text_from_spans,
            extra_cols=tuple(carry_cols),
            emit_string_keys=emit_string_keys,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def block_histogram(keys_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(block_key, n_docs) — the skew detector (A1-style grouped count)."""
    from ray.data.aggregate import Count

    return keys_ds.groupby("block_key").aggregate(Count(alias_name="n_docs"))


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
    import ray
    from ray.data.aggregate import Count

    keys_ds = keys_ds.materialize()
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
        return keys_ds
    fanouts = np.ceil(over["n_docs"].to_numpy() / max_block).astype(np.int64)
    if has_hash:
        hashes = over["block_hash"].to_numpy().astype(np.int64)
        hs_order = np.argsort(hashes)
        payload = (hashes[hs_order], fanouts[hs_order])
    else:
        payload = (
            dict(zip(over["block_key"], (int(f) for f in fanouts))),
        )
    ref = ray.put(payload)

    class Salt:
        def __init__(self, ref):
            p = ray.get(ref)
            if len(p) == 2:
                self.hashes, self.fanouts = p  # sorted int64 + aligned fanout
                self.fanout_map = None
            else:
                self.hashes = None
                self.fanout_map = p[0]

        def __call__(self, t: pa.Table) -> pa.Table:
            import numpy as np

            from .dedup import _splitmix64

            if self.hashes is not None:
                # vectorized membership: searchsorted over the small sorted
                # oversized-hash array (no per-row dict probes)
                bh_all = t["block_hash"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(self.hashes, bh_all)
                pos_c = np.minimum(pos, len(self.hashes) - 1)
                flags = self.hashes[pos_c] == bh_all
                if not flags.any():
                    return t
                fan = self.fanouts[pos_c[flags]]
            else:
                keys_all = np.asarray(t["block_key"].to_pylist(), dtype=object)
                flags = np.array([k in self.fanout_map for k in keys_all])
                if not flags.any():
                    return t
                fan = np.array(
                    [self.fanout_map[k] for k in keys_all[flags]],
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

    return keys_ds.map_batches(
        Salt, fn_constructor_kwargs={"ref": ref}, batch_format="pyarrow",
        concurrency=(1, 4),
    )
