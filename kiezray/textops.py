"""Text analysis operators: stats, language-ID, quality, fingerprints.

Vectorized per-batch (pandas string kernels / numpy) — training-data
pipeline extensions beyond the reference (SURVEY.md §2.6). The SQL-checked
ops (`text_stats`, `language_id`) define their semantics to be exactly
expressible in DuckDB (whitespace-regex tokenization, marker-word counts)
so the oracle comparison is meaningful.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .arrowutil import round_away
import pyarrow as pa
import ray.data

_WS = re.compile(r"\s+")

_LANG_MARKERS = {
    "en": {"the", "a", "of", "and", "is"},
    "de": {"der", "die", "das", "und", "ist"},
    "fr": {"le", "la", "les", "et", "est"},
    "es": {"el", "los", "una", "y", "es"},
}
_LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break priority


def _tokens(text: str) -> list[str]:
    return _WS.split(text.strip())


def text_stats(docs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, text) -> (doc_id, n_chars, n_tokens, n_unique_tokens,
    unique_ratio) — whitespace tokenization matching the DuckDB oracle."""

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized: flat token array + per-doc boundaries; whitespace-only
        # texts count as one empty token (_tokens("") == [""], matching
        # the DuckDB string_split_regex semantics)
        texts = batch["text"].fillna("")
        tok_lists = texts.str.strip().str.split()
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        n = len(batch)
        n_tokens = np.maximum(lens, 1)
        n_unique = np.ones(n, dtype=np.int64)  # empty doc: {""} -> 1
        total = int(lens.sum())
        if total:
            flat = np.empty(total, dtype=object)
            doc_idx = np.repeat(np.arange(n), lens)
            pos = 0
            for ts in tok_lists:
                flat[pos : pos + len(ts)] = ts
                pos += len(ts)
            order = np.lexsort((flat, doc_idx))
            sd, sf = doc_idx[order], flat[order]
            new = np.concatenate(
                ([True], (sd[1:] != sd[:-1]) | (sf[1:] != sf[:-1]))
            )
            counts = np.bincount(sd[new], minlength=n)
            nonempty = lens > 0
            n_unique[nonempty] = counts[nonempty]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_chars": texts.str.len().astype(np.int64),
                "n_tokens": pd.Series(n_tokens, index=batch.index),
                "n_unique_tokens": pd.Series(n_unique, index=batch.index),
                "unique_ratio": round_away(
                    n_unique / np.maximum(n_tokens, 1), 6
                ).astype(np.float64),
            }
        )

    return docs_ds.map_batches(stats, batch_format="pandas")


def language_id(
    docs_ds: "ray.data.Dataset", pass_through: bool = False
) -> "ray.data.Dataset":
    """Marker-word language heuristic -> (doc_id, lang_pred).

    argmax over per-language marker counts with fixed priority tie-break;
    'unknown' when no marker fires. Deterministic; mirrored by SQL_LANG_ID.
    ``pass_through=True`` appends lang_pred to the input batch instead of
    projecting it away — lets callers fuse several per-doc kernels into
    ONE corpus scan (pipelines/curation.py).
    """

    marker_lists = [sorted(_LANG_MARKERS[lang]) for lang in _LANG_ORDER]

    def predict(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized: one flat token array for the whole batch, np.isin
        # per language + add.reduceat per doc, then a priority-first
        # argmax (np.argmax returns the FIRST max — identical to the
        # reference scan order over _LANG_ORDER)
        tok_lists = (
            batch["text"].fillna("").str.strip().str.lower().str.split()
        )
        n = len(batch)
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        scores = np.zeros((n, len(_LANG_ORDER)), dtype=np.int64)
        total = int(lens.sum())
        if total:
            flat = np.empty(total, dtype=object)
            pos = 0
            for ts in tok_lists:
                flat[pos : pos + len(ts)] = ts
                pos += len(ts)
            nonempty = lens > 0
            offs = np.zeros(int(nonempty.sum()), dtype=np.int64)
            np.cumsum(lens[nonempty][:-1], out=offs[1:])
            for li, markers in enumerate(marker_lists):
                hits = np.isin(flat, markers).astype(np.int64)
                scores[nonempty, li] = np.add.reduceat(hits, offs)
        best = np.array(_LANG_ORDER, dtype=object)[scores.argmax(axis=1)]
        best[(scores == 0).all(axis=1)] = "unknown"
        if pass_through:
            out = batch.copy()
            out["lang_pred"] = best.astype(str)
            return out
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "lang_pred": best.astype(str),
            }
        )

    return docs_ds.map_batches(predict, batch_format="pandas")


def quality_score(
    docs_ds: "ray.data.Dataset", pass_through: bool = False
) -> "ray.data.Dataset":
    """Heuristic document-quality features: length, punctuation ratio,
    stopword ratio, mean token length, and a combined [0,1] score.
    ``pass_through=True`` appends the features to the input batch (the
    one-scan fusion hook, see language_id)."""
    stop = _LANG_MARKERS["en"]
    punct = set(".,;:!?\"'()[]{}")

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized: flat token array + reduceat for stopword counts and
        # token lengths; regex count for punctuation
        texts = batch["text"].fillna("")
        tok_lists = texts.str.strip().str.split()
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        n = len(batch)
        n_tok = pd.Series(np.maximum(lens, 1), index=batch.index)
        stop_counts = np.zeros(n, dtype=np.int64)
        tok_len_sums = np.zeros(n, dtype=np.int64)
        total = int(lens.sum())
        if total:
            flat = np.empty(total, dtype=object)
            pos = 0
            for ts in tok_lists:
                flat[pos : pos + len(ts)] = ts
                pos += len(ts)
            nonempty = lens > 0
            offs = np.zeros(int(nonempty.sum()), dtype=np.int64)
            np.cumsum(lens[nonempty][:-1], out=offs[1:])
            hits = np.isin(flat, sorted(stop)).astype(np.int64)
            stop_counts[nonempty] = np.add.reduceat(hits, offs)
            flens = pd.Series(flat).str.len().to_numpy(dtype=np.int64)
            tok_len_sums[nonempty] = np.add.reduceat(flens, offs)
        stop_ratio = pd.Series(stop_counts, index=batch.index) / n_tok
        punct_re = "[" + "".join("\\" + c for c in sorted(punct)) + "]"
        punct_ratio = texts.str.count(punct_re) / texts.str.len().clip(lower=1)
        # _tokens("") == [""] -> mean length 0.0 (empty docs divide by 1)
        mean_tok_len = pd.Series(
            tok_len_sums / np.maximum(lens, 1), index=batch.index
        )
        length_ok = ((texts.str.len() >= 50) & (texts.str.len() <= 20000)).astype(
            float
        )
        qual = (
            0.4 * length_ok
            + 0.3 * (1.0 - punct_ratio.clip(0, 1))
            + 0.3 * (mean_tok_len.clip(0, 10) / 10.0)
        )
        if pass_through:
            out = batch.copy()
            out["quality"] = qual.astype(np.float64)
            return out
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_chars": texts.str.len().astype(np.int64),
                "stopword_ratio": stop_ratio.astype(np.float64),
                "punct_ratio": punct_ratio.astype(np.float64),
                "mean_token_len": mean_tok_len.astype(np.float64),
                "quality": qual.astype(np.float64),
            }
        )

    return docs_ds.map_batches(score, batch_format="pandas")


def token_counts(docs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Whitespace + BPE-ish subword token counts per document."""
    sub = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")

    def count(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        ws = np.maximum(
            texts.str.strip().str.split().map(len).to_numpy(dtype=np.int64), 1
        )  # _tokens("") == [""] -> 1
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "ws_tokens": pd.Series(ws, index=batch.index),
                "subword_tokens": texts.str.lower()
                .str.count(sub)
                .astype(np.int64),
            }
        )

    return docs_ds.map_batches(count, batch_format="pandas")


def top_terms(
    docs_ds: "ray.data.Dataset",
    k: int = 10,
    by_col: str = "lang",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Top-``k`` most frequent whitespace tokens per ``by_col`` group —
    the corpus-vocabulary / per-language stopword profile pass of a
    training-data pipeline.

    Scale shape (the canonical pre-aggregated wide count): each batch
    collapses its exploded tokens to partial (group, token, cnt) rows
    with one lexsort (the combiner — the token stream never leaves the
    worker un-aggregated), partials hash-partition on the token (a
    (group, token) pair never spans two partitions), each partition
    folds partials with one more lexsort + ``add.reduceat``, and
    per-group ranking reuses ``grouped_topk`` (no global sort). Ties on
    count break by token ascending, matching the DuckDB
    ``row_number() OVER (... ORDER BY cnt DESC, token)`` oracle."""
    from .relops import grouped_topk

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                by_col: pd.Series(dtype=object),
                "token": pd.Series(dtype=object),
                "cnt": pd.Series(dtype=np.int64),
                "__tpart": pd.Series(dtype=np.int32),
            }
        )
        texts = batch["text"].fillna("")
        tok_lists = texts.str.lower().str.split()
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = np.empty(total, dtype=object)
        pos = 0
        for ts in tok_lists:
            flat[pos : pos + len(ts)] = ts
            pos += len(ts)
        grp = np.repeat(batch[by_col].to_numpy(), lens)
        cg, ug = pd.factorize(grp)
        ct, ut = pd.factorize(flat)
        order = np.lexsort((ct, cg))
        sg, st = cg[order], ct[order]
        first = np.concatenate(([True], (sg[1:] != sg[:-1]) | (st[1:] != st[:-1])))
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, total))
        toks = ut[st[starts]]
        part = (
            pd.util.hash_array(toks).astype(np.uint64)
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return pd.DataFrame(
            {
                by_col: ug[sg[starts]],
                "token": toks,
                "cnt": cnt.astype(np.int64),
                "__tpart": part,
            }
        )

    def fold_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g.drop(columns=["__tpart"])
        cg, ug = pd.factorize(g[by_col].to_numpy())
        ct, ut = pd.factorize(g["token"].to_numpy())
        cnt = g["cnt"].to_numpy()
        order = np.lexsort((ct, cg))
        sg, st, sc = cg[order], ct[order], cnt[order]
        first = np.concatenate(([True], (sg[1:] != sg[:-1]) | (st[1:] != st[:-1])))
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(sc, starts)
        return pd.DataFrame(
            {
                by_col: ug[sg[starts]],
                "token": ut[st[starts]],
                "cnt": sums.astype(np.int64),
            }
        )

    counts = (
        docs_ds.map_batches(partial, batch_format="pandas")
        .groupby("__tpart")
        .map_groups(fold_partition, batch_format="pandas")
    )
    return grouped_topk(counts, by_col, "cnt", k=k, tie_col="token")


def fingerprint(docs_ds: "ray.data.Dataset", window: int = 8) -> "ray.data.Dataset":
    """Winnowing-style rolling-hash document fingerprint: min token-hash
    over each window, distinct mins mixed and xor-folded to one int64 per
    doc. Fully batch-vectorized (flat token-hash array + per-doc offsets
    + one sliding-window min + segmented xor-reduce — the
    ``SimHasher.batch_simhash`` pattern, no per-row Python). Empty /
    whitespace-only docs fingerprint to 0."""

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        tok_lists = texts.str.lower().str.split()
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        n = len(batch)
        out = np.zeros(n, dtype=np.int64)
        total = int(lens.sum())
        if total:
            flat = np.empty(total, dtype=object)
            pos = 0
            for ts in tok_lists:
                flat[pos : pos + len(ts)] = ts
                pos += len(ts)
            h = pd.util.hash_array(flat).astype(np.uint64)
            offs = np.concatenate(([0], np.cumsum(lens)))
            # per-doc rolling mins: docs shorter than the window use their
            # whole-doc min; longer docs slice the batch-wide window-min
            # array (windows never cross doc boundaries by construction)
            ne = np.flatnonzero(lens > 0)
            doc_min = np.minimum.reduceat(h, offs[ne])
            big = np.flatnonzero(lens > window)
            if len(big):
                wmin = np.lib.stride_tricks.sliding_window_view(
                    h, window
                ).min(axis=1)
                counts_b = lens[big] - window + 1
                mins = np.concatenate(
                    [
                        wmin[_window_starts(offs[big], counts_b)],
                        doc_min[lens[ne] <= window],
                    ]
                )
                docs = np.concatenate(
                    [np.repeat(big, counts_b), ne[lens[ne] <= window]]
                )
            else:
                mins, docs = doc_min, ne
            # distinct mins per doc, golden-ratio mix, xor fold — one
            # lexsort + reduceat instead of a per-doc loop
            order = np.lexsort((mins, docs))
            ms, ds_ = mins[order], docs[order]
            keep = np.concatenate(
                ([True], (ds_[1:] != ds_[:-1]) | (ms[1:] != ms[:-1]))
            )
            mu, du = ms[keep], ds_[keep]
            with np.errstate(over="ignore"):  # wrap-around is the hash
                mixed = mu * np.uint64(0x9E3779B97F4A7C15)
            firsts = np.flatnonzero(
                np.concatenate(([True], du[1:] != du[:-1]))
            )
            out[du[firsts]] = np.bitwise_xor.reduceat(mixed, firsts).astype(
                np.int64
            )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy().astype(np.int64),
                "fingerprint": out,
            }
        )

    return docs_ds.map_batches(fp, batch_format="pandas")


def repetition_stats(
    docs_ds: "ray.data.Dataset", pass_through: bool = False
) -> "ray.data.Dataset":
    """Gopher-style per-document repetition metrics — the quality filters
    a training-data pipeline cuts boilerplate/spam with (Rae et al. 2021,
    "Scaling Language Models", table A1 repetition filters):

    - ``dup_word_frac``: fraction of word occurrences that are repeats
      (``1 - distinct_words / words``),
    - ``top_word_frac``: occurrences of the most frequent word / words,
    - ``dup_2gram_frac``: fraction of adjacent word-bigram occurrences
      that are repeats (0 for single-word docs).

    Tokenization is DuckDB ``string_split(text, ' ')`` semantics (single
    space, empties kept) so the metrics are oracle-comparable. Fully
    batch-vectorized: flat token-hash array + per-doc offsets, ONE
    lexsort for per-(doc, word) counts, reduceat for distinct/max, and a
    shifted-pair mix for bigrams — no per-row Python. Embarrassingly
    parallel (no shuffle): each batch only touches its own docs.
    Bigram/word identity is 64-bit hash identity (collision probability
    ~ words²/2⁶⁴ per doc — negligible at any real document size)."""
    from .dedup import _splitmix64

    def rep(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        tok_lists = texts.str.split(" ")  # keeps empties, like DuckDB
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)  # >= 1 always
        n = len(batch)
        total = int(lens.sum())
        flat = np.empty(total, dtype=object)
        pos = 0
        for ts in tok_lists:
            flat[pos : pos + len(ts)] = ts
            pos += len(ts)
        h = pd.util.hash_array(flat).astype(np.uint64)
        offs = np.concatenate(([0], np.cumsum(lens)))
        docs = np.repeat(np.arange(n), lens)

        # per-(doc, word) occurrence counts: one lexsort + run-lengths
        order = np.lexsort((h, docs))
        hd, dd = h[order], docs[order]
        first = np.concatenate(
            ([True], (dd[1:] != dd[:-1]) | (hd[1:] != hd[:-1]))
        )
        starts = np.flatnonzero(first)
        cnts = np.diff(np.append(starts, total))
        dw = dd[starts]  # doc of each distinct (doc, word) run; sorted
        dstarts = np.flatnonzero(
            np.concatenate(([True], dw[1:] != dw[:-1]))
        )
        distinct = np.diff(np.append(dstarts, len(dw)))
        top = np.maximum.reduceat(cnts, dstarts)
        # every doc has >= 1 token, so dw[dstarts] == arange(n)
        dup_word = 1.0 - distinct / lens
        top_word = top / lens

        # adjacent bigrams: drop each doc's last token, mix shifted pairs
        keep = np.ones(total, dtype=bool)
        keep[offs[1:] - 1] = False
        idx = np.flatnonzero(keep)
        dup2 = np.zeros(n, dtype=np.float64)
        if len(idx):
            with np.errstate(over="ignore"):
                bh = _splitmix64(
                    h[idx] * np.uint64(0x9E3779B97F4A7C15) + h[idx + 1]
                )
            bdocs = docs[idx]
            border = np.lexsort((bh, bdocs))
            bh, bd = bh[border], bdocs[border]
            bfirst = np.concatenate(
                ([True], (bd[1:] != bd[:-1]) | (bh[1:] != bh[:-1]))
            )
            bstarts = np.flatnonzero(bfirst)
            bdw = bd[bstarts]
            bdstarts = np.flatnonzero(
                np.concatenate(([True], bdw[1:] != bdw[:-1]))
            )
            bdistinct = np.diff(np.append(bdstarts, len(bdw)))
            present = bdw[bdstarts]  # docs with >= 1 bigram
            dup2[present] = 1.0 - bdistinct / (lens[present] - 1)
        if pass_through:
            out = batch.copy()
            out["dup_word_frac"] = round_away(dup_word, 6)
            out["dup_2gram_frac"] = round_away(dup2, 6)
            return out
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy().astype(np.int64),
                "dup_word_frac": round_away(dup_word, 6),
                "top_word_frac": round_away(top_word, 6),
                "dup_2gram_frac": round_away(dup2, 6),
            }
        )

    return docs_ds.map_batches(rep, batch_format="pandas")


def redact(
    docs_ds: "ray.data.Dataset",
    pattern: str,
    replacement: str = "#",
    text_col: str = "text",
    out_col: str | None = None,
) -> "ray.data.Dataset":
    """Regex redaction — the PII-scrub / normalization pass of a
    training-data pipeline (mask numbers, emails, URLs before training).

    One zero-copy Arrow RE2 kernel per batch
    (``pc.replace_substring_regex``): no Python per row, no pandas
    conversion, and RE2 semantics match DuckDB's ``regexp_replace(...,
    'g')`` so the op is oracle-checkable byte-for-byte."""
    import pyarrow.compute as pc

    dst = out_col or text_col

    def red(t: pa.Table) -> pa.Table:
        scrubbed = pc.replace_substring_regex(
            t[text_col], pattern=pattern, replacement=replacement
        )
        if dst in t.column_names:
            return t.set_column(
                t.column_names.index(dst), dst, scrubbed
            )
        return t.append_column(dst, scrubbed)

    return docs_ds.map_batches(red, batch_format="pyarrow")


class _ProbeMatcher:
    """Actor-pool stage for ``decontaminate``: the probe list is fetched
    from the object store ONCE per actor (``ray.get`` in ``__init__``),
    compiled into escaped RE2 alternations (chunked to keep each program
    small), and each batch is flagged with one vectorized
    ``pc.match_substring_regex`` scan per chunk — O(chunks), not
    O(probes), passes over the text."""

    _CHUNK = 512  # probes per alternation; bounds the RE2 program size

    def __init__(self, probes_ref, text_col: str):
        import re

        import ray

        probes = (
            ray.get(probes_ref)
            if isinstance(probes_ref, ray.ObjectRef)
            else list(probes_ref)
        )
        probes = [p for p in probes if p]
        self.patterns = [
            "|".join(re.escape(p) for p in probes[i : i + self._CHUNK])
            for i in range(0, len(probes), self._CHUNK)
        ]
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = t[self.text_col]
        hit = np.zeros(len(t), dtype=bool)
        for pat in self.patterns:
            m = pc.fill_null(
                pc.match_substring_regex(txt, pattern=pat), False
            ).to_numpy(zero_copy_only=False)
            hit |= np.asarray(m, dtype=bool)
        return t.append_column(
            "contaminated", pa.array(hit.astype(np.int64), pa.int64())
        )


# per-worker-process LRU of compiled _ProbeMatchers, keyed by the probe
# list's object ref: the shared TASK pool amortizes pattern compilation
# exactly like an actor's __init__ (once per worker process) without
# paying an actor-pool spin-up per Dataset execution — and a task stage
# fuses with adjacent task stages, so the curation scan stays ONE task
# chain per block. Capped like search._STAGE_CACHE so long sessions
# scanning many different probe sets release their references.
_PROBE_CACHE: dict = {}
_PROBE_CACHE_CAP = 4


class _CachedProbeMatcher:
    def __init__(self, probes_ref, text_col: str):
        self.probes_ref = probes_ref
        self.text_col = text_col
        self.key = (probes_ref.hex(), text_col)

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _PROBE_CACHE.pop(self.key, None)
        if m is None:
            m = _ProbeMatcher(self.probes_ref, self.text_col)
            while len(_PROBE_CACHE) >= _PROBE_CACHE_CAP:
                _PROBE_CACHE.pop(next(iter(_PROBE_CACHE)))
        _PROBE_CACHE[self.key] = m  # re-insert = LRU touch
        return m(t)


def decontaminate(
    docs_ds: "ray.data.Dataset",
    probes: "list[str]",
    text_col: str = "text",
    concurrency=(1, 4),
    stage_mode: str = "task",
) -> "ray.data.Dataset":
    """Benchmark decontamination: flag every document whose text contains
    any probe string (the classic "drop training docs that quote the
    eval set" pass). Adds an int64 ``contaminated`` column (0/1).

    Scale shape: the probe list is an eval-suite extract — bounded and
    small by construction — so it is broadcast once (``ray.put``) and
    fetched once per worker; each worker compiles the escaped probes
    into RE2 alternation patterns chunked at 512 probes per pattern
    ONCE (task mode: per-process LRU keyed by the probe ref; actor
    mode: ``__init__``), and the corpus streams through in Arrow
    batches with one ``match_substring_regex`` scan per chunk
    (O(probes/512) vectorized kernels per batch, no per-row Python).

    ``stage_mode="task"`` (default) runs in the shared task pool — no
    actor spin-up per execution, and the stage fuses with adjacent task
    stages (pipelines/curation.py chains four per-doc kernels into one
    task per block). ``stage_mode="actor"`` keeps the actor-pool tier
    (``concurrency`` applies) for callers that want pinned workers. For
    probe sets beyond a few hundred thousand strings, swap the scan for
    an Aho-Corasick automaton built at the same setup point — the stage
    shape (broadcast + cached setup) stays identical."""
    import ray

    ref = ray.put(list(probes))
    if stage_mode == "task":
        return docs_ds.map_batches(
            _CachedProbeMatcher(ref, text_col), batch_format="pyarrow"
        )
    return docs_ds.map_batches(
        _ProbeMatcher,
        fn_constructor_kwargs={"probes_ref": ref, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _window_starts(
    offs_big: "np.ndarray", counts_b: "np.ndarray"
) -> "np.ndarray":
    """Flat-array start index of every per-doc sliding window: for docs
    whose flat token ranges begin at ``offs_big`` and contribute
    ``counts_b`` windows each, returns the ``counts_b.sum()`` window
    starts, never crossing a document boundary — the shift trick shared
    by fingerprinting, n-gram discovery/decontamination, gram hashing
    and PMI bigram assembly."""
    shift = np.repeat(
        offs_big - np.concatenate(([0], np.cumsum(counts_b)[:-1])),
        counts_b,
    )
    return shift + np.arange(int(counts_b.sum()))


def _doc_gram_rows(
    texts: "pd.Series", n: int
) -> "tuple[np.ndarray, np.ndarray]":
    """(doc_idx, gram) rows for every word ``n``-gram in a batch of
    texts: lowercase, whitespace-tokenize (``_tok_flat`` — the DuckDB
    ``string_split_regex(trim(lower(text)),'\\s+')`` semantics shared by
    the whole substring-dedup family), then positional string joins over
    the flat token array (the ``dup_ngrams`` window-start trick — no
    per-row Python, no document ever crosses a batch boundary)."""
    lens, offs, flat = _tok_flat(texts.str.lower())
    big = np.flatnonzero(lens >= n)
    if len(big) == 0:
        return np.empty(0, np.int64), np.empty(0, object)
    counts_b = lens[big] - n + 1
    starts = _window_starts(offs[big], counts_b)
    grams = flat[starts]
    for j in range(1, n):
        grams = grams + " "
        grams = grams + flat[starts + j]
    return np.repeat(big, counts_b), grams


# per-worker-process LRU of deserialized probe-gram arrays (object-dtype
# numpy arrays pickle on every ray.get, so the fetch is cached per
# worker exactly like the compiled patterns in _PROBE_CACHE)
_GRAMSET_CACHE: dict = {}
_GRAMSET_CACHE_CAP = 4


class _GramSetFlagger:
    """Task-pool stage: per-doc count of DISTINCT word n-grams shared
    with the broadcast probe-gram set; emits hit rows only."""

    def __init__(self, grams_ref, n: int, text_col: str, doc_col: str):
        self.grams_ref = grams_ref
        self.n = n
        self.text_col = text_col
        self.doc_col = doc_col

    def _probe(self) -> np.ndarray:
        import ray

        key = self.grams_ref.hex()
        g = _GRAMSET_CACHE.pop(key, None)
        if g is None:
            g = ray.get(self.grams_ref)
            while len(_GRAMSET_CACHE) >= _GRAMSET_CACHE_CAP:
                _GRAMSET_CACHE.pop(next(iter(_GRAMSET_CACHE)))
        _GRAMSET_CACHE[key] = g  # re-insert = LRU touch
        return g

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        probe = self._probe()
        empty = pd.DataFrame(
            {
                self.doc_col: pd.Series(dtype=np.int64),
                "n_hits": pd.Series(dtype=np.int64),
            }
        )
        if len(batch) == 0 or len(probe) == 0:
            return empty
        doc_idx, grams = _doc_gram_rows(
            batch[self.text_col].fillna(""), self.n
        )
        if len(grams) == 0:
            return empty
        # factorize once; membership tested on UNIQUE grams (searchsorted
        # against the sorted probe array: O(log P) per unique gram)
        codes, uniq = pd.factorize(grams)
        uniq = np.asarray(uniq, dtype=object)
        pos = np.searchsorted(probe, uniq)
        pos[pos == len(probe)] = 0
        is_hit = probe[pos] == uniq
        hit_rows = is_hit[codes]
        if not hit_rows.any():
            return empty
        d, c = doc_idx[hit_rows], codes[hit_rows]
        # distinct (doc, gram) pairs: a doc is one row, so within-batch
        # dedup IS per-doc dedup
        order = np.lexsort((c, d))
        sd, sc = d[order], c[order]
        keep = np.concatenate(
            ([True], (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1]))
        )
        kd = sd[keep]
        firsts = np.flatnonzero(
            np.concatenate(([True], kd[1:] != kd[:-1]))
        )
        n_hits = np.diff(np.append(firsts, len(kd)))
        ids = (
            batch[self.doc_col]
            .to_numpy()
            .astype(np.int64)[kd[firsts]]
        )
        return pd.DataFrame(
            {
                self.doc_col: ids,
                "n_hits": n_hits.astype(np.int64),
            }
        )


def ngram_decontaminate(
    train_ds: "ray.data.Dataset",
    probe_ds: "ray.data.Dataset",
    n: int = 5,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Word-n-gram overlap decontamination (the GPT-3 appendix-C /
    Llama eval-leakage standard): flag every training document sharing
    at least one word ``n``-gram with any probe (eval-suite) document,
    reporting the count of DISTINCT shared n-grams per document.

    Distinct from the two sibling operators: ``decontaminate`` matches
    probe strings as verbatim substrings (RE2 alternation scan), and
    ``dedup.source_overlap`` compares whole token SETS — this one is
    the fixed-length n-gram overlap used to catch paraphrased/partial
    quotations of eval items.

    Scale shape: the probe side is an eval suite — bounded and small by
    construction — so its distinct grams are folded driver-side (same
    collection pattern as ``decontaminate``'s probe list) and broadcast
    ONCE via ``ray.put`` as a sorted array; each worker fetches it once
    (per-process LRU) and the training corpus streams through in the
    shared task pool with zero shuffles: gram assembly is the
    flat-token-array positional join (``dup_ngrams``), membership is a
    vectorized ``searchsorted`` on unique grams (O(log P) each), and the
    per-doc distinct-hit count folds inside the batch because a document
    never crosses a row boundary. Output is hit rows only.
    """
    import ray

    def probe_partial(batch: pd.DataFrame) -> pd.DataFrame:
        _, grams = _doc_gram_rows(batch[text_col].fillna(""), n)
        return pd.DataFrame({"g": pd.unique(grams)})

    parts = probe_ds.select_columns([text_col]).map_batches(
        probe_partial, batch_format="pandas"
    )
    # eval-suite-sized by construction: collecting the DISTINCT probe
    # grams is the broadcast, not a corpus materialization
    pdf = parts.to_pandas()
    probe = (
        np.unique(pdf["g"].to_numpy())
        if "g" in pdf.columns
        else np.empty(0, object)
    )
    ref = ray.put(probe)
    return train_ds.select_columns([doc_col, text_col]).map_batches(
        _GramSetFlagger(ref, n, text_col, doc_col),
        batch_format="pandas",
    )


def chunk_manifest(
    docs_ds: "ray.data.Dataset",
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Sliding-window training-sequence chunk MANIFEST: for every doc,
    the (chunk_id, start_tok, end_tok, n_tokens) windows of ``window``
    tokens advancing by ``stride`` (overlap = window - stride), starting
    1-based at 1, 1+stride, ... up to ``greatest(n - window + stride,
    1)`` — so every token is covered, consecutive chunks overlap, and
    only the trailing chunk can be short. The long-document
    context-window prep pass (BERT/HF ``return_overflowing_tokens``
    shape), complementing ``pack_chunks`` (which concatenates docs
    instead of splitting them).

    Scale shape: emits boundary manifests, never materialized text
    copies — at 100 TB the chunk TEXT is cut lazily by whatever stage
    consumes the manifest (the ``substring_clean`` span-cut pattern),
    so this pass is pure per-batch integer arithmetic on token counts:
    zero shuffles, zero string building, output ~32 B/chunk.
    """
    if not (1 <= stride <= window):
        raise ValueError(
            "need 1 <= stride <= window: stride 0 would emit one chunk "
            "per doc (silent truncation) and stride > window leaves "
            "token-coverage gaps, breaking the every-token-covered "
            "contract"
        )
    _empty = {
        doc_col: np.int64,
        "chunk_id": np.int64,
        "start_tok": np.int64,
        "end_tok": np.int64,
        "n_tokens": np.int64,
    }

    def chunks(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in _empty.items()}
            )
        texts = batch[text_col].fillna("")
        # len(string_split_regex(trim(text), '\s+')) semantics: empty
        # doc -> one empty token (the text_stats / _tok_flat contract)
        lens = texts.str.strip().str.split().map(len).to_numpy(np.int64)
        n = np.maximum(lens, 1)
        last_start = np.maximum(n - window + stride, 1)
        n_chunks = (last_start - 1) // stride + 1
        doc_idx = np.repeat(np.arange(len(batch)), n_chunks)
        chunk_id = np.arange(int(n_chunks.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n_chunks)[:-1])), n_chunks
        )
        start = 1 + chunk_id * stride
        end = np.minimum(start + window - 1, n[doc_idx])
        return pd.DataFrame(
            {
                doc_col: batch[doc_col].to_numpy().astype(np.int64)[doc_idx],
                "chunk_id": chunk_id,
                "start_tok": start.astype(np.int64),
                "end_tok": end.astype(np.int64),
                "n_tokens": (end - start + 1).astype(np.int64),
            }
        )

    return docs_ds.select_columns([doc_col, text_col]).map_batches(
        chunks, batch_format="pandas"
    )


def tfidf_topk(
    docs_ds: "ray.data.Dataset",
    k: int = 3,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Top-``k`` TF-IDF terms per document — the corpus-weighted keyword
    extraction pass (tf * ln(N / df), SMART ltc-free raw-count variant).

    Scale shape (two corpus statistics, neither broadcast-unbounded):

    1. **TF is shuffle-free**: each document lives in one row, so the
       per-batch lexsort + ``reduceat`` combiner emits exact
       (doc, token, count) rows — the raw token stream never leaves the
       worker.
    2. **DF is a keyed fold**: TF rows are per-doc-unique, so document
       frequency is a row count per token — per-batch bincount partials
       hash-partition on the token and fold with one reduceat per
       partition (same shape as ``top_terms``).
    3. TF joins DF **co-partitioned on the token** (``relops.hash_join``
       — the DF table is corpus-vocabulary sized, so it is joined, not
       broadcast), the score is one vectorized multiply-log, and per-doc
       ranking reuses ``grouped_topk`` (no global sort, deterministic
       ``(score DESC, token ASC)`` ties).

    The TF dataset is materialized once because two downstream passes
    (DF fold + join) consume it — it is the collapsed (doc, token)
    table, far smaller than the corpus, and blocks spill to the object
    store rather than any node holding it whole."""
    import pyarrow.compute as pc

    from .relops import grouped_topk, hash_join

    n_docs = docs_ds.count()

    def tf_partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype=np.int64),
                "tok": pd.Series(dtype=object),
                "c": pd.Series(dtype=np.int64),
            }
        )
        texts = batch["text"].fillna("")
        tok_lists = texts.str.lower().str.split()
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = np.empty(total, dtype=object)
        pos = 0
        for ts in tok_lists:
            flat[pos : pos + len(ts)] = ts
            pos += len(ts)
        didx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        ct, ut = pd.factorize(flat)
        order = np.lexsort((ct, didx))
        sd, st = didx[order], ct[order]
        first = np.concatenate(
            ([True], (sd[1:] != sd[:-1]) | (st[1:] != st[:-1]))
        )
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, total))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64)[
                    sd[starts]
                ],
                "tok": ut[st[starts]],
                "c": cnt.astype(np.int64),
            }
        )

    tf = docs_ds.map_batches(tf_partial, batch_format="pandas").materialize()

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        ct, ut = pd.factorize(batch["tok"].to_numpy())
        cnt = np.bincount(ct).astype(np.int64)
        part = (
            pd.util.hash_array(ut.astype(object)).astype(np.uint64)
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return pd.DataFrame({"tok_r": ut, "d_p": cnt, "__dpart": part})

    def df_fold(g: pd.DataFrame) -> pd.DataFrame:
        ct, ut = pd.factorize(g["tok_r"].to_numpy())
        d = np.zeros(len(ut), dtype=np.int64)
        np.add.at(d, ct, g["d_p"].to_numpy())
        return pd.DataFrame({"tok_r": ut, "d": d})

    df_rows = (
        tf.map_batches(df_partial, batch_format="pandas")
        .groupby("__dpart")
        .map_groups(df_fold, batch_format="pandas")
    )

    joined = hash_join(
        tf, df_rows, "tok", "tok_r", num_partitions=num_partitions
    )

    def score(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = c * np.log(float(n_docs) / d)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "tok": t["tok"],
                "tfidf": pa.array(s, pa.float64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    top = grouped_topk(
        scored,
        key_col="doc_id",
        order_col="tfidf",
        k=k,
        descending=True,
        tie_col="tok",
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "tok": t["tok"],
                "tfidf": pa.array(
                    round_away(
                        t["tfidf"].to_numpy(zero_copy_only=False), 6
                    )
                ),
                "rank": pc.cast(t["rank"], pa.int64()),
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


def dup_ngrams(
    docs_ds: "ray.data.Dataset",
    n: int = 3,
    min_docs: int = 2,
    k: int = 100,
    num_partitions: int = 32,
) -> "pd.DataFrame":
    """Duplicate token n-grams across the corpus: the n-grams that occur
    in >= ``min_docs`` DISTINCT documents, top-``k`` by document
    frequency (ties break by ngram ascending) — the discovery pass of
    substring-level training-data dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better").

    Scale shape: a document is one row, so every one of its n-grams is
    seen by exactly one batch — each batch therefore dedupes its
    (doc, ngram) pairs EXACTLY and emits partial (ngram,
    distinct-doc-count) combiner rows; partials hash-partition on the
    ngram (one shuffle of pre-aggregated rows, never the token stream),
    each partition folds with one lexsort + ``add.reduceat`` and keeps
    only its local top-``k`` survivors (correct: an ngram lives in
    exactly one partition), and the driver merges <= partitions x k
    tiny rows. All token/ngram assembly is flat-array vectorized.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "ngram": pd.Series(dtype=object),
                "n_docs": pd.Series(dtype=np.int64),
                "__gpart": pd.Series(dtype=np.int32),
            }
        )
        texts = batch["text"].fillna("")
        tok_lists = texts.str.lower().str.split()
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = np.empty(total, dtype=object)
        pos = 0
        for ts in tok_lists:
            flat[pos : pos + len(ts)] = ts
            pos += len(ts)
        offs = np.concatenate(([0], np.cumsum(lens)))
        big = np.flatnonzero(lens >= n)
        if len(big) == 0:
            return empty
        counts_b = lens[big] - n + 1
        # window-start indices into the flat token array, never crossing
        # a document boundary (same shift trick as fingerprint())
        starts = _window_starts(offs[big], counts_b)
        grams = flat[starts]
        for j in range(1, n):
            grams = grams + " "
            grams = grams + flat[starts + j]
        docs = np.repeat(big, counts_b)
        cg, ug = pd.factorize(grams)
        # exact within-batch (doc, ngram) dedupe -> distinct-doc partials
        order = np.lexsort((docs, cg))
        sg, sd = cg[order], docs[order]
        keep = np.concatenate(
            ([True], (sg[1:] != sg[:-1]) | (sd[1:] != sd[:-1]))
        )
        kg = sg[keep]
        firsts = np.flatnonzero(
            np.concatenate(([True], kg[1:] != kg[:-1]))
        )
        cnt = np.diff(np.append(firsts, len(kg)))
        toks = ug[kg[firsts]]
        part = (
            pd.util.hash_array(toks).astype(np.uint64)
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return pd.DataFrame(
            {"ngram": toks, "n_docs": cnt.astype(np.int64), "__gpart": part}
        )

    def fold_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "ngram": pd.Series(dtype=object),
                "n_docs": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        cg, ug = pd.factorize(g["ngram"].to_numpy())
        cnt = g["n_docs"].to_numpy()
        order = np.argsort(cg, kind="stable")
        sg, sc = cg[order], cnt[order]
        firsts = np.flatnonzero(
            np.concatenate(([True], sg[1:] != sg[:-1]))
        )
        sums = np.add.reduceat(sc, firsts)
        hot = sums >= min_docs
        if not hot.any():
            return empty
        out = pd.DataFrame(
            {
                "ngram": ug[sg[firsts[hot]]],
                "n_docs": sums[hot].astype(np.int64),
            }
        )
        # local top-k is safe: an ngram never spans two partitions
        out = out.sort_values(
            ["n_docs", "ngram"], ascending=[False, True]
        ).head(k)
        return out.reset_index(drop=True)

    survivors = (
        docs_ds.select_columns(["text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("__gpart")
        .map_groups(fold_partition, batch_format="pandas")
        .to_pandas()  # <= num_partitions * k rows
    )
    return (
        survivors.sort_values(["n_docs", "ngram"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


_GRAM_KEY2 = "fedcba9876543210"  # second independent siphash key
_GRAM_C1 = 0x9E3779B97F4A7C15  # odd multipliers for the positional
_GRAM_C2 = 0xC2B2AE3D27D4EB4F  # polynomial gram combine (mod 2^64)


def _tok_flat(texts: "pd.Series") -> "tuple[np.ndarray, ...]":
    """Whitespace-tokenize a batch (trim + \\s+ split, the exact DuckDB
    ``string_split_regex(trim(text),'\\s+')`` semantics) and return
    ``(lens, offs, flat)``: per-doc token counts, flat-array doc offsets
    and the flat token array — the shared tokenizer of the substring-
    dedup discovery, marking and removal passes (they must agree
    byte-for-byte on token boundaries)."""
    tok_lists = texts.fillna("").map(lambda s: _WS.split(s.strip()))
    lens = tok_lists.map(len).to_numpy(dtype=np.int64)
    total = int(lens.sum())
    flat = np.empty(total, dtype=object)
    pos = 0
    for ts in tok_lists:
        flat[pos : pos + len(ts)] = ts
        pos += len(ts)
    offs = np.concatenate(([0], np.cumsum(lens)))
    return lens, offs, flat


def _gram_hashes(
    texts: "pd.Series", L: int
) -> "tuple[np.ndarray, ...]":
    """Tokenize via ``_tok_flat`` and return
    ``(lens, offs, starts, G1, G2, flat)``: per-doc token counts,
    flat-array doc offsets, the flat start index of every L-gram (never
    crossing a doc boundary), two independent 64-bit gram hashes — each
    a positional polynomial over an independently-keyed siphash of the
    tokens, so gram equality is effectively 128-bit exact without ever
    materializing gram strings — and the flat token array itself."""
    lens, offs, flat = _tok_flat(texts)
    h1 = pd.util.hash_array(flat).astype(np.uint64)
    h2 = pd.util.hash_array(flat, hash_key=_GRAM_KEY2).astype(np.uint64)
    big = np.flatnonzero(lens >= L)
    if len(big) == 0:
        z = np.empty(0, dtype=np.uint64)
        return lens, offs, np.empty(0, dtype=np.int64), z, z, flat
    counts_b = lens[big] - L + 1
    tot_b = int(counts_b.sum())
    starts = _window_starts(offs[big], counts_b)
    G1 = np.zeros(tot_b, dtype=np.uint64)
    G2 = np.zeros(tot_b, dtype=np.uint64)
    c1 = np.uint64(1)
    c2 = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(L):
            G1 += h1[starts + j] * c1
            G2 += h2[starts + j] * c2
            c1 *= np.uint64(_GRAM_C1)
            c2 *= np.uint64(_GRAM_C2)
    return lens, offs, starts, G1, G2, flat


def dup_span_stats(
    docs_ds: "ray.data.Dataset",
    L: int = 8,
    num_partitions: int = 32,
    return_text: bool = False,
    transport: str = "broadcast",
) -> "ray.data.Dataset":
    """Removal pass of exact-substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better" — dup_ngrams() is the
    matching discovery pass): per document, how many token positions sit
    inside a cross-document duplicated run of >= ``L`` tokens, keeping
    the copy in the lowest doc_id.

    Semantics (partition-invariant, SQL-expressible): an L-gram is
    duplicated iff it occurs in >= 2 distinct docs; its keeper is the
    minimum doc_id containing it; token position p of doc d is
    dup-covered iff some duplicated L-gram of d with d != keeper starts
    at i <= p < i+L. Output per doc: (doc_id, n_tokens, dup_tokens,
    n_spans, dup_frac) where n_spans counts maximal covered runs —
    filter/trim on dup_frac downstream. With ``return_text=True`` a
    ``clean_text`` column is added: the surviving tokens re-joined with
    single spaces (covered spans cut out).

    Scale shape: pass 1 is the dup_ngrams() combiner shape — per-batch
    exact (gram, doc)-dedup partials, ONE hash shuffle of pre-aggregated
    (gram_h, n_docs, min_doc) rows (16-byte gram hashes, never token
    streams or gram strings). With ``transport="broadcast"`` (default)
    the surviving duplicated-gram table goes to the object store once
    (``ray.put``, zero-copy searchsorted probe per batch — the
    decontaminate() transport) and pass 2 is embarrassingly parallel:
    interval coverage via a +-1 delta cumsum and span counting via
    run-start detection, all flat-array vectorized.
    ``transport="join"`` is the corpus-scale tier for when the dup
    table itself outgrows a node: gram occurrences shuffle-join the dup
    table on the 128-bit gram hash, the surviving (doc, start) hit rows
    (bounded by actual duplication) groupby doc for an interval-union
    fold, and one left join attaches them back to per-doc token counts
    — no worker ever holds the dup table. Identical output
    (test-pinned). With ``return_text=True`` the join tier folds the
    hit rows into per-doc merged span lists (tiny, bounded by actual
    duplication) and LEFT-joins them onto the docs table so each
    partition cuts its own documents' spans — the corpus text pays ONE
    hash shuffle, which is inherent to a removal pass that must rewrite
    every document when no node can hold the dup-gram table.
    """
    import ray

    if transport not in ("broadcast", "join"):
        raise ValueError(
            f"transport must be 'broadcast' or 'join', got {transport!r}"
        )

    def discovery(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "g1": pd.Series(dtype=np.uint64),
                "g2": pd.Series(dtype=np.uint64),
                "n_docs": pd.Series(dtype=np.int64),
                "min_doc": pd.Series(dtype=np.int64),
                "__gpart": pd.Series(dtype=np.int32),
            }
        )
        lens, offs, starts, G1, G2, _ = _gram_hashes(batch["text"], L)
        if len(starts) == 0:
            return empty
        doc_ids = batch["doc_id"].to_numpy(dtype=np.int64)
        docs = doc_ids[np.searchsorted(offs, starts, "right") - 1]
        # exact within-batch (gram, doc) dedupe; docs never repeat across
        # batches (one row per doc), so distinct-doc counts sum exactly
        order = np.lexsort((docs, G2, G1))
        s1, s2, sd = G1[order], G2[order], docs[order]
        keep = np.concatenate(
            ([True], (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
             | (sd[1:] != sd[:-1]))
        )
        k1, k2, kd = s1[keep], s2[keep], sd[keep]
        firsts = np.flatnonzero(
            np.concatenate(([True], (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])))
        )
        cnt = np.diff(np.append(firsts, len(k1)))
        return pd.DataFrame(
            {
                "g1": k1[firsts],
                "g2": k2[firsts],
                "n_docs": cnt.astype(np.int64),
                "min_doc": np.minimum.reduceat(kd, firsts),
                "__gpart": (
                    k1[firsts] % np.uint64(num_partitions)
                ).astype(np.int32),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "g1": pd.Series(dtype=np.uint64),
                "g2": pd.Series(dtype=np.uint64),
                "keeper": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        a1 = g["g1"].to_numpy()
        a2 = g["g2"].to_numpy()
        order = np.lexsort((a2, a1))
        s1, s2 = a1[order], a2[order]
        sn = g["n_docs"].to_numpy()[order]
        sm = g["min_doc"].to_numpy()[order]
        firsts = np.flatnonzero(
            np.concatenate(([True], (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])))
        )
        n_docs = np.add.reduceat(sn, firsts)
        dup = n_docs >= 2
        return pd.DataFrame(
            {
                "g1": s1[firsts[dup]],
                "g2": s2[firsts[dup]],
                "keeper": np.minimum.reduceat(sm, firsts)[dup],
            }
        )

    dup_ds = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(discovery, batch_format="pandas")
        .groupby("__gpart")
        .map_groups(fold, batch_format="pandas")
    )

    if transport == "join":
        return _dup_span_stats_join(
            docs_ds, dup_ds, L, num_partitions, return_text=return_text
        )

    dup_tbl = dup_ds.to_pandas()  # duplicated grams only — small by nature
    if "g1" not in dup_tbl.columns:  # clean corpus: zero dup grams and
        # the grouped fold emitted no blocks, so the schema is unknown
        dup_tbl = pd.DataFrame(
            {
                "g1": pd.Series(dtype=np.uint64),
                "g2": pd.Series(dtype=np.uint64),
                "keeper": pd.Series(dtype=np.int64),
            }
        )
    d1 = dup_tbl["g1"].to_numpy(dtype=np.uint64)
    d2 = dup_tbl["g2"].to_numpy(dtype=np.uint64)
    dk = dup_tbl["keeper"].to_numpy(dtype=np.int64)
    order = np.lexsort((d2, d1))
    dup_ref = ray.put((d1[order], d2[order], dk[order]))

    def mark(batch: pd.DataFrame) -> pd.DataFrame:
        lens, offs, starts, G1, G2, flat = _gram_hashes(batch["text"], L)
        doc_ids = batch["doc_id"].to_numpy(dtype=np.int64)
        total = int(offs[-1])
        n_rows = len(batch)
        dup_tokens = np.zeros(n_rows, dtype=np.int64)
        n_spans = np.zeros(n_rows, dtype=np.int64)
        covered = np.zeros(total, dtype=bool)
        if len(starts):
            D1, D2, DK = ray.get(dup_ref)  # zero-copy object-store read
            row = np.searchsorted(offs, starts, "right") - 1
            docs = doc_ids[row]
            lo = np.searchsorted(D1, G1, "left")
            hi = np.searchsorted(D1, G1, "right")
            hit = np.zeros(len(starts), dtype=bool)
            keeper = np.zeros(len(starts), dtype=np.int64)
            one = hi - lo == 1
            i1 = lo[one]
            m = D2[i1] == G2[one]
            hit[one] = m
            kp = np.zeros(len(i1), dtype=np.int64)
            kp[m] = DK[i1[m]]
            keeper[one] = kp
            for q in np.flatnonzero(hi - lo > 1):  # h1 collisions: rare
                sl = slice(lo[q], hi[q])
                eq = np.flatnonzero(D2[sl] == G2[q])
                if len(eq):
                    hit[q] = True
                    keeper[q] = DK[lo[q] + eq[0]]
            sel = hit & (docs != keeper)
            if sel.any():
                delta = np.zeros(total + 1, dtype=np.int64)
                np.add.at(delta, starts[sel], 1)
                np.add.at(delta, starts[sel] + L, -1)
                covered = np.cumsum(delta[:-1]) > 0
                dup_tokens = np.add.reduceat(
                    covered.astype(np.int64), offs[:-1]
                ) * (lens > 0)
                prev = np.concatenate(([False], covered[:-1]))
                prev[offs[:-1][offs[:-1] < total]] = False  # doc resets
                run_start = covered & ~prev
                pos_row = (
                    np.searchsorted(
                        offs, np.flatnonzero(run_start), "right"
                    ) - 1
                )
                n_spans = np.bincount(
                    pos_row, minlength=n_rows
                ).astype(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": doc_ids,
                "n_tokens": lens,
                "dup_tokens": dup_tokens,
                "n_spans": n_spans,
                "dup_frac": dup_tokens / np.maximum(lens, 1),
            }
        )
        if return_text:
            # re-join the surviving tokens with single spaces (original
            # inter-token whitespace is not preserved — the tokenizer
            # already collapsed it); a fully-covered doc becomes ""
            keep_pos = np.flatnonzero(~covered)
            keep_row = np.searchsorted(offs, keep_pos, "right") - 1
            clean = np.full(n_rows, "", dtype=object)
            if len(keep_pos):
                joined = (
                    pd.Series(flat[keep_pos])
                    .groupby(keep_row)
                    .agg(" ".join)
                )
                clean[joined.index.to_numpy()] = joined.to_numpy()
            out["clean_text"] = clean
        return out

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        mark, batch_format="pandas"
    )


def _dup_span_stats_join(
    docs_ds: "ray.data.Dataset",
    dup_ds: "ray.data.Dataset",
    L: int,
    num_partitions: int,
    return_text: bool = False,
) -> "ray.data.Dataset":
    """Corpus-scale tier of dup_span_stats: the duplicated-gram table
    stays distributed. Gram occurrences (g-hash, doc, start) shuffle-join
    it on the 128-bit gram hash; surviving non-keeper hits (bounded by
    actual duplication) union with sentinel per-doc token-count rows and
    fold per doc with an interval union (all L-long, starts sorted ->
    runs break where the gap exceeds L) — the sentinel rows mean every
    doc reaches the fold without an outer join. Join keys are the uint64
    hashes bit-cast to int64 (Arrow hash-join key dtype).

    ``return_text=True`` (the Lee-et-al removal pass) folds the hit rows
    into per-doc merged spans packed as int64 (start, end) pairs in one
    binary blob, LEFT-joins the span table onto (doc_id, text) — the
    span side is bounded by actual duplication; the text side pays the
    ONE corpus hash shuffle a distributed rewrite inherently needs —
    and each partition re-tokenizes its own docs and cuts the covered
    spans, byte-identical to the broadcast tier's ``clean_text``."""
    import ray

    # a hash join spawns num_partitions aggregator actors; oversubscribing
    # a small CPU budget deadlocks the streaming executor (same sizing as
    # connected_components / ngram_jaccard_pairs)
    cpus = (
        int(ray.cluster_resources().get("CPU", 8))
        if ray.is_initialized()
        else 8
    )
    num_partitions = max(2, min(num_partitions, cpus // 2))

    def occurrences(batch: pd.DataFrame) -> pd.DataFrame:
        lens, offs, starts, G1, G2, _ = _gram_hashes(batch["text"], L)
        doc_ids = batch["doc_id"].to_numpy(dtype=np.int64)
        row = np.searchsorted(offs, starts, "right") - 1
        return pd.DataFrame(
            {
                "g1": G1.view(np.int64),
                "g2": G2.view(np.int64),
                "doc_id": doc_ids[row] if len(starts) else
                    np.empty(0, dtype=np.int64),
                "i": (starts - offs[row]).astype(np.int64) if len(starts)
                    else np.empty(0, dtype=np.int64),
            }
        )

    def cast_dup(df: pd.DataFrame) -> pd.DataFrame:
        if "g1" not in df.columns:  # clean corpus: schema-less empty block
            df = pd.DataFrame(
                {
                    "g1": pd.Series(dtype=np.uint64),
                    "g2": pd.Series(dtype=np.uint64),
                    "keeper": pd.Series(dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "g1": df["g1"].to_numpy(dtype=np.uint64).view(np.int64),
                "g2": df["g2"].to_numpy(dtype=np.uint64).view(np.int64),
                "keeper": df["keeper"].to_numpy(dtype=np.int64),
            }
        )

    # materialize the dup table (it is the bounded small side — the
    # broadcast tier pulls the very same rows to the driver); a clean
    # corpus yields ZERO rows, in which case the join's right side would
    # have no schema at all — short-circuit to all-zero stats instead
    dup_mat = dup_ds.materialize()
    if dup_mat.count() == 0:
        def zeros(batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch["text"].fillna("").map(
                lambda s: _WS.split(s.strip())
            )
            n = toks.map(len).to_numpy(dtype=np.int64)
            z = np.zeros(len(batch), dtype=np.int64)
            out = pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                    "n_tokens": n,
                    "dup_tokens": z,
                    "n_spans": z,
                    "dup_frac": np.zeros(len(batch), dtype=np.float64),
                }
            )
            if return_text:
                # nothing covered: clean_text = tokens re-joined with
                # single spaces (the broadcast tier's normalization)
                out["clean_text"] = toks.map(" ".join).to_numpy(
                    dtype=object
                )
            return out

        return docs_ds.select_columns(["doc_id", "text"]).map_batches(
            zeros, batch_format="pandas"
        )

    dup_cast = dup_mat.map_batches(cast_dup, batch_format="pandas")
    hits = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(occurrences, batch_format="pandas")
        .join(
            dup_cast,
            join_type="inner",
            num_partitions=num_partitions,
            on=("g1", "g2"),
        )
        .map_batches(
            lambda df: df.loc[
                df["doc_id"].to_numpy() != df["keeper"].to_numpy(),
                ["doc_id", "i"],
            ].assign(n_tokens=np.int64(0)),
            batch_format="pandas",
        )
    )

    if return_text:
        return _dup_span_removal_join(docs_ds, hits, L, num_partitions)

    def base(batch: pd.DataFrame) -> pd.DataFrame:
        # sentinel i=-1 rows carry the token count; they also guarantee
        # every doc reaches the doc-keyed fold (no outer join needed)
        toks = batch["text"].fillna("").map(
            lambda s: len(_WS.split(s.strip()))
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "i": np.full(len(batch), -1, dtype=np.int64),
                "n_tokens": toks.to_numpy(dtype=np.int64),
            }
        )

    base_ds = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        base, batch_format="pandas"
    )

    def fold_doc(g: pd.DataFrame) -> pd.DataFrame:
        iv = g["i"].to_numpy(dtype=np.int64)
        n = int(g["n_tokens"].to_numpy().max())
        s = np.unique(iv[iv >= 0])
        if len(s):
            brk = np.flatnonzero(s[1:] > s[:-1] + L)
            first = np.concatenate(([0], brk + 1))
            last = np.concatenate((brk, [len(s) - 1]))
            dup_tokens = int((s[last] + L - s[first]).sum())
            n_spans = len(first)
        else:
            dup_tokens = 0
            n_spans = 0
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(dtype=np.int64)[:1],
                "n_tokens": np.array([n], dtype=np.int64),
                "dup_tokens": np.array([dup_tokens], dtype=np.int64),
                "n_spans": np.array([n_spans], dtype=np.int64),
                "dup_frac": np.array(
                    [dup_tokens / max(n, 1)], dtype=np.float64
                ),
            }
        )

    return (
        base_ds.union(hits.select_columns(["doc_id", "i", "n_tokens"]))
        .groupby("doc_id")
        .map_groups(fold_doc, batch_format="pandas")
    )


def _dup_span_removal_join(
    docs_ds: "ray.data.Dataset",
    hits: "ray.data.Dataset",
    L: int,
    num_partitions: int,
) -> "ray.data.Dataset":
    """Join-tier removal pass: fold the (doc_id, i) hit rows into per-doc
    merged covered spans (int64 (start, end-exclusive) pairs packed in
    one binary blob — bounded by actual duplication), LEFT-join them
    onto the docs table, and cut the spans partition-locally. The dup
    table and the span table never reside on one node; the corpus text
    moves through exactly ONE hash shuffle (inherent: the rewrite must
    co-locate each doc with its spans). Output is byte-identical to the
    broadcast tier (same tokenizer, same coverage algebra)."""

    def fold_spans(g: pd.DataFrame) -> pd.DataFrame:
        # merge all-L-long intervals: unique sorted starts; runs break
        # where the start gap exceeds L (same algebra as fold_doc)
        iv = np.unique(g["i"].to_numpy(dtype=np.int64))
        brk = np.flatnonzero(iv[1:] > iv[:-1] + L)
        first = np.concatenate(([0], brk + 1))
        last = np.concatenate((brk, [len(iv) - 1]))
        pairs = np.stack([iv[first], iv[last] + L], axis=1)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(dtype=np.int64)[:1],
                "spans": [pairs.astype(np.int64).tobytes()],
            }
        )

    import pyarrow.compute as pc

    def cast_spans(t: pa.Table) -> pa.Table:
        # pin an explicit Arrow schema: the hash join rejects right-side
        # blocks whose schema is unknown/empty (same hazard as cast_dup)
        if "doc_id" not in t.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "spans": pa.array([], pa.binary()),
                }
            )
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "spans": pc.cast(t["spans"], pa.binary()),
            }
        )

    spans_tbl = (
        hits.select_columns(["doc_id", "i"])
        .groupby("doc_id")
        .map_groups(fold_spans, batch_format="pandas")
        .map_batches(cast_spans, batch_format="pyarrow")
        # materialize (blocks stay in the spillable object store, never
        # the driver) so the row count is known for the repartition below
        .materialize()
    )
    # Ray 2.49 hash-join hazard: the shuffle broadcasts an input's schema
    # via the FIRST block's empty shards, but an empty first block
    # short-circuits before dissemination (hash_shuffle.py:223,548) — an
    # aggregator partition that then receives no span rows builds a
    # schema-less table and pa.Table.join raises "No match ... on right
    # side". The span table is grouped per doc, so blocks CAN be empty;
    # an even repartition to <= row-count blocks guarantees every block
    # is non-empty. (test_dup_span_stats_join_return_text_parity pins
    # the sparse case.)
    n_span_docs = spans_tbl.count()
    spans_tbl = spans_tbl.repartition(max(1, min(num_partitions, n_span_docs)))
    joined = docs_ds.select_columns(["doc_id", "text"]).join(
        spans_tbl,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        lens, offs, flat = _tok_flat(batch["text"])
        doc_ids = batch["doc_id"].to_numpy(dtype=np.int64)
        n_rows = len(batch)
        total = int(offs[-1])
        dup_tokens = np.zeros(n_rows, dtype=np.int64)
        n_spans = np.zeros(n_rows, dtype=np.int64)
        covered = np.zeros(total, dtype=bool)
        sp = batch["spans"].to_numpy()
        # left-join nulls surface as None (or NaN, pandas-version-
        # dependent) — accept only real byte payloads
        have = np.flatnonzero(
            [isinstance(s, (bytes, bytearray)) and len(s) > 0 for s in sp]
        )
        if len(have):
            pair_list = [
                np.frombuffer(sp[r], dtype=np.int64).reshape(-1, 2)
                for r in have
            ]
            counts = np.array([len(p) for p in pair_list], dtype=np.int64)
            allp = np.concatenate(pair_list)
            rows = np.repeat(have, counts)
            delta = np.zeros(total + 1, dtype=np.int64)
            np.add.at(delta, allp[:, 0] + offs[rows], 1)
            np.add.at(delta, allp[:, 1] + offs[rows], -1)
            covered = np.cumsum(delta[:-1]) > 0
            dup_tokens = np.add.reduceat(
                covered.astype(np.int64), offs[:-1]
            ) * (lens > 0)
            n_spans[have] = counts
        out = pd.DataFrame(
            {
                "doc_id": doc_ids,
                "n_tokens": lens,
                "dup_tokens": dup_tokens,
                "n_spans": n_spans,
                "dup_frac": dup_tokens / np.maximum(lens, 1),
            }
        )
        # identical clean_text construction to the broadcast tier's mark()
        keep_pos = np.flatnonzero(~covered)
        keep_row = np.searchsorted(offs, keep_pos, "right") - 1
        clean = np.full(n_rows, "", dtype=object)
        if len(keep_pos):
            joined_txt = (
                pd.Series(flat[keep_pos]).groupby(keep_row).agg(" ".join)
            )
            clean[joined_txt.index.to_numpy()] = joined_txt.to_numpy()
        out["clean_text"] = clean
        return out

    return joined.map_batches(finalize, batch_format="pandas")


def pmi_bigrams(
    docs_ds: "ray.data.Dataset",
    min_count: int = 5,
    k: int = 50,
    num_partitions: int = 32,
) -> "pd.DataFrame":
    """Pointwise-mutual-information collocations: the top-``k`` adjacent
    token bigrams by PMI = ln((n_ab/B) / ((n_a/T)(n_b/T))) with
    occurrence count >= ``min_count`` (ties by bigram ascending) — the
    phrase-mining pass of a corpus-analysis pipeline.

    Scale shape: each batch emits pre-aggregated unigram and bigram
    count partials (the token stream never leaves the worker
    un-aggregated); unigram partials fold once (token-hash partition);
    bigram partials fold on the packed bigram hash, filter to
    >= min_count survivors, and pick up n_a / n_b via two hash joins of
    already-tiny aggregated tables — the corpus totals T and B are two
    scalar tree-reduces. Each partition keeps only its local top-``k``
    (safe: final ranking merges <= partitions x k survivor rows
    driver-side).
    """
    from .relops import hash_join

    def partial_uni(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        tok_lists = texts.str.lower().str.split()
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return pd.DataFrame(
                {"tok": pd.Series(dtype=object),
                 "n_tok": pd.Series(dtype=np.int64)}
            )
        flat = np.empty(total, dtype=object)
        pos = 0
        for ts in tok_lists:
            flat[pos : pos + len(ts)] = ts
            pos += len(ts)
        ut, cnt = np.unique(flat, return_counts=True)
        return pd.DataFrame({"tok": ut, "n_tok": cnt.astype(np.int64)})

    def partial_big(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series(dtype=object), "b": pd.Series(dtype=object),
             "n_ab": pd.Series(dtype=np.int64)}
        )
        texts = batch["text"].fillna("")
        tok_lists = texts.str.lower().str.split()
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = np.empty(total, dtype=object)
        pos = 0
        for ts in tok_lists:
            flat[pos : pos + len(ts)] = ts
            pos += len(ts)
        offs = np.concatenate(([0], np.cumsum(lens)))
        big = np.flatnonzero(lens >= 2)
        if len(big) == 0:
            return empty
        counts_b = lens[big] - 1
        starts = _window_starts(offs[big], counts_b)
        a, b = flat[starts], flat[starts + 1]
        pair = a + "\x1f"
        pair = pair + b
        up, cnt = np.unique(pair, return_counts=True)
        parts = pd.Series(up).str.split("\x1f")
        return pd.DataFrame(
            {
                "a": parts.str[0].to_numpy(dtype=object),
                "b": parts.str[1].to_numpy(dtype=object),
                "n_ab": cnt.astype(np.int64),
            }
        )

    texts = docs_ds.select_columns(["text"])
    uni_part = texts.map_batches(partial_uni, batch_format="pandas")
    big_part = texts.map_batches(partial_big, batch_format="pandas")

    from ray.data.aggregate import Sum

    T = uni_part.aggregate(Sum("n_tok", alias_name="s"))["s"]
    B = big_part.aggregate(Sum("n_ab", alias_name="s"))["s"]

    def fold(key_cols):
        def add_part(g: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_array(g[key_cols[0]].to_numpy(dtype=object))
            for c in key_cols[1:]:
                h = h ^ pd.util.hash_array(g[c].to_numpy(dtype=object))
            g = g.copy()
            g["__part"] = (
                h.astype(np.uint64) % np.uint64(num_partitions)
            ).astype(np.int32)
            return g

        def fold_partition(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop(columns=["__part"])
            if len(g) == 0:
                return g
            val = [c for c in g.columns if c not in key_cols][0]
            return (
                g.groupby(key_cols, as_index=False, sort=False)[val]
                .sum()
            )

        return add_part, fold_partition

    ap_u, fp_u = fold(["tok"])
    uni = (
        uni_part.map_batches(ap_u, batch_format="pandas")
        .groupby("__part")
        .map_groups(fp_u, batch_format="pandas")
    )
    ap_b, fp_b = fold(["a", "b"])
    bigr = (
        big_part.map_batches(ap_b, batch_format="pandas")
        .groupby("__part")
        .map_groups(fp_b, batch_format="pandas")
        .filter(lambda r: r["n_ab"] >= min_count)
    )

    uni_a = uni.map_batches(
        lambda df: df.rename(columns={"tok": "ua", "n_tok": "n_a"}),
        batch_format="pandas",
    )
    uni_b = uni.map_batches(
        lambda df: df.rename(columns={"tok": "ub", "n_tok": "n_b"}),
        batch_format="pandas",
    )
    joined = hash_join(
        hash_join(bigr, uni_a, "a", "ua", num_partitions=8),
        uni_b, "b", "ub", num_partitions=8,
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"bigram": pd.Series(dtype=object),
                 "n_ab": pd.Series(dtype=np.int64),
                 "pmi": pd.Series(dtype=np.float64)}
            )
        pmi = np.log(
            (df["n_ab"].to_numpy() / B)
            / (
                (df["n_a"].to_numpy() / T)
                * (df["n_b"].to_numpy() / T)
            )
        )
        out = pd.DataFrame(
            {
                "bigram": df["a"].to_numpy(dtype=object)
                + " "
                + df["b"].to_numpy(dtype=object),
                "n_ab": df["n_ab"].to_numpy(),
                # rank on the ROUNDED pmi so the k-boundary can't flip on
                # a last-ulp libm difference vs the SQL oracle's ln()
                "pmi": round_away(pmi, 6),
            }
        )
        # local top-k; global merge happens driver-side over <= P*k rows
        return (
            out.sort_values(["pmi", "bigram"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )

    survivors = joined.map_batches(score, batch_format="pandas").to_pandas()
    return (
        survivors.sort_values(["pmi", "bigram"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def lm_score(
    docs_ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-document mean unigram log-likelihood ``avg(ln(n_tok / T))`` —
    the statistical LM quality score (low = rare-token-heavy docs:
    gibberish, boilerplate codes, OCR noise). Output: (id_col, n_tokens,
    lm_score) for docs with >= 1 token.

    Scale shape (two combiner-sized shuffles, the raw token stream never
    moves): (1) corpus token counts fold on token-hash partitions (the
    ``top_terms`` shape) and the corpus total T is a scalar tree-reduce;
    (2) per-doc (doc, tok, k) combiner partials co-partition WITH the
    count table on the token hash (tagged union), each partition turns
    its docs' tokens into partial (doc, sum k*ln(n), sum k) rows via one
    merge + segmented reduce, and a final doc-hash partition folds
    per-doc partials. No vocabulary broadcast — the count table can be
    corpus-sized.
    """

    def tok_partials(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc": pd.Series(dtype=np.int64),
                "tok": pd.Series(dtype=object),
                "k": pd.Series(dtype=np.int64),
                "__side": pd.Series(dtype=np.int8),
                "__part": pd.Series(dtype=np.int32),
            }
        )
        texts = batch[text_col].fillna("")
        tok_lists = texts.str.lower().str.split()
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = np.empty(total, dtype=object)
        pos = 0
        for ts in tok_lists:
            flat[pos : pos + len(ts)] = ts
            pos += len(ts)
        docs = np.repeat(batch[id_col].to_numpy(dtype=np.int64), lens)
        ct, ut = pd.factorize(flat)
        order = np.lexsort((ct, docs))
        sd, st = docs[order], ct[order]
        first = np.concatenate(
            ([True], (sd[1:] != sd[:-1]) | (st[1:] != st[:-1]))
        )
        starts = np.flatnonzero(first)
        k = np.diff(np.append(starts, total))
        toks = ut[st[starts]]
        part = (
            pd.util.hash_array(toks).astype(np.uint64)
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return pd.DataFrame(
            {
                "doc": sd[starts],
                "tok": toks,
                "k": k.astype(np.int64),
                "__side": np.zeros(len(toks), dtype=np.int8),
                "__part": part,
            }
        )

    doc_tok = docs_ds.select_columns([id_col, text_col]).map_batches(
        tok_partials, batch_format="pandas"
    )

    # corpus counts: fold the same partials (side 0 rows ARE per-batch
    # (doc, tok) counts; summing k over tok gives exact corpus counts)
    def count_fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"tok": pd.Series(dtype=object),
                 "n": pd.Series(dtype=np.int64)}
            )
        return (
            g.groupby("tok", as_index=False, sort=False)["k"]
            .sum()
            .rename(columns={"k": "n"})
        )

    counts = (
        doc_tok.groupby("__part")
        .map_groups(count_fold, batch_format="pandas")
    )
    from ray.data.aggregate import Sum

    T = float(counts.aggregate(Sum("n", alias_name="s"))["s"])

    def tag_counts(df: pd.DataFrame) -> pd.DataFrame:
        part = (
            pd.util.hash_array(df["tok"].to_numpy(dtype=object)).astype(
                np.uint64
            )
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return pd.DataFrame(
            {
                "doc": np.full(len(df), -1, dtype=np.int64),
                "tok": df["tok"],
                "k": df["n"],
                "__side": np.ones(len(df), dtype=np.int8),
                "__part": part,
            }
        )

    tagged = doc_tok.union(
        counts.map_batches(tag_counts, batch_format="pandas")
    )

    def score_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc": pd.Series(dtype=np.int64),
                "sum_ll": pd.Series(dtype=np.float64),
                "n_tok": pd.Series(dtype=np.int64),
                "__dpart": pd.Series(dtype=np.int32),
            }
        )
        from .dedup import _splitmix64

        side = g["__side"].to_numpy()
        dt = g[side == 0]
        cn = g[side == 1]
        if len(dt) == 0 or len(cn) == 0:
            return empty
        m = dt.merge(
            cn[["tok", "k"]].rename(columns={"k": "n"}), on="tok", how="inner"
        )
        ll = m["k"].to_numpy() * np.log(m["n"].to_numpy() / T)
        docs = m["doc"].to_numpy()
        order = np.argsort(docs, kind="stable")
        sd, sll, sk = docs[order], ll[order], m["k"].to_numpy()[order]
        starts = np.flatnonzero(
            np.concatenate(([True], sd[1:] != sd[:-1]))
        )
        out = pd.DataFrame(
            {
                "doc": sd[starts],
                "sum_ll": np.add.reduceat(sll, starts),
                "n_tok": np.add.reduceat(sk, starts).astype(np.int64),
            }
        )
        out["__dpart"] = (
            _splitmix64(out["doc"].to_numpy().astype(np.uint64))
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return out

    partials = tagged.groupby("__part").map_groups(
        score_partition, batch_format="pandas"
    )

    def doc_fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype=np.int64),
                "n_tokens": pd.Series(dtype=np.int64),
                "lm_score": pd.Series(dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        f = g.groupby("doc", as_index=False, sort=False).agg(
            sum_ll=("sum_ll", "sum"), n_tok=("n_tok", "sum")
        )
        return pd.DataFrame(
            {
                id_col: f["doc"],
                "n_tokens": f["n_tok"].astype(np.int64),
                "lm_score": round_away(
                    f["sum_ll"].to_numpy() / f["n_tok"].to_numpy(), 6
                ),
            }
        )

    return partials.groupby("__dpart").map_groups(
        doc_fold, batch_format="pandas"
    )


def normalize_text(
    docs_ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Canonical text-normalization pass: NFKC unicode normalization,
    lowercase, collapse whitespace runs to single spaces, strip. The
    stage every dedup/fingerprint pipeline runs first so that byte-level
    variants hash identically. Output: (id_col, norm_text, changed).

    Stateless vectorized map — no shuffle; pandas string kernels do the
    regex collapse in C, NFKC via a single ``str.normalize`` call.
    """

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        out = (
            t.str.normalize("NFKC")
            .str.lower()
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        return pd.DataFrame(
            {
                id_col: batch[id_col].astype(np.int64),
                "norm_text": out,
                "changed": (out != t).astype(np.int64),
            }
        )

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        norm, batch_format="pandas"
    )


def json_field_agg(
    events_ds: "ray.data.Dataset",
    props_col: str = "props",
    value_col: str = "value",
    field: str = "k",
    modulus: int = 10,
) -> pd.DataFrame:
    """Vectorized JSON-metadata extraction + aggregate: pull integer
    ``field`` out of a JSON-string column with ONE compiled-regex pandas
    pass (no per-row json.loads), bucket it by ``% modulus``, and return
    (k_mod, n, sum_value) — the "group training examples by a property
    buried in a metadata blob" pass. Semantics match DuckDB
    ``CAST(json_extract_string(props, '$.field') AS BIGINT)`` for flat
    integer fields; rows where the field is absent are dropped on both
    sides.

    Scale shape: pure per-batch combiner partials (modulus-sized count /
    sum arrays via np.bincount) — NO shuffle at all; the driver folds
    only partitions x modulus rows.
    """
    pat = re.compile(r'"' + re.escape(field) + r'"\s*:\s*(-?\d+)')

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ext = batch[props_col].fillna("").str.extract(pat, expand=False)
        ok = ext.notna().to_numpy()
        if not ok.any():
            return pd.DataFrame(
                {
                    "k_mod": pd.Series(dtype=np.int64),
                    "n": pd.Series(dtype=np.int64),
                    "sum_value": pd.Series(dtype=np.float64),
                }
            )
        k = ext[ok].to_numpy(dtype=np.int64)
        v = batch[value_col].to_numpy(dtype=np.float64)[ok]
        mod = k % modulus  # python-style: non-negative for modulus > 0
        n = np.bincount(mod, minlength=modulus)
        s = np.bincount(mod, weights=v, minlength=modulus)
        nz = np.flatnonzero(n)
        return pd.DataFrame(
            {
                "k_mod": nz.astype(np.int64),
                "n": n[nz].astype(np.int64),
                "sum_value": s[nz],
            }
        )

    partials = (
        events_ds.select_columns([props_col, value_col])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # partitions x modulus rows — tiny by construction
    )
    if len(partials) == 0:
        return partials
    out = (
        partials.groupby("k_mod", sort=True)
        .agg(n=("n", "sum"), sum_value=("sum_value", "sum"))
        .reset_index()
    )
    out["sum_value"] = round_away(out["sum_value"].to_numpy(), 2)
    return out


def vocab_entropy(
    docs_ds: "ray.data.Dataset",
    by_col: str = "lang",
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Per-group token-distribution Shannon entropy (nats) — the corpus
    diversity / degenerate-text diagnostic: H = ln(T) - sum(n ln n) / T
    over the group's exact token counts. Output: (by_col, n_tokens,
    entropy rounded 6).

    Scale shape: exact (group, token) counts via the same two-lexsort
    combiner + token-hash fold as ``top_terms`` (a (group, token) pair
    never spans two partitions), then each token partition reduces to
    per-group (T, sum n ln n) scalars — the driver folds only
    partitions x groups rows, never the vocabulary."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                by_col: pd.Series(dtype=object),
                "token": pd.Series(dtype=object),
                "cnt": pd.Series(dtype=np.int64),
                "__tpart": pd.Series(dtype=np.int32),
            }
        )
        texts = batch["text"].fillna("")
        tok_lists = texts.str.lower().str.split()
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = np.empty(total, dtype=object)
        pos = 0
        for ts in tok_lists:
            flat[pos : pos + len(ts)] = ts
            pos += len(ts)
        grp = np.repeat(batch[by_col].to_numpy(), lens)
        cg, ug = pd.factorize(grp)
        ct, ut = pd.factorize(flat)
        order = np.lexsort((ct, cg))
        sg, st = cg[order], ct[order]
        first = np.concatenate(
            ([True], (sg[1:] != sg[:-1]) | (st[1:] != st[:-1]))
        )
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, total))
        toks = ut[st[starts]]
        part = (
            pd.util.hash_array(toks).astype(np.uint64)
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return pd.DataFrame(
            {
                by_col: ug[sg[starts]],
                "token": toks,
                "cnt": cnt.astype(np.int64),
                "__tpart": part,
            }
        )

    def entropy_partials(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    by_col: pd.Series(dtype=object),
                    "T": pd.Series(dtype=np.int64),
                    "S": pd.Series(dtype=np.float64),
                }
            )
        cg, ug = pd.factorize(g[by_col].to_numpy())
        ct, ut = pd.factorize(g["token"].to_numpy())
        cnt = g["cnt"].to_numpy()
        order = np.lexsort((ct, cg))
        sg, st, sc = cg[order], ct[order], cnt[order]
        first = np.concatenate(
            ([True], (sg[1:] != sg[:-1]) | (st[1:] != st[:-1]))
        )
        starts = np.flatnonzero(first)
        n = np.add.reduceat(sc, starts).astype(np.float64)
        grp = sg[starts]
        t = np.zeros(len(ug), dtype=np.int64)
        s = np.zeros(len(ug), dtype=np.float64)
        np.add.at(t, grp, n.astype(np.int64))
        np.add.at(s, grp, n * np.log(n))
        return pd.DataFrame({by_col: ug, "T": t, "S": s})

    partials = (
        docs_ds.map_batches(partial, batch_format="pandas")
        .groupby("__tpart")
        .map_groups(entropy_partials, batch_format="pandas")
        .to_pandas()  # partitions x groups rows — tiny
    )
    agg = partials.groupby(by_col, sort=True)[["T", "S"]].sum().reset_index()
    T = agg["T"].to_numpy().astype(np.float64)
    H = np.log(T) - agg["S"].to_numpy() / T
    return pd.DataFrame(
        {
            by_col: agg[by_col],
            "n_tokens": agg["T"].astype(np.int64),
            "entropy": round_away(H, 6),
        }
    )


def vocab_jaccard(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    group_col: str = "source",
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Pairwise vocabulary Jaccard similarity between sources — the
    "how lexically similar are these corpora" diagnostic run before
    mixing or re-weighting training sources. Only pairs with a
    non-empty intersection are emitted (disjoint vocabularies are
    implicit zeros).

    Output: (source_a, source_b, n_inter, jaccard) with source_a <
    source_b; jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|), exact.

    Scale shape: each batch collapses to distinct (source, token) rows
    with one factorize + unique (the combiner — the token stream never
    leaves the worker un-deduplicated), rows hash-partition on the
    TOKEN (a token never spans two partitions), each partition dedupes
    exactly and emits two kinds of tiny partials: per-source distinct
    counts and per-token source-pair intersection rows (vectorized
    self-merge, bounded by |sources|^2 per token). The driver folds
    O(sources^2 + sources) rows. Raw texts never shuffle.
    """

    def distinct_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                group_col: pd.Series(dtype=object),
                "token": pd.Series(dtype=object),
                "__part": pd.Series(dtype=np.int32),
            }
        )
        texts = batch[text_col].fillna("")
        tok_lists = texts.str.split(" ")
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = np.empty(total, dtype=object)
        pos = 0
        for ts in tok_lists:
            flat[pos : pos + len(ts)] = ts
            pos += len(ts)
        src = np.repeat(batch[group_col].to_numpy(), lens)
        cs, us = pd.factorize(src)
        ct, ut = pd.factorize(flat)
        code = cs.astype(np.int64) * len(ut) + ct
        uc = np.unique(code)
        toks = ut[uc % len(ut)]
        part = (
            pd.util.hash_array(toks).astype(np.uint64)
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return pd.DataFrame(
            {
                group_col: us[uc // len(ut)],
                "token": toks,
                "__part": part,
            }
        )

    def fold_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "source_a": pd.Series(dtype=object),
                "source_b": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.drop_duplicates([group_col, "token"])
        # per-source distinct-token partial counts ride along as
        # (source, source, n) self-rows — folded by the same groupby
        sizes = (
            g.groupby(group_col, sort=False).size().reset_index(name="n")
        )
        sizes = pd.DataFrame(
            {
                "source_a": sizes[group_col],
                "source_b": sizes[group_col],
                "n": sizes["n"].astype(np.int64),
            }
        )
        ct, _ = pd.factorize(g["token"].to_numpy())
        d = pd.DataFrame({"kc": ct, "src": g[group_col].to_numpy()})
        m = d.merge(d, on="kc")
        m = m[m["src_x"] < m["src_y"]]
        if len(m) == 0:
            return sizes
        inter = (
            m.groupby(["src_x", "src_y"], sort=False)
            .size()
            .reset_index(name="n")
        )
        inter.columns = ["source_a", "source_b", "n"]
        inter["n"] = inter["n"].astype(np.int64)
        return pd.concat([sizes, inter], ignore_index=True)

    from ray.data.aggregate import Sum

    folded = (
        docs.select_columns([text_col, group_col])
        .map_batches(distinct_pairs, batch_format="pandas")
        .groupby("__part")
        .map_groups(fold_partition, batch_format="pandas")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(sources^2)
    )
    self_rows = folded["source_a"] == folded["source_b"]
    size = dict(
        zip(folded.loc[self_rows, "source_a"], folded.loc[self_rows, "n"])
    )
    pairs = folded.loc[~self_rows].reset_index(drop=True)
    na = pairs["source_a"].map(size).to_numpy(dtype=np.float64)
    nb = pairs["source_b"].map(size).to_numpy(dtype=np.float64)
    ni = pairs["n"].to_numpy(dtype=np.float64)
    return pd.DataFrame(
        {
            "source_a": pairs["source_a"],
            "source_b": pairs["source_b"],
            "n_inter": pairs["n"].astype(np.int64),
            "jaccard": round_away(ni / (na + nb - ni), 6),
        }
    ).sort_values(["source_a", "source_b"], ignore_index=True)


def bm25_topk(
    docs: "ray.data.Dataset",
    query_terms: tuple,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Top-``k`` documents by BM25 score for a bag-of-terms query — the
    standard full-text relevance ranking (Lucene idf variant:
    ``ln((N - df + 0.5)/(df + 0.5) + 1)``). Only documents containing at
    least one query term are candidates; ranking is on the score ROUNDED
    to 6 decimals with ``id_col`` ascending tie-break, so the top-k cut
    is deterministic and libm-stable.

    Scale shape: TWO streaming text passes, no shuffle. Pass 1 emits one
    tiny partial row per batch (n_docs, total token length, per-term
    document frequencies via a vectorized isin + bincount) and the
    driver folds O(batches) rows into idf/avgdl scalars. Pass 2
    broadcasts those few floats in the task closure, scores each batch
    with one searchsorted + one (docs x terms) bincount matrix, and
    emits only its LOCAL top-k candidate rows; the driver folds
    O(k x batches) rows to the global top-k. Raw token streams never
    leave their worker.
    """
    terms = np.sort(np.asarray(sorted(set(query_terms)), dtype=object))
    m = len(terms)

    def flat_tokens(batch: pd.DataFrame):
        texts = batch[text_col].fillna("")
        tok_lists = texts.str.split(" ")
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        flat = np.empty(total, dtype=object)
        pos = 0
        for ts in tok_lists:
            flat[pos : pos + len(ts)] = ts
            pos += len(ts)
        doc = np.repeat(np.arange(len(texts)), lens)
        return flat, doc, lens

    def tf_matrix(flat, doc, n_docs):
        hit = np.isin(flat, terms)
        sel = np.flatnonzero(hit)
        ti = np.searchsorted(terms, flat[sel])
        tf = np.bincount(
            doc[sel] * m + ti, minlength=n_docs * m
        ).reshape(n_docs, m)
        return tf

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        flat, doc, lens = flat_tokens(batch)
        tf = tf_matrix(flat, doc, len(lens))
        row = {
            "n": np.array([len(lens)], dtype=np.int64),
            "slen": np.array([int(lens.sum())], dtype=np.int64),
        }
        for j in range(m):
            row[f"df{j}"] = np.array(
                [int((tf[:, j] > 0).sum())], dtype=np.int64
            )
        return pd.DataFrame(row)

    stats = (
        docs.select_columns([text_col])
        .map_batches(stats_partial, batch_format="pandas")
        .to_pandas()  # one row per batch
        .sum()
    )
    n_total = int(stats["n"])
    avgdl = int(stats["slen"]) / n_total
    df = np.array([int(stats[f"df{j}"]) for j in range(m)], dtype=np.float64)
    idf = np.log((n_total - df + 0.5) / (df + 0.5) + 1.0)

    def score_partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype=np.int64),
                "score": pd.Series(dtype=np.float64),
            }
        )
        if len(batch) == 0:
            return empty
        flat, doc, lens = flat_tokens(batch)
        tf = tf_matrix(flat, doc, len(lens)).astype(np.float64)
        norm = k1 * (1.0 - b + b * lens / avgdl)
        s = (idf[None, :] * tf * (k1 + 1.0) / (tf + norm[:, None])).sum(
            axis=1
        )
        hit = s > 0
        if not hit.any():
            return empty
        ids = batch[id_col].to_numpy()[hit]
        sc = round_away(s[hit], 6)
        order = np.lexsort((ids, -sc))[:k]  # local top-k candidates
        return pd.DataFrame({id_col: ids[order], "score": sc[order]})

    cand = (
        docs.select_columns([id_col, text_col])
        .map_batches(score_partial, batch_format="pandas")
        .to_pandas()  # O(k x batches)
    )
    order = np.lexsort((cand[id_col].to_numpy(), -cand["score"].to_numpy()))
    return cand.iloc[order[:k]].reset_index(drop=True)
