"""FineWeb/CCNet-style training-data curation pipeline.

Composes the per-document quality kernels this engine already ships —
language-ID, heuristic quality scoring, Gopher repetition filters
(Rae et al. 2021 table A1), exact content dedup, and eval-suite
decontamination — into one keep/drop decision per document, the
standard LLM-pretraining curation pass (Penedo et al. 2024, "The
FineWeb Datasets"; Wenzek et al. 2020, CCNet).

Scale shape: every rule except dedup is embarrassingly parallel
(per-batch kernels over pruned (doc_id, text) scans; the decontamination
probe set is a broadcast eval-suite extract). Exact dedup is ONE
content-hash shuffle of ~28 B/row keys (dedup.dedup_exact with
keep_cols=[]). The verdict combine is ONE doc-keyed shuffle: each rule
emits narrow (doc_id, src, v1, v2) rows, a hash-partitioned fold pivots
them vectorized (lexsort + aligned slices, no per-doc Python), and the
output is one flags row per document. Nothing is ever materialized on
the driver except the probe list.

Every rule is defined to be exactly SQL-expressible (the per-rule
kernels are tol-0 oracle-checked individually), so the composed verdict
has a DuckDB oracle too — see SQL_CURATION in pipelines/queries.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..arrowutil import round_away

_SRC_LANG, _SRC_QUALITY, _SRC_REP, _SRC_CONTAM, _SRC_DEDUP = range(5)


@dataclass
class CurationConfig:
    lang: str = "en"
    min_quality: float = 0.5
    max_dup_word_frac: float = 0.55
    max_dup_2gram_frac: float = 0.3
    probe_mod: int = 37  # every probe_mod-th doc is "the eval suite"
    probe_min_chars: int = 60
    num_partitions: int = 32


def _flag_rows(doc_id, src, v1, v2=None) -> pa.Table:
    n = len(doc_id)
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(doc_id, dtype=np.int64)),
            "src": pa.array(np.full(n, src, dtype=np.int64)),
            "v1": pa.array(np.asarray(v1, dtype=np.float64)),
            "v2": pa.array(
                np.zeros(n) if v2 is None else np.asarray(v2, np.float64)
            ),
        }
    )


def run_curation(
    docs_ds: "ray.data.Dataset", cfg: CurationConfig | None = None
) -> "ray.data.Dataset":
    """Returns one row per document: (doc_id, lang_ok, quality_ok,
    repetition_ok, contaminated, keep_dedup, keep) — all int64 0/1,
    ``keep`` the conjunction. Rule semantics (each matching its tol-0
    oracle-checked kernel, thresholds applied to the round-half-away
    6-decimal values so both compare sides see identical numbers):

    - lang_ok: language_id() prediction == cfg.lang
    - quality_ok: quality_score().quality >= cfg.min_quality
    - repetition_ok: dup_word_frac <= cfg.max_dup_word_frac AND
      dup_2gram_frac <= cfg.max_dup_2gram_frac (repetition_stats())
    - contaminated: text contains any probe (middle 30 chars of every
      cfg.probe_mod-th doc with >= cfg.probe_min_chars chars)
    - keep_dedup: doc_id == min(doc_id) over exact text equality
    """
    from ..dedup import dedup_exact
    from ..textops import (
        decontaminate,
        language_id,
        quality_score,
        repetition_stats,
    )

    cfg = cfg or CurationConfig()
    docs = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )

    lang_src = language_id(docs).map_batches(
        lambda df: _flag_rows(
            df["doc_id"].to_numpy(),
            _SRC_LANG,
            (df["lang_pred"] == cfg.lang).to_numpy(dtype=np.float64),
        ),
        batch_format="pandas",
    )
    qual_src = quality_score(docs).map_batches(
        lambda df: _flag_rows(
            df["doc_id"].to_numpy(),
            _SRC_QUALITY,
            round_away(df["quality"].to_numpy(), 6),
        ),
        batch_format="pandas",
    )
    rep_src = repetition_stats(docs).map_batches(
        lambda df: _flag_rows(
            df["doc_id"].to_numpy(),
            _SRC_REP,
            round_away(df["dup_word_frac"].to_numpy(), 6),
            round_away(df["dup_2gram_frac"].to_numpy(), 6),
        ),
        batch_format="pandas",
    )

    def extract_probes(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        is_probe = pa.array(
            (ids % cfg.probe_mod == 0)
            & (
                pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
                >= cfg.probe_min_chars
            )
        )
        sel = t.filter(is_probe)
        return pa.table(
            {"p": pc.utf8_slice_codeunits(sel["text"], start=20, stop=50)}
        )

    # the probe list is an eval-suite extract — tiny by construction;
    # collecting it is the broadcast, not a driver-side corpus pass
    probes = [
        r["p"]
        for r in docs.map_batches(
            extract_probes, batch_format="pyarrow"
        ).take_all()
    ]
    contam_src = decontaminate(docs, probes).map_batches(
        lambda t: _flag_rows(
            t["doc_id"].to_numpy(zero_copy_only=False),
            _SRC_CONTAM,
            t["contaminated"].to_numpy(zero_copy_only=False).astype(
                np.float64
            ),
        ),
        batch_format="pyarrow",
    )
    dedup_src = dedup_exact(
        docs, ["text"], keep_cols=[], num_partitions=cfg.num_partitions
    ).map_batches(
        lambda t: _flag_rows(
            t["doc_id"].to_numpy(zero_copy_only=False),
            _SRC_DEDUP,
            np.ones(len(t)),
        ),
        batch_format="pyarrow",
    )

    all_rows = lang_src.union(qual_src, rep_src, contam_src, dedup_src)

    def add_part(t: pa.Table) -> pa.Table:
        part = (
            t["doc_id"].to_numpy(zero_copy_only=False)
            % cfg.num_partitions
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g["doc_id"].to_numpy(dtype=np.int64)
        s = g["src"].to_numpy(dtype=np.int64)
        v1 = g["v1"].to_numpy(dtype=np.float64)
        v2 = g["v2"].to_numpy(dtype=np.float64)
        # dense sources (lang/quality/rep/contam) carry one row per doc:
        # sorting each source's rows by doc_id aligns them all to the
        # same doc axis — a vectorized pivot, no per-doc groups
        def aligned(src):
            sel = np.flatnonzero(s == src)
            o = np.argsort(d[sel], kind="stable")
            return sel[o]

        il = aligned(_SRC_LANG)
        docs_sorted = d[il]
        lang_ok = v1[il] > 0.0
        iq = aligned(_SRC_QUALITY)
        quality_ok = v1[iq] >= cfg.min_quality
        ir = aligned(_SRC_REP)
        repetition_ok = (v1[ir] <= cfg.max_dup_word_frac) & (
            v2[ir] <= cfg.max_dup_2gram_frac
        )
        ic = aligned(_SRC_CONTAM)
        contaminated = v1[ic] > 0.0
        # dedup survivors are sparse: membership via sorted search
        surv = np.sort(d[s == _SRC_DEDUP])
        if len(surv):
            pos = np.searchsorted(surv, docs_sorted)
            keep_dedup = (pos < len(surv)) & (
                surv[np.minimum(pos, len(surv) - 1)] == docs_sorted
            )
        else:
            keep_dedup = np.zeros(len(docs_sorted), dtype=bool)
        keep = (
            lang_ok & quality_ok & repetition_ok & ~contaminated & keep_dedup
        )
        return pd.DataFrame(
            {
                "doc_id": docs_sorted,
                "lang_ok": lang_ok.astype(np.int64),
                "quality_ok": quality_ok.astype(np.int64),
                "repetition_ok": repetition_ok.astype(np.int64),
                "contaminated": contaminated.astype(np.int64),
                "keep_dedup": keep_dedup.astype(np.int64),
                "keep": keep.astype(np.int64),
            }
        )

    return (
        all_rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold, batch_format="pandas")
    )
