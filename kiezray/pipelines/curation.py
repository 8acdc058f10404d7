"""FineWeb/CCNet-style training-data curation pipeline.

Composes the per-document quality kernels this engine already ships —
language-ID, heuristic quality scoring, Gopher repetition filters
(Rae et al. 2021 table A1), exact content dedup, and eval-suite
decontamination — into one keep/drop decision per document, the
standard LLM-pretraining curation pass (Penedo et al. 2024, "The
FineWeb Datasets"; Wenzek et al. 2020, CCNet).

Scale shape — ONE corpus scan + ONE narrow shuffle: the per-doc rules
(lang / quality / repetition / decontamination) chain as pass-through
map_batches stages over a single pruned (doc_id, text) read. All four
are task stages (decontamination broadcasts the probe list and keeps
the compiled alternations in a per-worker LRU — textops._PROBE_CACHE),
so they fuse into ONE task per block with no actor boundary and no
pool spin-up per execution. The scan's last stage drops the text,
leaving ~50 B/row flag+hash rows, and the only exchange is the exact
-dedup content-hash partition, inside which the keeper (min doc_id per
identical text) and the final conjunction resolve with one lexsort — no
joins, no doc-keyed second shuffle, nothing driver-side but the probe
list. The small extra scan that extracts probes reads only the probe
rows' columns.

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


@dataclass
class CurationConfig:
    lang: str = "en"
    min_quality: float = 0.5
    max_dup_word_frac: float = 0.55
    max_dup_2gram_frac: float = 0.3
    probe_mod: int = 37  # every probe_mod-th doc is "the eval suite"
    probe_min_chars: int = 60
    num_partitions: int = 32
    # lineage: with a checkpoint_dir every stage is written as
    # partitioned parquet + manifest (kiezray.lineage.run_stage) and a
    # re-run resumes from the last completed stage; fingerprints are
    # INPUT-ADDRESSED (corpus content hash mixed in), so an edited
    # corpus can never reuse a stale checkpoint
    checkpoint_dir: str | None = None
    resume: bool = True


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

    def build_stream() -> "ray.data.Dataset":
        # the probe list is an eval-suite extract — tiny by construction;
        # collecting it is the broadcast, not a driver-side corpus pass.
        # (Deferred into this builder so a lineage-resumed run that skips
        # the flags stage never pays the probe scan.)
        probes = [
            r["p"]
            for r in docs.map_batches(
                extract_probes, batch_format="pyarrow"
            ).take_all()
        ]

        # ONE scan: the pass-through kernels chain per batch, text rides
        # to the last stage and is dropped before the shuffle; the
        # decontamination stage runs in the shared task pool (compiled
        # probe patterns live in a per-worker LRU), so all four kernels
        # fuse into ONE task per block — no actor boundary, no pool
        # spin-up per execution
        stream = language_id(docs, pass_through=True)
        stream = quality_score(stream, pass_through=True)
        stream = repetition_stats(stream, pass_through=True)
        return decontaminate(stream, probes)

    def flags_and_keys(df: pd.DataFrame) -> pd.DataFrame:
        # the engine-wide exact-text identity (dedup.text_key128):
        # grouping is exact text equality (collision odds ~2^-128),
        # NULL text its own group exactly like SQL's PARTITION BY text
        from ..dedup import text_key128

        h1, h2 = text_key128(df["text"].to_numpy(dtype=object))
        rep_ok = (
            df["dup_word_frac"].to_numpy() <= cfg.max_dup_word_frac
        ) & (df["dup_2gram_frac"].to_numpy() <= cfg.max_dup_2gram_frac)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "lang_ok": (df["lang_pred"] == cfg.lang)
                .to_numpy()
                .astype(np.int64),
                "quality_ok": (
                    round_away(df["quality"].to_numpy(), 6)
                    >= cfg.min_quality
                ).astype(np.int64),
                "repetition_ok": rep_ok.astype(np.int64),
                "contaminated": df["contaminated"].to_numpy(
                    dtype=np.int64
                ),
                "__ch1": h1.view(np.int64),
                "__ch2": h2.view(np.int64),
                "__part": (h1 % np.uint64(cfg.num_partitions)).astype(
                    np.int32
                ),
            }
        )

    def final_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g["doc_id"].to_numpy(dtype=np.int64)
        c1 = g["__ch1"].to_numpy()
        c2 = g["__ch2"].to_numpy()
        order = np.lexsort((d, c2, c1))
        oc1, oc2 = c1[order], c2[order]
        first = np.concatenate(
            ([True], (oc1[1:] != oc1[:-1]) | (oc2[1:] != oc2[:-1]))
        )
        keep_dedup = np.empty(len(d), dtype=bool)
        keep_dedup[order] = first  # min-id row of each content group
        lang_ok = g["lang_ok"].to_numpy(dtype=np.int64)
        quality_ok = g["quality_ok"].to_numpy(dtype=np.int64)
        repetition_ok = g["repetition_ok"].to_numpy(dtype=np.int64)
        contaminated = g["contaminated"].to_numpy(dtype=np.int64)
        keep = (
            (lang_ok == 1)
            & (quality_ok == 1)
            & (repetition_ok == 1)
            & (contaminated == 0)
            & keep_dedup
        )
        return pd.DataFrame(
            {
                "doc_id": d,
                "lang_ok": lang_ok,
                "quality_ok": quality_ok,
                "repetition_ok": repetition_ok,
                "contaminated": contaminated,
                "keep_dedup": keep_dedup.astype(np.int64),
                "keep": keep.astype(np.int64),
            }
        )

    if cfg.checkpoint_dir is None:
        # no lineage requested: keep the pipeline fully lazy/streaming
        return (
            build_stream()
            .map_batches(flags_and_keys, batch_format="pandas")
            .groupby("__part")
            .map_groups(final_fold, batch_format="pandas")
        )

    # lineage tier: the expensive fused scan ("flags" — lang + quality +
    # repetition + decontamination + content hashes, text already
    # dropped) and the verdict fold each checkpoint as partitioned
    # parquet with an input-addressed fingerprint; a crashed run resumes
    # at the last completed stage (mirrors pipelines/er.py)
    from dataclasses import asdict

    from ..lineage import fingerprint, run_stage
    from .er import _docs_fingerprint

    cfg_sem = {
        k: v
        for k, v in asdict(cfg).items()
        if k not in ("checkpoint_dir", "resume")
    }
    stage_fp = fingerprint(cfg_sem, _docs_fingerprint(docs))
    flags_ds = run_stage(
        "curation_flags",
        fingerprint(stage_fp, "flags"),
        lambda: build_stream().map_batches(
            flags_and_keys, batch_format="pandas"
        ),
        cfg.checkpoint_dir,
        cfg.resume,
    )
    return run_stage(
        "curation_verdict",
        fingerprint(stage_fp, "verdict"),
        lambda: flags_ds.groupby("__part").map_groups(
            final_fold, batch_format="pandas"
        ),
        cfg.checkpoint_dir,
        cfg.resume,
    )
