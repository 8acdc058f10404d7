"""Dedup operator and text-analysis tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from kiezray.dedup import (
    _shingle_hashes,
    dedup_embedding_cosine,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_simhash,
    ngram_jaccard_pairs,
)


@pytest.fixture(scope="module")
def dup_docs():
    base = [
        "the quick brown fox jumps over the lazy dog and runs away fast",
        "pack my box with five dozen liquor jugs tonight before midnight",
        "sphinx of black quartz judge my vow while the band plays on",
        "how vexingly quick daft zebras jump over the old stone wall",
    ]
    rows = []
    i = 0
    for b_idx, text in enumerate(base):
        rows.append({"doc_id": i, "text": text, "group": b_idx}); i += 1
        # near-dup: one word changed
        rows.append(
            {"doc_id": i, "text": text.replace("the", "a", 1), "group": b_idx}
        ); i += 1
        # exact dup
        rows.append({"doc_id": i, "text": text, "group": b_idx}); i += 1
    # unrelated singletons
    for extra in ["completely different content about databases and queries",
                  "unrelated sentence mentioning airplanes and weather patterns"]:
        rows.append({"doc_id": i, "text": extra, "group": 100 + i}); i += 1
    return pd.DataFrame(rows)


def test_shingle_hashes_deterministic():
    a = _shingle_hashes("hello world", 3)
    b = _shingle_hashes("hello world", 3)
    np.testing.assert_array_equal(a, b)
    assert len(_shingle_hashes("ab", 3)) >= 1  # short-text padding
    # k>8 fallback path agrees with itself
    c = _shingle_hashes("hello world, longer text", 12)
    assert len(c) > 0


def test_dedup_exact(dup_docs):
    ds = ray.data.from_pandas(dup_docs[["doc_id", "text"]]).repartition(2)
    kept = dedup_exact(ds, content_cols=["text"], id_col="doc_id").to_pandas()
    # 4 bases + 3 distinct near-dups (one base has no "the" so its
    # "near-dup" is an exact dup) + 2 singletons = 9 kept
    assert len(kept) == 9
    # exact dup (doc_id = base+2) must lose to the base doc
    assert set(kept["doc_id"]) & {2, 5, 8, 11} == set()


def test_dedup_minhash_lsh(dup_docs):
    ds = ray.data.from_pandas(dup_docs[["doc_id", "text"]]).repartition(2)
    comp = dedup_minhash_lsh(ds, threshold=0.7).to_pandas()
    assert len(comp) == len(dup_docs)
    lab = dict(zip(comp["node"], comp["component"]))
    by_group = dup_docs.groupby("group")["doc_id"].apply(list)
    for g, members in by_group.items():
        if len(members) > 1:
            assert len({lab[m] for m in members}) == 1, f"group {g} split"
    # singletons must not merge with anything
    singles = dup_docs[dup_docs["group"] >= 100]["doc_id"]
    for s in singles:
        assert sum(1 for v in lab.values() if v == lab[s]) == 1


def test_dedup_simhash(dup_docs):
    ds = ray.data.from_pandas(dup_docs[["doc_id", "text"]]).repartition(2)
    comp = dedup_simhash(ds, max_hamming=10).to_pandas()
    lab = dict(zip(comp["node"], comp["component"]))
    # exact dups always collapse
    for base_id in (0, 3, 6, 9):
        assert lab[base_id] == lab[base_id + 2]


def test_ngram_jaccard_pairs(dup_docs):
    ds = ray.data.from_pandas(dup_docs[["doc_id", "text"]]).repartition(2)
    pairs = ngram_jaccard_pairs(ds, threshold=0.6).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
    for base_id in (0, 3, 6, 9):
        assert (base_id, base_id + 2) in got  # exact dup j=1.0
        assert (base_id, base_id + 1) in got  # near dup above 0.6
    assert (pairs["jaccard"] >= 0.6).all()


def test_dedup_embedding_cosine():
    rng = np.random.RandomState(0)
    base = rng.rand(5, 16)
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, v))
        rows.append((i * 2 + 1, v + rng.rand(16) * 0.01))  # near-dup
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([r[1] for r in rows])
    from kiezray.arrowutil import matrix_to_fsl

    tbl = pa.table(
        {"row_id": pa.array(ids), "embedding": matrix_to_fsl(mat, pa.float64())}
    )
    comp = dedup_embedding_cosine(
        ray.data.from_arrow(tbl), threshold=0.99, n_candidates=3
    ).to_pandas()
    lab = dict(zip(comp["node"], comp["component"]))
    for i in range(5):
        assert lab[i * 2] == lab[i * 2 + 1]


def test_textops_quality_and_fingerprint():
    from kiezray.textops import fingerprint, quality_score, token_counts

    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "the cat and the dog played in a big sunny garden all day",
                "x!!! ??? ,,,",
            ],
        }
    )
    ds = ray.data.from_pandas(df)
    q = quality_score(ds).to_pandas().set_index("doc_id")
    assert q.loc[1, "stopword_ratio"] > q.loc[2, "stopword_ratio"]
    assert q.loc[2, "punct_ratio"] > q.loc[1, "punct_ratio"]
    assert 0 <= q["quality"].min() and q["quality"].max() <= 1
    t = token_counts(ds).to_pandas().set_index("doc_id")
    assert t.loc[1, "ws_tokens"] == 13
    f1 = fingerprint(ds).to_pandas()
    f2 = fingerprint(ds).to_pandas()
    assert f1.equals(f2)


def test_top_terms_counts_and_rank(ray_session):
    import pandas as pd
    import ray.data

    from kiezray.textops import top_terms

    df = pd.DataFrame(
        {
            "lang": ["en", "en", "de", "de", "en"],
            "text": [
                "The cat  sat", "the dog\tsat", "der Hund",
                "  der der hund ", None,
            ],
        }
    )
    out = (
        top_terms(ray.data.from_pandas(df).repartition(3), k=2, by_col="lang")
        .to_pandas()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )
    # en: the x2 (lowercased), sat x2 -> tie broken by token asc: sat, the
    en = out[out["lang"] == "en"]
    assert list(en["token"]) == ["sat", "the"]
    assert list(en["cnt"]) == [2, 2]
    de = out[out["lang"] == "de"]
    assert list(de["token"]) == ["der", "hund"]
    assert list(de["cnt"]) == [3, 2]
    assert list(out["rank"]) == [1, 2, 1, 2]


def test_repetition_stats_planted(ray_session):
    import pandas as pd

    from kiezray.textops import repetition_stats

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "a b c d",              # all distinct
                "a a a a",              # one word repeated
                "x y x y x y",          # bigram "x y" repeats
                "solo",                 # single word, no bigrams
            ],
        }
    )
    out = (
        repetition_stats(ray.data.from_pandas(docs).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.allclose(out["dup_word_frac"], [0.0, 0.75, 4 / 6, 0.0])
    assert np.allclose(out["top_word_frac"], [0.25, 1.0, 0.5, 1.0])
    # doc1 bigrams: aa aa aa -> 3 total, 1 distinct -> 2/3
    # doc2 bigrams: xy yx xy yx xy -> 5 total, 2 distinct -> 0.6
    assert np.allclose(out["dup_2gram_frac"], [0.0, 2 / 3, 0.6, 0.0], atol=1e-6)


def test_redact_vectorized(ray_session):
    from kiezray.textops import redact

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["call 555 1234 now", "no digits here"]),
        }
    )
    out = (
        redact(ray.data.from_arrow(t), r"[0-9]+", "<NUM>")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["text"].tolist() == [
        "call <NUM> <NUM> now",
        "no digits here",
    ]
    # out_col keeps the original intact
    out2 = (
        redact(ray.data.from_arrow(t), r"[0-9]+", "#", out_col="red")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out2["text"].tolist()[0] == "call 555 1234 now"
    assert out2["red"].tolist()[0] == "call # # now"


def test_decontaminate_flags_probe_hits(ray_session):
    from kiezray.textops import decontaminate

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the quick brown fox jumps",
                    "a clean document with safe words",
                    "contains the secret eval answer inside",
                    "another clean one",
                ]
            ),
        }
    )
    out = (
        decontaminate(
            ray.data.from_arrow(docs).repartition(2),
            probes=["secret eval answer", "quick brown fox"],
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["contaminated"].tolist() == [1, 0, 1, 0]
    assert out["contaminated"].dtype == np.int64


def test_decontaminate_stage_modes_agree(ray_session):
    # task tier (shared pool + per-process compiled-pattern LRU) and the
    # actor tier must flag identically; the LRU must key on the probe
    # ref so a second probe set never reuses stale patterns
    from kiezray.textops import decontaminate

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["needle one", "clean", "second needle"]),
        }
    )
    ds = ray.data.from_arrow(docs).repartition(2)
    for probes, want in [
        (["needle one"], [1, 0, 0]),
        (["second needle"], [0, 0, 1]),  # new ref -> new patterns
    ]:
        got = {
            mode: decontaminate(ds, probes, stage_mode=mode)
            .to_pandas()
            .sort_values("doc_id")["contaminated"]
            .tolist()
            for mode in ("task", "actor")
        }
        assert got["task"] == got["actor"] == want


def test_ngram_decontaminate_planted_overlap(ray_session):
    # a train doc sharing exactly one distinct probe 3-gram is flagged
    # with n_hits=1; a doc repeating that gram twice still counts it
    # ONCE (distinct grams); docs shorter than n and disjoint docs are
    # absent; an empty probe set flags nothing
    from kiezray.textops import ngram_decontaminate

    train = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
            "text": pa.array(
                [
                    "aa bb cc dd ee",  # shares "aa bb cc" -> 1 hit
                    "aa bb cc xx aa bb cc",  # same gram twice -> still 1
                    "zz yy xx ww",  # disjoint -> absent
                    "aa bb",  # shorter than n -> absent
                    "AA Bb cc qq",  # lowercased -> shares "aa bb cc"
                ]
            ),
        }
    )
    probe = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["aa bb cc dd qq rr"]),
        }
    )
    tds = ray.data.from_arrow(train).repartition(2)
    pds = ray.data.from_arrow(probe)
    got = (
        ngram_decontaminate(tds, pds, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 10 shares "aa bb cc" + "bb cc dd" = 2 distinct grams
    assert got["doc_id"].tolist() == [10, 11, 14]
    assert got["n_hits"].tolist() == [2, 1, 1]
    assert got["n_hits"].dtype == np.int64

    empty_probe = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert ngram_decontaminate(tds, empty_probe, n=3).count() == 0


def test_chunk_manifest_overlap_and_edges(ray_session):
    # 10 tokens, window 4, stride 2: starts 1,3,5,7 (ends 4,6,8,10 —
    # last start = n-window+stride = 8); short doc -> one partial
    # chunk; empty doc -> one 1-token chunk (the [''] token contract)
    from kiezray.textops import chunk_manifest

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "a b c", ""]
            ),
        }
    )
    ds = ray.data.from_arrow(docs).repartition(2)
    got = (
        chunk_manifest(ds, window=4, stride=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d1 = got[got["doc_id"] == 1]
    assert d1["start_tok"].tolist() == [1, 3, 5, 7]
    assert d1["end_tok"].tolist() == [4, 6, 8, 10]
    assert d1["n_tokens"].tolist() == [4, 4, 4, 4]
    d2 = got[got["doc_id"] == 2]
    assert d2[["start_tok", "end_tok", "n_tokens"]].values.tolist() == [
        [1, 3, 3]
    ]
    d3 = got[got["doc_id"] == 3]
    assert d3[["start_tok", "end_tok", "n_tokens"]].values.tolist() == [
        [1, 1, 1]
    ]
    # every token of doc 1 is covered and consecutive chunks overlap
    # by window - stride = 2
    assert d1["chunk_id"].tolist() == [0, 1, 2, 3]


def test_dedup_against_corpus_anti_join(ray_session):
    from kiezray.dedup import dedup_against_corpus

    base = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["alpha", "beta", "gamma"]),
        }
    )
    inc = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
            "text": pa.array(["beta", "delta", "alpha", "epsilon"]),
        }
    )
    kept = (
        dedup_against_corpus(
            ray.data.from_arrow(inc).repartition(2),
            ray.data.from_arrow(base).repartition(2),
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert kept["doc_id"].tolist() == [11, 13]
    assert kept["text"].tolist() == ["delta", "epsilon"]


def test_tfidf_topk_hand_computed(ray_session):
    import math

    from kiezray.textops import tfidf_topk

    # 4 docs: "rare" appears in 1 doc, "common" in all 4
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "common rare rare",
                    "common common other",
                    "common other",
                    "common",
                ]
            ),
        }
    )
    out = (
        tfidf_topk(ray.data.from_arrow(docs).repartition(2), k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    # doc 0 top term: "rare" tf=2, df=1 -> 2*ln(4/1)
    r0 = out[(out.doc_id == 0) & (out["rank"] == 1)].iloc[0]
    assert r0["tok"] == "rare"
    assert abs(r0["tfidf"] - round(2 * math.log(4.0), 6)) < 1e-9
    # "common" has df=4 -> idf 0 -> score 0 everywhere
    assert (out[out.tok == "common"]["tfidf"] == 0).all()
    # doc 3 has only "common": exactly one row
    assert len(out[out.doc_id == 3]) == 1
    # at most k rows per doc, ranks contiguous from 1
    for d, g in out.groupby("doc_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= 2


def test_dedup_keep_best_prefers_high_score(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.dedup import dedup_keep_best

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["aa", "aa", "aa", "bb", "bb"],
            "q": [0.1, 0.9, 0.9, 0.5, 0.5],
        }
    )
    out = (
        dedup_keep_best(
            ray.data.from_pandas(df).repartition(3),
            content_cols=["text"], order_col="q",
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # "aa": max q 0.9 tie -> min id 2; "bb": tie -> min id 4
    assert list(out["doc_id"]) == [2, 4]


def test_batch_levenshtein_matches_reference_dp():
    """Vectorized min-plus-scan DP equals the classic per-pair DP on
    random strings (incl. empties, equal strings, unicode)."""
    import random

    from kiezray.dedup import batch_levenshtein

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, len(b) + 1):
                cur = min(dp[j] + 1, dp[j - 1] + 1,
                          prev + (a[i - 1] != b[j - 1]))
                prev, dp[j] = dp[j], cur
        return dp[len(b)]

    rng = random.Random(13)
    alpha = "abcd éü"
    pairs = [("", ""), ("", "xy"), ("xy", ""), ("same", "same")]
    for _ in range(150):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        pairs.append((a, b))
    got = batch_levenshtein([p[0] for p in pairs], [p[1] for p in pairs])
    want = np.array([ref(a, b) for a, b in pairs], dtype=np.int64)
    assert (got == want).all()


def test_edit_pairs_blocked_and_partition_invariant(ray_session):
    """edit_pairs emits exactly the within-prefix-block pairs with exact
    distances, identically at different input partitionings."""
    import ray

    from kiezray.dedup import edit_pairs

    texts = [
        "the quick brown fox jumps",
        "the quick brown fox jumped",   # same 16-prefix as above
        "the quick brown cat sits",     # same 16-prefix
        "a totally different text",
        "A Totally different TEXT here",  # same lowercased prefix
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(5, dtype=np.int64), "text": texts}
    )
    outs = []
    for parts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = (
            edit_pairs(ds, "doc_id", "text", prefix_len=16)
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    assert set(zip(got["a_id"], got["b_id"])) == {(0, 1), (0, 2), (1, 2), (3, 4)}
    row = got[(got["a_id"] == 0) & (got["b_id"] == 1)]
    assert int(row["dist"].iloc[0]) == 2  # jumps -> jumped


def test_weighted_minhash_estimates_weighted_jaccard():
    """ICWS collision rate estimates weighted Jaccard of token-count
    vectors (Ioffe 2010): known-weight example within Monte-Carlo error;
    identical docs collide exactly; disjoint docs never do."""
    from kiezray.dedup import batch_weighted_minhash

    A = " ".join(["x"] * 8 + ["y"] * 2)
    B = " ".join(["x"] * 4 + ["y"] * 2 + ["z"] * 4)
    sig = batch_weighted_minhash([A, B, A, ""], num_perm=512, seed=3)
    est = (sig[0] == sig[1]).mean()
    true = (4 + 2) / (8 + 2 + 4)
    assert abs(est - true) < 0.07  # se ~ 0.022 at 512 perms
    assert (sig[0] == sig[2]).all()
    assert (sig[3] == 0).all()  # empty doc -> zero signature
    C = "totally different tokens here"
    sig2 = batch_weighted_minhash([A, C], num_perm=128)
    assert (sig2[0] == sig2[1]).mean() < 0.05
    # count sensitivity: plain-set view would say A == D (same tokens),
    # weighted view must NOT collide everywhere
    D = " ".join(["x"] * 2 + ["y"] * 8)
    sig3 = batch_weighted_minhash([A, D], num_perm=512, seed=3)
    frac = (sig3[0] == sig3[1]).mean()
    true_ad = (2 + 2) / (8 + 8)
    assert abs(frac - true_ad) < 0.07


def test_dedup_weighted_minhash_clusters_planted_dups(ray_session):
    """The ICWS pipeline co-clusters exact duplicates and keeps distinct
    docs apart on a deterministic corpus."""
    import ray

    from kiezray.dedup import dedup_weighted_minhash
    from kiezray.synth import generate_docs

    rng = np.random.default_rng(5)
    words = [f"w{j:03d}" for j in range(400)]
    texts, ids = [], []
    for i in range(60):
        body = " ".join(rng.choice(words, 30).tolist()) + f" unique{i}"
        texts.append(body)
        ids.append(i)
    # plant exact dups of every 6th doc
    planted = [(i + 1000, texts[i]) for i in range(0, 60, 6)]
    ids += [p[0] for p in planted]
    texts += [p[1] for p in planted]
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
    )
    comp = (
        dedup_weighted_minhash(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
    )
    lab = dict(zip(comp["node"], comp["component"]))
    assert len(lab) == len(ids)
    for i in range(0, 60, 6):
        assert lab[i] == lab[i + 1000], f"planted dup {i} not co-clustered"
    # distinct docs stay apart
    assert len(set(lab.values())) >= 55


def test_source_overlap_counts_shared_token_sets(ray_session):
    """Two sources sharing a bag-of-words (reordered/repeated tokens)
    count as overlap; unique-content sources do not."""
    import pandas as pd
    import ray.data

    from kiezray.dedup import source_overlap

    docs = pd.DataFrame(
        {
            "text": [
                "alpha beta gamma",
                "gamma alpha beta beta",   # same token set, reordered+rep
                "alpha beta gamma",        # same set again, third source
                "delta epsilon",
                "zeta eta theta",
                "delta epsilon delta",     # same set as doc 3, source A
            ],
            "source": ["A", "B", "C", "A", "B", "A"],
        }
    )
    out = (
        source_overlap(ray.data.from_pandas(docs).repartition(3))
        .to_pandas()
        .sort_values(["source_a", "source_b"], ignore_index=True)
    )
    # {alpha,beta,gamma} shared by A,B,C -> 3 pairs; {delta,epsilon}
    # appears twice but only within A -> no pair
    assert out[["source_a", "source_b"]].values.tolist() == [
        ["A", "B"], ["A", "C"], ["B", "C"]
    ]
    assert out["n_shared"].tolist() == [1, 1, 1]


def test_vocab_jaccard_planted(ray_session):
    import pandas as pd
    import ray.data

    from kiezray.textops import vocab_jaccard

    docs = pd.DataFrame(
        {
            "text": ["a b c d", "c d e", "x y", "a b"],
            "source": ["S1", "S2", "S3", "S1"],
        }
    )
    out = vocab_jaccard(ray.data.from_pandas(docs).repartition(2))
    out = out.sort_values(["source_a", "source_b"], ignore_index=True)
    # S1 vocab {a,b,c,d}, S2 {c,d,e}, S3 {x,y}
    assert out[["source_a", "source_b"]].values.tolist() == [["S1", "S2"]]
    assert out["n_inter"].tolist() == [2]
    assert abs(out["jaccard"][0] - 2 / 5) < 1e-9


def test_bm25_topk_matches_bruteforce(ray_session):
    import math

    import pandas as pd
    import ray.data

    from kiezray.textops import bm25_topk

    rng = np.random.RandomState(13)
    vocab = ["fast", "join", "merge", "scan", "sort", "row", "col"]
    texts = [
        " ".join(rng.choice(vocab, rng.randint(3, 30)))
        for _ in range(200)
    ]
    docs = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                         "text": texts})
    terms = ("fast", "merge")
    got = bm25_topk(
        ray.data.from_pandas(docs).repartition(4), terms, k=10
    )
    # brute force
    toks = [t.split(" ") for t in texts]
    N = len(toks)
    avgdl = sum(len(t) for t in toks) / N
    scores = {}
    for term in terms:
        df = sum(1 for t in toks if term in t)
        idf = math.log((N - df + 0.5) / (df + 0.5) + 1)
        for i, t in enumerate(toks):
            tf = t.count(term)
            if tf:
                dl = len(t)
                scores[i] = scores.get(i, 0.0) + idf * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * dl / avgdl)
                )
    want = sorted(
        ((round(s, 6), i) for i, s in scores.items()),
        key=lambda p: (-p[0], p[1]),
    )[:10]
    assert got["doc_id"].tolist() == [i for _, i in want]
    np.testing.assert_allclose(
        got["score"].to_numpy(), [s for s, _ in want], atol=1e-9
    )


def test_ngram_containment_catches_embedded_doc():
    """A short doc whose text is a verbatim chunk of a longer doc has
    containment 1.0 but diluted jaccard — the containment metric must
    surface it from the same LSH candidate machinery."""
    import numpy as np
    import pyarrow as pa
    import ray

    from kiezray.dedup import ngram_jaccard_pairs

    rng = np.random.RandomState(12)
    base = "".join(rng.choice(list("abcdefgh "), 400))
    # chunk long enough to share LSH bands with the parent
    chunk = base[:260]
    others = [
        "".join(rng.choice(list("qrstuvwx "), 300)) for _ in range(20)
    ]
    texts = [base, chunk, *others]
    t = pa.table(
        {"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
         "text": pa.array(texts)}
    )
    got = ngram_jaccard_pairs(
        ray.data.from_arrow(t).repartition(3), "doc_id", "text",
        shingle_k=5, threshold=0.9, metric="containment",
    ).to_pandas()
    assert (0, 1) in set(zip(got["a"], got["b"]))
    row = got[(got["a"] == 0) & (got["b"] == 1)].iloc[0]
    assert row["containment"] > 0.95
    # sanity: the jaccard metric on the same corpus scores this pair low
    j = ngram_jaccard_pairs(
        ray.data.from_arrow(t).repartition(3), "doc_id", "text",
        shingle_k=5, threshold=0.9, metric="jaccard",
    ).to_pandas()
    # an all-empty result comes back with no columns at all
    assert len(j) == 0 or (0, 1) not in set(zip(j["a"], j["b"]))


def test_dedup_canonical_groups_case_punct_variants():
    """Planted case/punctuation/whitespace variants collapse to one
    survivor (min id) with the right copy count; empty canonicals drop."""
    import pandas as pd

    from kiezray.dedup import dedup_canonical

    df = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "Hello,   World!",
                "hello world",
                "HELLO-WORLD.",
                "a different doc",
                "A  different?? DOC",
                "unique one",
                "!!!",  # canonicalizes to empty -> dropped
                "第七",  # pure CJK -> empty under [^a-z0-9] -> dropped
            ],
        }
    )
    got = (
        dedup_canonical(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(got["doc_id"]) == [0, 3, 5]
    assert list(got["n_copies"]) == [3, 2, 1]


def test_batch_jaro_winkler_matches_duckdb_bitwise():
    import random

    import duckdb

    from kiezray.dedup import batch_jaro_winkler

    random.seed(9)
    pairs = [("", ""), ("a", ""), ("", "b"), ("ab", "ba"),
             ("martha", "marhta"), ("dixon", "dicksonx"),
             ("abcxxxxxx", "abcyyyyyy")]
    for _ in range(1500):
        a = "".join(random.choice("abcdef ") for _ in range(random.randint(0, 12)))
        bl = list(a)
        for _ in range(random.randint(0, 3)):
            if len(bl) > 1:
                i, j = random.randrange(len(bl)), random.randrange(len(bl))
                bl[i], bl[j] = bl[j], bl[i]
        pairs.append((a, "".join(bl)))
    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    want = np.array(
        [r[0] for r in
         con.sql("SELECT jaro_winkler_similarity(a, b) FROM p").fetchall()]
    )
    got = batch_jaro_winkler([p[0] for p in pairs], [p[1] for p in pairs])
    assert np.abs(got - want).max() == 0.0


def test_jw_pairs_blocked_join(ray_session):
    import pyarrow as pa
    import ray.data

    from kiezray.dedup import jw_pairs

    names = ["acme corp", "acme corp.", "acme inc", "zenith ltd",
             "zenith ltd", "beta llc"]
    ds = ray.data.from_arrow(pa.table({"name": pa.array(names)})).repartition(3)
    out = jw_pairs(ds, "name", block_chars=1, threshold=0.9).to_pandas()
    got = set(zip(out["name_a"], out["name_b"]))
    # distinct values only (the duplicate zenith collapses), blocked by
    # first char so acme/zenith never pair together
    assert ("acme corp", "acme corp.") in got
    assert all(a[0] == b[0] for a, b in got)
    assert not any("zenith" in a and "beta" in b for a, b in got)


def test_meta_blocking_prunes_and_keeps_planted_pair(ray_session):
    """A planted near-duplicate pair (shares many bigrams) must survive
    weighted node pruning; weights count shared purge-surviving
    bigram blocks; no pair exceeds the block cap's reach."""
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.block import meta_blocking

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, 12)) for _ in range(60)
    ]
    texts.append(texts[0] + " extra")  # planted near-dup of doc 0
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    out = meta_blocking(
        ray.data.from_pandas(df), cap=20
    ).to_pandas()
    planted = out[(out["a"] == 0) & (out["b"] == 60)]
    assert len(planted) == 1
    # the planted pair shares ~11 bigrams — it must carry the top weight
    assert planted["cbs"].iloc[0] == out["cbs"].max()


def test_batch_damerau_levenshtein_matches_duckdb_bitwise():
    """TRUE-DL kernel vs DuckDB damerau_levenshtein over adversarial
    fuzz pairs (small alphabets maximize transposition interactions)."""
    import random

    import duckdb
    import numpy as np
    import pandas as pd

    from kiezray.dedup import batch_damerau_levenshtein

    random.seed(7)
    pairs = []
    for alpha, count, maxlen in (("abcde", 2500, 12), ("ab", 2000, 9)):
        for _ in range(count):
            la, lb = random.randint(0, maxlen), random.randint(0, maxlen)
            pairs.append(
                ("".join(random.choice(alpha) for _ in range(la)),
                 "".join(random.choice(alpha) for _ in range(lb)))
            )
    pairs.extend([("", ""), ("a", ""), ("", "ab"), ("ca", "abc")])
    got = batch_damerau_levenshtein(
        np.array([p[0] for p in pairs], dtype=object),
        np.array([p[1] for p in pairs], dtype=object),
        chunk=1024,
    )
    df = pd.DataFrame(pairs, columns=["a", "b"])
    want = (
        duckdb.connect()
        .execute("SELECT damerau_levenshtein(a, b) FROM df")
        .df().iloc[:, 0].to_numpy()
    )
    assert (got == want).all()


def test_monge_elkan_invariants():
    """Kernel invariants beyond the SQL oracle: identity = 1.0, token
    reorder = 1.0 (the property whole-string JW lacks), and asymmetry
    with a hand-computed directed mean."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from kiezray.dedup import batch_jaro_winkler, monge_elkan_pairs

    names = [
        "alpha beta gamma",   # block key 'alpha'
        "alpha beta gamma",
        "alpha gamma beta",   # reorder of the same tokens
        "alpha zulu",         # partial overlap
    ]
    ds = ray.data.from_arrow(
        pa.table({"p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
                  "p_name": pa.array(names, pa.string())})
    )
    out = (
        monge_elkan_pairs(ds)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .set_index(["a_id", "b_id"])
    )
    assert out.loc[(1, 2), "me_ab"] == 1.0 and out.loc[(1, 2), "me_ba"] == 1.0
    assert out.loc[(1, 3), "me_ab"] == 1.0 and out.loc[(1, 3), "me_ba"] == 1.0
    # directed means vs an explicit per-token best-match fold
    a_toks, b_toks = names[0].split(" "), names[3].split(" ")
    me_ab = np.mean(
        [
            max(batch_jaro_winkler([ta] * len(b_toks), b_toks))
            for ta in a_toks
        ]
    )
    me_ba = np.mean(
        [
            max(batch_jaro_winkler([tb] * len(a_toks), a_toks))
            for tb in b_toks
        ]
    )
    assert abs(out.loc[(1, 4), "me_ab"] - me_ab) < 1e-12
    assert abs(out.loc[(1, 4), "me_ba"] - me_ba) < 1e-12
    assert out.loc[(1, 4), "me_ab"] != out.loc[(1, 4), "me_ba"]  # asymmetric


def test_tfidf_cosine_pairs_invariants():
    """Identity pairs score exactly 1.0; a pair sharing only the
    blocking token matches the hand-computed fixed-point cosine."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from kiezray.dedup import tfidf_cosine_pairs

    names = ["red soft wool", "red soft wool", "red hard steel", "blue x y"]
    ds = ray.data.from_arrow(
        pa.table({"p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
                  "p_name": pa.array(names, pa.string())})
    )
    out = (
        tfidf_cosine_pairs(ds)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .set_index(["a_id", "b_id"])
    )
    assert out.loc[(1, 2), "cos_sim"] == 1.0
    # hand fold for (1, 3): idf fixed-point exactly as the kernel does
    def wt(df, n=4, scale=1_000_000):
        x = np.log(n / df) * scale
        return int(np.copysign(np.floor(abs(x) + 0.5), x))
    w_red, w_pair, w_uniq = wt(3), wt(2), wt(1)
    dot = w_red * w_red
    n2_1 = w_red**2 + 2 * w_pair**2  # soft/wool appear in docs 1 AND 2
    n2_3 = w_red**2 + 2 * w_uniq**2  # hard/steel are unique to doc 3
    want = dot / np.sqrt(float(n2_1) * float(n2_3))
    assert abs(out.loc[(1, 3), "cos_sim"] - want) < 1e-12
    assert (4, 4) not in out.index  # singleton block emits no pairs


def test_semantic_dedup_planted_pairs_and_determinism():
    """SemDeDup: every planted near-identical pair loses exactly one
    member, clean rows all survive, and the output is identical under a
    different partitioning."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from kiezray.dedup import semantic_dedup

    rng = np.random.RandomState(3)
    n, dim, n_dup = 240, 16, 24
    base = rng.randn(n, dim)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = base[:n_dup] + rng.randn(n_dup, dim) * 1e-4
    mat = np.vstack([base, dups])
    ids = np.arange(len(mat), dtype=np.int64)
    tbl = pa.table(
        {
            "row_id": pa.array(ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype(np.float32).ravel(), pa.float32()), dim
            ),
        }
    )

    def run(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out = semantic_dedup(
            ds, id_col="row_id", emb_col="embedding",
            n_clusters=6, threshold=0.98, iters=6, seed=11,
        ).to_pandas().sort_values("row_id").reset_index(drop=True)
        return out

    out = run(4)
    keep = out.set_index("row_id")["keep"]
    for i in range(n_dup):
        # the pair (i, n+i) is near-identical: exactly the min id stays
        assert bool(keep[i]) and not bool(keep[n + i]), i
    # clean rows (cosine of independent 16-dim gaussians never reaches
    # 0.98) all survive
    assert keep[np.arange(n_dup, n)].all()
    out2 = run(9)
    assert out.equals(out2)


def test_semantic_dedup_chunked_oversized_cluster():
    """max_cluster chunking keeps the stage bounded and deterministic;
    a duplicate adjacent in centroid-distance order is still caught."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from kiezray.dedup import semantic_dedup

    rng = np.random.RandomState(5)
    base = rng.randn(60, 8)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    mat = np.vstack([base, base[:10] + rng.randn(10, 8) * 1e-5])
    tbl = pa.table(
        {
            "row_id": pa.array(np.arange(len(mat)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype(np.float32).ravel(), pa.float32()), 8
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = semantic_dedup(
        ds, id_col="row_id", emb_col="embedding", n_clusters=1,
        threshold=0.98, iters=2, seed=0, max_cluster=16,
    ).to_pandas().sort_values("row_id").reset_index(drop=True)
    assert len(out) == len(mat)
    # near-identical pairs sit adjacent in centroid-distance order, so
    # chunking still pairs them; exactly one of each survives
    keep = out.set_index("row_id")["keep"]
    caught = sum(
        1 for i in range(10) if bool(keep[i]) != bool(keep[60 + i])
    )
    assert caught == 10


def test_semantic_dedup_degenerate_cluster_cross_chunk():
    """VERDICT r4 item 2: duplicates that straddle max_cluster chunks of
    ONE inseparable (all-identical) cluster must still be caught — the
    old chunked prune kept one representative PER CHUNK. 200 identical
    vectors with max_cluster=32 must yield exactly ONE keeper (the min
    id), deterministically under different partitionings."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from kiezray.dedup import semantic_dedup

    rng = np.random.RandomState(17)
    v = rng.randn(8)
    v /= np.linalg.norm(v)
    clump = np.tile(v, (200, 1))            # one inseparable clump
    tail = rng.randn(20, 8)
    tail /= np.linalg.norm(tail, axis=1, keepdims=True)
    mat = np.vstack([clump, tail])
    tbl = pa.table(
        {
            "row_id": pa.array(np.arange(len(mat)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype(np.float32).ravel(), pa.float32()), 8
            ),
        }
    )

    def run(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        return semantic_dedup(
            ds, id_col="row_id", emb_col="embedding", n_clusters=2,
            threshold=0.98, iters=3, seed=0, max_cluster=32,
        ).to_pandas().sort_values("row_id").reset_index(drop=True)

    out = run(3)
    keep = out.set_index("row_id")["keep"]
    # exactly one survivor of the 200-clump, and it is the minimum id
    assert bool(keep[0])
    assert keep[np.arange(1, 200)].sum() == 0
    # independent gaussians never reach 0.98 cosine: tail all survives
    assert keep[np.arange(200, 220)].all()
    out2 = run(7)
    assert out.equals(out2)


def test_semantic_dedup_fallback_keeps_min_id_not_centroid_nearest():
    """Code-review r5: the oversized-cluster greedy fallback must keep
    the MINIMUM id of an inseparable clump — not the min id of the
    centroid-nearest chunk. 200 NEAR-identical (not byte-identical)
    vectors where id 0 carries the largest perturbation (farthest from
    the centroid): under (dist, id) chunk ordering id 0 landed in a late
    chunk and was dropped as near an earlier survivor; id-ascending
    ordering keeps exactly id 0. split_depth=0 forces the fallback."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from kiezray.dedup import semantic_dedup

    rng = np.random.RandomState(29)
    v = rng.randn(8)
    v /= np.linalg.norm(v)
    noise = rng.randn(200, 8) * 1e-5
    noise[0] = rng.randn(8) * 1e-3  # id 0: farthest from the centroid
    clump = v + noise
    norm = clump / np.linalg.norm(clump, axis=1, keepdims=True)
    sim = norm @ norm.T
    assert sim.min() > 0.98  # one mutually-similar component
    tail = rng.randn(20, 8)
    tail /= np.linalg.norm(tail, axis=1, keepdims=True)
    mat = np.vstack([clump, tail])
    tbl = pa.table(
        {
            "row_id": pa.array(np.arange(len(mat)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype(np.float64).ravel(), pa.float64()), 8
            ),
        }
    )

    def run(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        return semantic_dedup(
            ds, id_col="row_id", emb_col="embedding", n_clusters=2,
            threshold=0.98, iters=3, seed=0, max_cluster=32,
            split_depth=0,
        ).to_pandas().sort_values("row_id").reset_index(drop=True)

    out = run(3)
    keep = out.set_index("row_id")["keep"]
    assert bool(keep[0])                       # min id survives
    assert keep[np.arange(1, 200)].sum() == 0  # everyone else dropped
    assert keep[np.arange(200, 220)].all()     # clean tail untouched
    assert out.equals(run(7))


def test_semantic_dedup_hot_cluster_splits_to_bounded_groups():
    """A SEPARABLE hot cluster (two far-apart blobs forced into one
    k-means cluster by n_clusters=1) is recursively re-k-means'd: the
    final cluster ids show the split (ids >= n_clusters), every planted
    near-identical pair still loses exactly its higher id, and clean
    rows survive."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from kiezray.dedup import semantic_dedup

    rng = np.random.RandomState(23)
    blob_a = rng.randn(30, 8) * 1.0 + np.array([10.0] + [0.0] * 7)
    blob_b = rng.randn(30, 8) * 1.0 - np.array([10.0] + [0.0] * 7)
    base = np.vstack([blob_a, blob_b])
    dups = base[:10] * (1.0 + 1e-6)  # scaled copies: cosine == 1
    mat = np.vstack([base, dups])
    # distinct blob members stay far below the threshold
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sim = norm[:60] @ norm[:60].T
    np.fill_diagonal(sim, 0.0)
    assert sim.max() < 0.9999
    tbl = pa.table(
        {
            "row_id": pa.array(np.arange(len(mat)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype(np.float64).ravel(), pa.float64()), 8
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = semantic_dedup(
        ds, id_col="row_id", emb_col="embedding", n_clusters=1,
        threshold=0.9999, iters=3, seed=1, max_cluster=48,
    ).to_pandas().sort_values("row_id").reset_index(drop=True)
    keep = out.set_index("row_id")["keep"]
    for i in range(10):
        assert bool(keep[i]) and not bool(keep[60 + i]), i
    assert keep[np.arange(10, 60)].all()
    # the hot cluster actually split: sub-cluster ids >= n_clusters and
    # every final group is within max_cluster
    assert (out["cluster"] >= 1).all()
    assert out.groupby("cluster").size().max() <= 48


def test_dup_span_stats_planted_and_partition_invariant():
    """Exact-substring removal pass: a shared 6-token run planted in two
    docs covers exactly those positions in the HIGHER doc_id (keeper =
    min doc), spans merge across overlapping grams, clean docs report
    zero, and output is identical under different partitioning."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from kiezray.textops import dup_span_stats

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    docs = [
        (0, f"{shared} one two three"),            # keeper of the run
        (1, f"x y {shared} tail"),                 # dup: positions 2..7
        (2, "totally unrelated words here only"),  # clean
        (3, f"p q r {shared}"),                    # dup: positions 3..8
        (4, ""),                                   # empty -> 1 ws-token
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }
    )

    def run(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        return (
            dup_span_stats(ds, L=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    out = run(1)
    by = out.set_index("doc_id")
    # doc 0 is the keeper: nothing marked
    assert by.loc[0, "dup_tokens"] == 0 and by.loc[0, "n_spans"] == 0
    # doc 1: the 6 shared tokens (two overlapping 5-gram starts) = one
    # merged span of 6 positions
    assert by.loc[1, "dup_tokens"] == 6 and by.loc[1, "n_spans"] == 1
    assert abs(by.loc[1, "dup_frac"] - 6 / 9) < 1e-12
    # doc 3: same shared run at the end
    assert by.loc[3, "dup_tokens"] == 6 and by.loc[3, "n_spans"] == 1
    # clean + short docs untouched
    assert by.loc[2, "dup_tokens"] == 0
    assert by.loc[4, "n_tokens"] == 1 and by.loc[4, "dup_tokens"] == 0
    out2 = run(4)
    assert out.equals(out2)


def test_dup_span_stats_return_text_cuts_spans():
    """return_text=True: covered spans are cut, survivors re-join with
    single spaces, a fully-duplicated doc becomes ''."""
    import pyarrow as pa
    import ray.data

    from kiezray.textops import dup_span_stats

    shared = "alpha beta gamma delta epsilon"  # exactly L=5 tokens
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [f"{shared} extra", f"pre {shared} post", shared],
                pa.string(),
            ),
        }
    )
    out = (
        dup_span_stats(
            ray.data.from_arrow(tbl).repartition(2), L=5, return_text=True
        )
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out.loc[0, "clean_text"] == f"{shared} extra"  # keeper intact
    assert out.loc[1, "clean_text"] == "pre post"
    assert out.loc[2, "clean_text"] == ""  # fully covered


def test_dup_span_stats_join_transport_parity():
    """transport='join' (distributed dup-gram table, no broadcast) is
    byte-identical to the broadcast tier on planted data."""
    import pyarrow as pa
    import ray.data

    from kiezray.textops import dup_span_stats

    shared = "alpha beta gamma delta epsilon zeta"
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    f"{shared} one two three",
                    f"x y {shared} tail",
                    "totally unrelated words here only",
                    f"p q r {shared}",
                ],
                pa.string(),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    a = (
        dup_span_stats(ds, L=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dup_span_stats(ds, L=5, transport="join")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b[a.columns].reset_index(drop=True))
    assert a.loc[1, "dup_tokens"] == 6  # the planted span is found


def test_dup_span_stats_join_return_text_parity():
    """transport='join' with return_text=True (the distributed Lee-et-al
    removal pass) is byte-identical to the broadcast tier: same stats,
    same clean_text — including multi-span docs, a fully-covered doc
    and a clean corpus."""
    import pyarrow as pa
    import ray.data

    from kiezray.textops import dup_span_stats

    run_a = "alpha beta gamma delta epsilon"          # 5 tokens (L=5)
    run_b = "one two three four five six"             # 6 tokens
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    f"{run_a} mid {run_b}",            # keeper of both
                    f"pre {run_a} gap gap {run_b} post",  # two spans
                    run_a,                              # fully covered
                    "entirely novel words appearing nowhere else here",
                    "",                                 # empty doc
                ],
                pa.string(),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    a = (
        dup_span_stats(ds, L=5, return_text=True)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dup_span_stats(ds, L=5, return_text=True, transport="join")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b[a.columns].reset_index(drop=True))
    by = a.set_index("doc_id")
    assert by.loc[1, "n_spans"] == 2
    assert by.loc[1, "clean_text"] == "pre gap gap post"
    assert by.loc[2, "clean_text"] == ""  # fully covered

    # clean corpus: join tier short-circuit also carries clean_text
    clean_tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                ["totally unique words here", "other  spaced \t tokens"],
                pa.string(),
            ),
        }
    )
    cds = ray.data.from_arrow(clean_tbl).repartition(2)
    ca = (
        dup_span_stats(cds, L=5, return_text=True)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    cb = (
        dup_span_stats(cds, L=5, return_text=True, transport="join")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert ca.equals(cb[ca.columns].reset_index(drop=True))
    # whitespace normalization survives the no-dup path
    assert ca.set_index("doc_id").loc[1, "clean_text"] == (
        "other spaced tokens"
    )


def test_curation_planted_rules():
    """Each curation rule fires on its planted violator and the keep
    flag is their conjunction; output is partition-invariant."""
    import pyarrow as pa
    import ray.data

    from kiezray.pipelines.curation import CurationConfig, run_curation

    good = (
        "the quick brown fox jumps over a lazy dog and runs far away "
        "of the hill is bright today with many different shining words"
    )
    docs = [
        (0, good + " extra unique tail one"),          # keeper, passes all
        (2, "der hund und die katze und das haus ist gross und schoen da"),  # wrong lang
        (4, "spam spam spam spam spam spam spam spam spam spam spam"),  # repetition
        (6, good + " extra unique tail one"),          # exact dup of 0
        (8, "a b"),                                    # too short -> quality
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }
    )

    def run(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        cfg = CurationConfig(probe_min_chars=10**6)  # no probes
        return (
            run_curation(ds, cfg)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    out = run(2).set_index("doc_id")
    assert out.loc[0, "keep"] == 1
    assert out.loc[2, "lang_ok"] == 0 and out.loc[2, "keep"] == 0
    assert out.loc[4, "repetition_ok"] == 0 and out.loc[4, "keep"] == 0
    assert out.loc[6, "keep_dedup"] == 0 and out.loc[6, "keep"] == 0
    assert out.loc[8, "quality_ok"] == 0 and out.loc[8, "keep"] == 0
    assert (out["contaminated"] == 0).all()
    out2 = run(4).set_index("doc_id")
    assert out.equals(out2)


def test_curation_checkpoint_resume(tmp_path):
    """VERDICT r4 item 4: run_curation stages write through
    lineage.run_stage — the second run reuses the completed fused-scan
    checkpoint byte-for-byte, a deleted verdict stage recomputes from
    the flags checkpoint, and a changed corpus invalidates everything
    (input-addressed fingerprints)."""
    import os
    import shutil

    import pyarrow as pa
    import ray.data

    from kiezray.lineage import read_manifests
    from kiezray.pipelines.curation import CurationConfig, run_curation

    good = (
        "the quick brown fox jumps over a lazy dog and runs far away "
        "of the hill is bright today with many different shining words"
    )
    docs = [
        (0, good + " unique tail one"),
        (2, "der hund und die katze und das haus ist gross und schoen da"),
        (4, good + " unique tail one"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    ck = str(tmp_path / "ckpt")
    cfg = CurationConfig(probe_min_chars=10**6, checkpoint_dir=ck)
    out1 = (
        run_curation(ds, cfg)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    flags_manifest = os.path.join(ck, "stage=curation_flags", "_lineage.json")
    mtime1 = os.path.getmtime(flags_manifest)

    # crash after the scan: blow away the verdict, rerun — the fused
    # scan checkpoint is reused untouched
    shutil.rmtree(os.path.join(ck, "stage=curation_verdict"))
    out2 = (
        run_curation(ds, cfg)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert os.path.getmtime(flags_manifest) == mtime1  # stage skipped
    assert out1.equals(out2)
    mans = read_manifests(ck)
    assert set(mans) == {"curation_flags", "curation_verdict"}
    assert all(
        sum(p["rows"] for p in m["partitions"]) == m["row_count"]
        for m in mans.values()
    )

    # corpus edit ⇒ input-addressed fingerprint changes ⇒ full recompute
    tbl2 = tbl.set_column(
        1, "text", pa.array([t + " edited" for _, t in docs], pa.string())
    )
    run_curation(ray.data.from_arrow(tbl2).repartition(2), cfg)
    assert os.path.getmtime(flags_manifest) != mtime1


def test_dup_span_stats_clean_corpus_both_transports():
    """A corpus with zero duplicated grams returns all-zero stats in
    both transports (regression: the empty dup table used to lose its
    schema and crash both the driver pull and the gram join)."""
    import pyarrow as pa
    import ray.data

    from kiezray.textops import dup_span_stats

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "all docs totally different words one",
                    "second document with other completely fresh tokens",
                    "third text nothing shared anywhere at all",
                ],
                pa.string(),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    for tr in ("broadcast", "join"):
        out = (
            dup_span_stats(ds, L=5, transport=tr)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert len(out) == 3
        assert (out["dup_tokens"] == 0).all() and (out["n_spans"] == 0).all()
        assert out["n_tokens"].tolist() == [6, 7, 7]


def test_semantic_dedup_degenerate_inputs():
    """All-identical vectors collapse to one survivor (min id); a
    single-row corpus survives; k larger than distinct points is fine."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from kiezray.dedup import semantic_dedup

    mat = np.tile(np.array([[1.0, 0, 0, 0]], dtype=np.float32), (5, 1))
    tbl = pa.table(
        {
            "row_id": pa.array(np.arange(5), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), pa.float32()), 4
            ),
        }
    )
    out = (
        semantic_dedup(
            ray.data.from_arrow(tbl), id_col="row_id", emb_col="embedding",
            n_clusters=8, threshold=0.9, iters=2, seed=0,
        )
        .to_pandas()
        .sort_values("row_id")
    )
    assert out["keep"].tolist() == [True, False, False, False, False]

    one = pa.table(
        {
            "row_id": pa.array([7], pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array([1.0, 0, 0, 0], pa.float32()), 4
            ),
        }
    )
    out1 = semantic_dedup(
        ray.data.from_arrow(one), id_col="row_id", emb_col="embedding",
        n_clusters=4, threshold=0.9, iters=2, seed=0,
    ).to_pandas()
    assert out1["keep"].tolist() == [True]
