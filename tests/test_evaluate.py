"""Evaluation metric tests (mirrors reference tests/evaluate/test_eval_metrics.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kiezray.arrowutil import matrix_to_list
from kiezray.evaluate import hits, hits_ds, pairwise_scores

NN_IND = np.array([[1, 2, 3], [2, 3, 4], [3, 4, 5], [4, 5, 6]])
GOLD = {0: 2, 1: 4, 2: 3, 3: 4}


def test_hits_reference_values():
    assert hits(NN_IND, GOLD, k=[1, 2, 3]) == {1: 0.5, 2: 0.75, 3: 1.0}


def test_hits_default_k():
    res = hits(NN_IND, GOLD)
    assert res == {1: 0.5, 5: 1.0, 10: 1.0}


def test_hits_dict_variant():
    nn = {i: list(NN_IND[i]) for i in range(4)}
    assert hits(nn, GOLD, k=[1, 2, 3]) == {1: 0.5, 2: 0.75, 3: 1.0}


def test_hits_ds_matches():
    tbl = pa.table(
        {
            "query_id": pa.array(np.arange(4, dtype=np.int64)),
            "neigh_ids": matrix_to_list(NN_IND.astype(np.int64), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    assert hits_ds(ds, GOLD, k=[1, 2, 3]) == {1: 0.5, 2: 0.75, 3: 1.0}


def test_pairwise_scores():
    pred = {"a": 1, "b": 1, "c": 2, "d": 2}
    gold = {"a": "x", "b": "x", "c": "x", "d": "y"}
    res = pairwise_scores(pred, gold)
    # pred pairs {ab, cd}; gold pairs {ab, ac, bc}; tp = {ab}
    assert res["tp"] == 1
    assert res["precision"] == pytest.approx(0.5)
    assert res["recall"] == pytest.approx(1 / 3)
    assert res["f1"] == pytest.approx(2 * 0.5 * (1 / 3) / (0.5 + 1 / 3))


def test_pairwise_restricted():
    pred = {"a": 1, "b": 1, "c": 2, "d": 2}
    gold = {"a": "x", "b": "x", "c": "x", "d": "y"}
    res = pairwise_scores(pred, gold, restrict_pairs={("a", "b"), ("c", "d")})
    assert res["gold_pairs"] == 1 and res["pred_pairs"] == 2
    assert res["recall"] == 1.0


def test_mutual_best_selects_exactly_the_reciprocal_pairs():
    """Planted geometry: mutual pairs are exactly the reciprocal top-1
    links of the brute-force distance matrix."""
    import numpy as np

    from kiezray.evaluate import mutual_best
    from kiezray.kiez import Kiez

    rng = np.random.RandomState(9)
    src = rng.rand(60, 8)
    tgt = rng.rand(80, 8)

    def k1(a, b):
        kz = Kiez(n_candidates=1, algorithm="exact",
                  algorithm_kwargs={"metric": "euclidean"})
        kz.fit(a, b)
        return kz.kneighbors_dataset(1)

    got = mutual_best(k1(src, tgt), k1(tgt, src)).to_pandas()
    d = np.sqrt(((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1))
    s_best = d.argmin(1)
    t_best = d.argmin(0)
    want = {(s, s_best[s]) for s in range(60) if t_best[s_best[s]] == s}
    assert set(zip(got["source_id"], got["target_id"])) == want
    assert (got["dist"].to_numpy() >= 0).all()


def test_binary_auc_bruteforce_with_ties():
    """Tie-aware AUC matches the O(n^2) pair definition."""
    import pandas as pd

    from kiezray.evaluate import binary_auc

    rng = np.random.RandomState(5)
    n = 400
    score = rng.randint(0, 40, n).astype(np.int64)  # heavy ties
    pos = rng.rand(n) < (0.2 + 0.6 * (score / 40.0))  # informative
    df = pd.DataFrame({"s": score, "y": pos})
    got = binary_auc(ray.data.from_pandas(df).repartition(4), "s", "y")
    sp, sn = score[pos], score[~pos]
    wins = (sp[:, None] > sn[None, :]).sum()
    ties = (sp[:, None] == sn[None, :]).sum()
    want = (wins + 0.5 * ties) / (len(sp) * len(sn))
    assert abs(got["auc"].iloc[0] - want) < 1e-6
    assert got["n_pos"].iloc[0] == int(pos.sum())
    assert got["n_neg"].iloc[0] == int((~pos).sum())


def test_fellegi_sunter_weight_sums(ray_session):
    import pyarrow as pa
    import ray.data

    from kiezray.evaluate import fellegi_sunter

    pairs = ray.data.from_arrow(
        pa.table({"a_id": pa.array([1, 1], pa.int64()),
                  "b_id": pa.array([2, 3], pa.int64())})
    )
    recs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "lang": pa.array(["en", "en", "de"]),
                "n_chars": pa.array([100, 105, 200], pa.int64()),
            }
        )
    )
    out = (
        fellegi_sunter(
            pairs, recs, "doc_id",
            {"lang": (1.0, -2.0)}, len_field=("n_chars", (0.5, -0.25)),
        )
        .to_pandas()
        .sort_values("b_id")
        .reset_index(drop=True)
    )
    # pair (1,2): lang agrees, |100-105|*10=50 <= 105 agrees -> 1.5
    # pair (1,3): lang disagrees, |100-200|*10 > 200 -> -2.25
    assert list(out["agree_lang"]) == [1, 0]
    assert list(out["agree_n_chars"]) == [1, 0]
    assert list(out["score"]) == [1.5, -2.25]


def test_stable_matching_equals_gale_shapley_and_is_stable(ray_session):
    """Distributed deferred acceptance == classic sequential G-S
    (proposer-optimal matching is unique), and the result admits no
    blocking pair."""
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.evaluate import stable_matching

    rng = np.random.RandomState(3)
    rows = []
    for a in range(40):
        bs = rng.choice(100, size=rng.randint(1, 8), replace=False)
        for b in bs:
            rows.append((a, 1000 + int(b), float(rng.randint(1, 50))))
    df = pd.DataFrame(rows, columns=["a_id", "b_id", "score"])
    df = df.drop_duplicates(["a_id", "b_id"])

    # sequential Gale-Shapley oracle: prefs (score desc, id asc)
    prefs = {
        a: list(
            g.sort_values(["score", "b_id"], ascending=[False, True])
            .itertuples(index=False)
        )
        for a, g in df.groupby("a_id")
    }
    pair_score = {(r.a_id, r.b_id): r.score
                  for r in df.itertuples(index=False)}
    ptr = {a: 0 for a in prefs}
    engaged = {}  # b -> (score, a)
    free = sorted(prefs)
    while free:
        a = free.pop(0)
        if ptr[a] >= len(prefs[a]):
            continue
        cand = prefs[a][ptr[a]]
        ptr[a] += 1
        b, s = cand.b_id, cand.score
        cur = engaged.get(b)
        if cur is None or (s, -a) > (cur[0], -cur[1]):
            if cur is not None:
                free.append(cur[1])
            engaged[b] = (s, a)
        else:
            free.append(a)
        free.sort()
    want = sorted((a, b) for b, (s, a) in engaged.items())

    got_df = stable_matching(
        ray.data.from_pandas(df.sample(frac=1, random_state=9))
    ).to_pandas()
    got = sorted(zip(got_df["a_id"], got_df["b_id"]))
    assert got == want

    # stability: no (a, b) candidate pair where both would defect
    match_of_a = {a: b for a, b in got}
    best_of_b = {b: pair_score[(a, b)] for a, b in got}
    for r in df.itertuples(index=False):
        a, b, s = r.a_id, r.b_id, r.score
        if match_of_a.get(a) == b:
            continue
        a_cur = (
            pair_score[(a, match_of_a[a])] if a in match_of_a else -1
        )
        b_cur = best_of_b.get(b, -1)
        # blocking pair: a strictly prefers b AND b strictly prefers a
        assert not (s > a_cur and s > b_cur), (a, b, s, a_cur, b_cur)
