"""Property-based tests (hypothesis) for the pure kernels.

These complement the fixed-grid conformance tests with randomized
invariants: the vectorized implementations must agree with naive
straight-line equivalents on arbitrary inputs, not just the fixtures.
Ray-free by design (kernel-level), so they run fast.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from kiezray.arrowutil import round_away
from kiezray.index import _scatter_topk
from kiezray.rerank import topk_sorted

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(
    dist=arrays(np.float64, (5, 7), elements=finite),
    k=st.integers(min_value=1, max_value=9),
)
@settings(max_examples=60, deadline=None)
def test_topk_sorted_matches_naive(dist, k):
    ind = np.arange(100, 100 + dist.shape[1], dtype=np.int64)
    ind = np.tile(ind, (dist.shape[0], 1))
    d, i = topk_sorted(dist, ind, k)
    kk = min(k, dist.shape[1])
    for r in range(dist.shape[0]):
        naive = sorted(zip(dist[r], ind[r]))[:kk]
        assert list(d[r]) == [x for x, _ in naive]
        assert list(i[r]) == [y for _, y in naive]


@given(
    n=st.integers(min_value=1, max_value=6),
    k=st.integers(min_value=1, max_value=5),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_scatter_topk_matches_naive(n, k, data):
    n_cand = data.draw(st.integers(min_value=0, max_value=30))
    cand_q = np.array(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=n - 1),
                min_size=n_cand,
                max_size=n_cand,
            )
        ),
        dtype=np.int64,
    )
    cand_d = np.array(
        data.draw(st.lists(finite, min_size=n_cand, max_size=n_cand))
    )
    cand_i = np.array(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=50),
                min_size=n_cand,
                max_size=n_cand,
            )
        ),
        dtype=np.int64,
    )
    d, i = _scatter_topk(cand_q, cand_d, cand_i, n, k)
    for r in range(n):
        sel = cand_q == r
        naive = sorted(zip(cand_d[sel], cand_i[sel]))[:k]
        got_d = [x for x in d[r] if not np.isnan(x)]
        got_i = [x for x in i[r] if x >= 0]
        assert got_d == [x for x, _ in naive]
        assert got_i == [y for _, y in naive]


@given(
    vals=st.lists(finite, min_size=1, max_size=50),
    digits=st.sampled_from([2, 4, 6]),
)
@settings(max_examples=60, deadline=None)
def test_round_away_matches_duckdb_property(vals, digits):
    import duckdb

    con = duckdb.connect()
    duck = np.array(
        con.sql(
            f"select list_transform($1::DOUBLE[], y -> round(y, {digits}))",
            params=[vals],
        ).fetchone()[0]
    )
    mine = round_away(np.array(vals), digits)
    assert (mine == duck).all()


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=1000),
            max_size=60,
        ),
        min_size=0,
        max_size=12,
    )
)
@settings(max_examples=40, deadline=None)
def test_batch_minhash_matches_per_doc(texts):
    from kiezray.dedup import MinHasher, batch_minhash

    h = MinHasher(num_perm=16, shingle_k=3)
    batch = batch_minhash(texts, h.a, h.b, 3)
    for i, t in enumerate(texts):
        single = h.signature(t or "")
        np.testing.assert_array_equal(batch[i], single)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=1000),
            max_size=60,
        ),
        min_size=0,
        max_size=12,
    )
)
@settings(max_examples=40, deadline=None)
def test_batch_simhash_matches_per_doc(texts):
    from kiezray.dedup import SimHasher

    h = SimHasher()
    batch = h.batch_simhash(texts)
    for i, t in enumerate(texts):
        assert batch[i] == h.batch_simhash([t])[0]


@given(
    data=st.data(),
    nr=st.integers(min_value=0, max_value=40),
    nq=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=60, deadline=None)
def test_lex_insert_pos_matches_searchsorted(data, nr, nq):
    """The 2-key lexicographic merge-search (range_join's kernel) must
    agree with numpy searchsorted over an explicitly packed composite
    key (safe to pack here: both keys are tiny by construction)."""
    from kiezray.relops import _lex_insert_pos

    small = st.integers(min_value=-8, max_value=8)
    rk = np.array(data.draw(st.lists(small, min_size=nr, max_size=nr)), dtype=np.int64)
    rt = np.array(data.draw(st.lists(small, min_size=nr, max_size=nr)), dtype=np.int64)
    qk = np.array(data.draw(st.lists(small, min_size=nq, max_size=nq)), dtype=np.int64)
    qt = np.array(data.draw(st.lists(small, min_size=nq, max_size=nq)), dtype=np.int64)
    order = np.lexsort((rt, rk))
    rk_s, rt_s = rk[order], rt[order]
    packed_r = rk_s * 1000 + rt_s
    packed_q = qk * 1000 + qt
    for side in ("left", "right"):
        got = _lex_insert_pos(rk_s, rt_s, qk, qt, side)
        want = np.searchsorted(packed_r, packed_q, side=side)
        np.testing.assert_array_equal(got, want)
