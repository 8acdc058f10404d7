"""End-to-end ER pipeline tests: F1 conformance, span invariance, resume."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kiezray.evaluate import pairwise_scores
from kiezray.pipelines.er import ERConfig, oracle_clusters, run_er
from kiezray.synth import docs_from_plain_text, generate_docs


@pytest.fixture(scope="module")
def small_docs():
    docs, gold_clusters, gold_links = generate_docs(
        n_entities=40, seed=42, hub_entities=1, hub_copies=12
    )
    return docs, gold_clusters, gold_links


@pytest.fixture(scope="module")
def er_out(small_docs, tmp_path_factory):
    """One checkpointed pipeline run shared by the inspection tests."""
    docs, _, _ = small_docs
    ds = ray.data.from_arrow(docs).repartition(4)
    ck = str(tmp_path_factory.mktemp("er_ckpt"))
    cfg = ERConfig(checkpoint_dir=ck)
    return run_er(ds, cfg), cfg, ck


def _gold_map(gold_clusters: pa.Table) -> dict:
    return dict(
        zip(
            gold_clusters["doc_id"].to_pylist(),
            gold_clusters["entity_id"].to_pylist(),
        )
    )


def test_generator_deterministic():
    d1, c1, l1 = generate_docs(n_entities=10, seed=7)
    d2, c2, l2 = generate_docs(n_entities=10, seed=7)
    assert d1.equals(d2) and c1.equals(c2) and l1.equals(l2)
    d3, _, _ = generate_docs(n_entities=10, seed=8)
    assert not d3.equals(d1)


def test_span_sequence_invariant(small_docs, er_out):
    """Per-row span-sequence equality through embed + pipeline carry."""
    docs, _, _ = small_docs
    out, _, _ = er_out
    emb_tbl = pa.concat_tables(
        ray.get(out["embedded"].to_arrow_refs())
    ).combine_chunks()
    want = {
        d: s for d, s in zip(docs["doc_id"].to_pylist(), docs["spans"].to_pylist())
    }
    got = {
        d: s
        for d, s in zip(
            emb_tbl["doc_id"].to_pylist(), emb_tbl["spans"].to_pylist()
        )
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], f"span sequence changed for {k}"


def test_er_f1_vs_oracle_and_gold(small_docs, er_out):
    """North-rule conformance: pairwise F1 >= 0.99 vs the exact-search
    oracle on labeled pairs sharing a blocking key; high F1 vs gold."""
    docs, gold_clusters, _ = small_docs
    ds = ray.data.from_arrow(docs).repartition(4)
    out, cfg, _ = er_out
    pred_tbl = out["clusters"].to_pandas()
    pred = dict(zip(pred_tbl["doc_id"], pred_tbl["cluster_id"]))
    assert len(pred) == len(docs)

    oracle = oracle_clusters(docs, cfg)

    # labeled-pair universe: gold pairs that share >= 1 blocking key
    from kiezray.block import blocking_keys
    from kiezray.embed import embed_docs

    keys = blocking_keys(embed_docs(ds, cfg.dim), bands=cfg.bands,
                         rows_per_band=cfg.rows_per_band,
                         shingle_k=cfg.shingle_k, seed=cfg.seed,
                         carry_cols=()).to_pandas()
    by_key: dict = {}
    for d, k in zip(keys["doc_id"], keys["block_key"]):
        by_key.setdefault(k, []).append(d)
    shared = set()
    for members in by_key.values():
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                shared.add((ms[i], ms[j]))

    res = pairwise_scores(pred, oracle, restrict_pairs=shared)
    assert res["f1"] >= 0.99, res

    gold = _gold_map(gold_clusters)
    res_gold = pairwise_scores(pred, gold)
    assert res_gold["f1"] >= 0.9, res_gold


def test_checkpoint_resume(small_docs, tmp_path):
    """Stage-level resume: second run reuses completed stages byte-for-byte
    and later stages can be recomputed after deletion."""
    docs, _, _ = small_docs
    ds = ray.data.from_arrow(docs).repartition(2)
    ck = str(tmp_path / "ckpt")
    cfg = ERConfig(checkpoint_dir=ck)
    out1 = run_er(ds, cfg)
    c1 = out1["clusters"].to_pandas().sort_values("doc_id").reset_index(drop=True)
    embed_manifest = os.path.join(ck, "stage=embed", "_lineage.json")
    mtime1 = os.path.getmtime(embed_manifest)

    # simulate a crash after stage 2: blow away pairs+clusters AND two of
    # the per-partition scoring shards, rerun — only those shards recompute
    import shutil

    shard0_manifest = os.path.join(
        ck, "stage=pairs_scored.shard0000", "_lineage.json"
    )
    shard0_mtime = os.path.getmtime(shard0_manifest)
    shutil.rmtree(os.path.join(ck, "stage=pairs_scored.shard0003"))
    shutil.rmtree(os.path.join(ck, "stage=pairs_scored.shard0005"))
    shutil.rmtree(os.path.join(ck, "stage=pairs"))
    shutil.rmtree(os.path.join(ck, "stage=clusters"))
    out2 = run_er(ds, cfg)
    c2 = out2["clusters"].to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert os.path.getmtime(embed_manifest) == mtime1  # stage skipped
    assert os.path.getmtime(shard0_manifest) == shard0_mtime  # shard skipped
    assert c1.equals(c2)

    from kiezray.lineage import read_manifests

    mans = read_manifests(ck)
    assert set(mans) == {"embed", "block", "pairs", "clusters"} | {
        f"pairs_scored.shard{i:04d}" for i in range(8)
    }
    assert all(m["row_count"] >= 0 for m in mans.values())
    assert sum(m["row_count"] for k, m in mans.items() if "shard" in k) > 0
    # per-partition lineage: every manifest itemizes its output files and
    # the per-file rows sum to the stage row count
    for m in mans.values():
        assert sum(p["rows"] for p in m["partitions"]) == m["row_count"]
        assert all(p["bytes"] > 0 for p in m["partitions"])


def test_hub_block_is_split(small_docs):
    """The hub entity's oversized block must be salted below max_block."""
    docs, _, _ = small_docs
    ds = ray.data.from_arrow(docs)
    from kiezray.block import block_histogram, blocking_keys, split_oversized_blocks
    from kiezray.embed import embed_docs

    keys = blocking_keys(embed_docs(ds, 512), carry_cols=())
    split = split_oversized_blocks(keys, max_block=10)
    hist = block_histogram(split).to_pandas()
    assert hist["n_docs"].max() <= 10 * 2  # salting bounds, modest slack


def test_plain_text_adapter():
    tbl = pa.table({"doc_id": [1, 2], "text": ["a b c d e f g h i j k l m n", "x y"]})
    docs = docs_from_plain_text(tbl, sentence_tokens=5)
    spans = docs["spans"].to_pylist()
    assert spans[0][0]["kind"] == "text"
    kinds = [s["kind"] for s in spans[0]]
    assert "media" in kinds
    offsets = [s["offset"] for s in spans[0]]
    assert offsets == sorted(offsets)


def test_stale_tmp_stage_is_ignored(small_docs, tmp_path):
    """A torn write (leftover .tmp stage dir) must not present a
    complete-looking stage; rerun recomputes and publishes atomically."""
    docs, _, _ = small_docs
    ds = ray.data.from_arrow(docs).repartition(2)
    ck = str(tmp_path / "ckpt")
    os.makedirs(os.path.join(ck, "stage=embed.tmp-999"), exist_ok=True)
    with open(os.path.join(ck, "stage=embed.tmp-999", "junk"), "w") as f:
        f.write("torn")
    cfg = ERConfig(checkpoint_dir=ck)
    out = run_er(ds, cfg)
    assert out["clusters"].count() == len(docs)
    from kiezray.lineage import read_manifests

    assert "embed" in read_manifests(ck)


def test_emb_transport_join_equals_broadcast(tmp_path):
    """All three embedding transports (ride explode / shuffle join /
    object-store broadcast) must produce exactly the same verified pairs
    and clusters — the scorer's composite (block, doc_id) sort makes the
    output a pure function of each partition's row set, so transport
    arrival order cannot flip equal-distance tie-breaks."""
    import pandas as pd
    import ray

    from kiezray.pipelines.er import ERConfig, run_er
    from kiezray.synth import generate_docs

    docs, _, _ = generate_docs(n_entities=300, seed=7, hub_entities=2, hub_copies=16)
    ds = ray.data.from_arrow(docs).repartition(8)

    def pairs_of(transport):
        out = run_er(
            ds,
            ERConfig(
                emb_transport=transport, resume=False, concurrency=(1, 4)
            ),
        )
        p = out["pairs"].to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        c = out["clusters"].to_pandas().sort_values("doc_id").reset_index(drop=True)
        return p, c

    pb, cb = pairs_of("broadcast")
    pj, cj = pairs_of("join")
    pr, cr = pairs_of("ride")
    pd.testing.assert_frame_equal(pb, pj)
    pd.testing.assert_frame_equal(cb, cj)
    pd.testing.assert_frame_equal(pb, pr)
    pd.testing.assert_frame_equal(cb, cr)


def test_run_stage_empty_and_sharded_empty(tmp_path):
    """A legitimately-empty stage/shard must checkpoint and resume cleanly
    (Ray writes no directory for an empty dataset)."""
    import pyarrow as pa

    from kiezray.lineage import run_stage, run_stage_sharded

    ck = str(tmp_path / "ck")

    def make_empty():
        ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2, 3])}))
        return ds.filter(lambda r: False)

    out = run_stage("empty", "fp1", make_empty, ck, resume=True)
    assert out.count() == 0
    out2 = run_stage("empty", "fp1", make_empty, ck, resume=True)  # resume
    assert out2.count() == 0

    def make_shard(i):
        ds = ray.data.from_arrow(pa.table({"x": pa.array([i * 10 + 1])}))
        return ds if i % 2 == 0 else ds.filter(lambda r: False)

    merged = run_stage_sharded("sh", "fp2", make_shard, 4, ck, resume=True)
    assert sorted(merged.to_pandas()["x"]) == [1, 21]
    merged2 = run_stage_sharded("sh", "fp2", make_shard, 4, ck, resume=True)
    assert sorted(merged2.to_pandas()["x"]) == [1, 21]


def test_blocking_metrics_vs_bruteforce(ray_session):
    """comparisons and pair_completeness are EXACT vs a brute-force
    pandas oracle; the HLL distinct-pair estimate is within 5%."""
    from itertools import combinations

    import pyarrow as pa
    import ray.data as rd

    from kiezray.block import blocking_keys, blocking_metrics
    from kiezray.synth import generate_docs

    docs, _, gold_links = generate_docs(
        n_entities=200, seed=42, hub_entities=1, hub_copies=8
    )
    keys = blocking_keys(rd.from_arrow(docs).repartition(8), carry_cols=())
    gp = pa.table(
        {"a": gold_links["source_id"], "b": gold_links["target_id"]}
    )
    out = blocking_metrics(keys, gp, n_docs=len(docs)).iloc[0]

    kdf = keys.select_columns(["doc_id", "block_key"]).to_pandas()
    comparisons, pairs = 0, set()
    for _, g in kdf.groupby("block_key"):
        s = len(g)
        comparisons += s * (s - 1) // 2
        pairs.update(
            frozenset(p) for p in combinations(g["doc_id"], 2)
            if p[0] != p[1]
        )
    key_sets = kdf.groupby("doc_id")["block_key"].agg(set)
    gl = list(zip(gold_links["source_id"].to_pylist(),
                  gold_links["target_id"].to_pylist()))
    covered = sum(
        1 for a, b in gl
        if key_sets.get(a, set()) & key_sets.get(b, set())
    )
    assert int(out["comparisons"]) == comparisons
    assert int(out["n_docs"]) == len(docs)
    assert out["pair_completeness"] == covered / len(gl)
    assert abs(out["distinct_pairs"] - len(pairs)) / len(pairs) < 0.05
    assert out["reduction_ratio"] > 0.9


@pytest.mark.parametrize("hubness", ["csls", "nicdm", "ls", "none"])
def test_batched_scorer_matches_per_block_path(hubness):
    """The size-batched __call__ emits exactly the per-block score_block
    pair multiset (id pairs + rounded scores) on random blocks of mixed
    sizes, including singletons and a max-size block — for every
    within-block hubness-reduction variant."""
    import numpy as np
    import pyarrow as pa
    import pandas as pd

    from kiezray.pipelines.er import BlockPairScorer

    rng = np.random.RandomState(3)
    scorer = BlockPairScorer(n_candidates=4, sim_threshold=0.2, hubness=hubness)
    ids, keys, vecs = [], [], []
    nid = 0
    for b, size in enumerate([1, 2, 2, 3, 5, 8, 1, 13, 4, 30]):
        base = rng.rand(8)
        for _ in range(size):
            ids.append(f"d{nid:04d}")
            keys.append(b)
            v = base + 0.15 * rng.rand(8)
            vecs.append(v / np.linalg.norm(v))
            nid += 1
    mat = np.asarray(vecs)
    ids_np = np.asarray(ids, dtype=object)
    keys_np = np.asarray(keys, dtype=np.int64)

    # reference: per-block score_block over each key group
    want = set()
    for b in np.unique(keys_np):
        sel = np.flatnonzero(keys_np == b)
        a, bb, sc = scorer.score_block(ids_np[sel], mat[sel])
        want |= set(zip(a.tolist(), bb.tolist(), np.round(sc, 6).tolist()))

    part = pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "block_hash": pa.array(keys, pa.int64()),
        }
    )
    out = scorer(part, lookup=(pd.Index(ids), mat))
    got = set(
        zip(
            out["a"].to_pylist(),
            out["b"].to_pylist(),
            [round(x, 6) for x in out["score"].to_pylist()],
        )
    )
    assert got == want


def test_incremental_er_matches_full_run(tmp_path):
    """Incremental maintenance: after adding new docs to a checkpointed
    corpus, a re-run (a) produces clusters byte-identical to a
    from-scratch run over the union, and (b) reuses at least one
    unaffected scoring shard verbatim while recomputing the affected
    ones (content-addressed shard fingerprints)."""
    import pyarrow as pa

    docs, _, _ = generate_docs(n_entities=40, seed=7, hub_entities=1,
                               hub_copies=8)
    # split off the docs of the LAST few entities as the "new" batch so
    # most blocks are untouched
    ids = docs["doc_id"].to_pylist()
    new_mask = [i.startswith(("ent000038", "ent000039")) for i in ids]
    old_tbl = docs.filter(pa.array([not m for m in new_mask]))
    assert 0 < docs.num_rows - old_tbl.num_rows < docs.num_rows

    ck = str(tmp_path / "ckpt")
    n_shards = 16
    cfg = ERConfig(checkpoint_dir=ck, extra={"pair_shards": n_shards})

    run_er(ray.data.from_arrow(old_tbl).repartition(2), cfg)
    mtimes1 = {
        i: os.path.getmtime(
            os.path.join(ck, f"stage=pairs_scored.shard{i:04d}",
                         "_lineage.json")
        )
        for i in range(n_shards)
    }

    # incremental: same checkpoint dir, grown corpus
    out_inc = run_er(ray.data.from_arrow(docs).repartition(2), cfg)
    c_inc = (
        out_inc["clusters"].to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    mtimes2 = {
        i: os.path.getmtime(
            os.path.join(ck, f"stage=pairs_scored.shard{i:04d}",
                         "_lineage.json")
        )
        for i in range(n_shards)
    }
    reused = [i for i in range(n_shards) if mtimes1[i] == mtimes2[i]]
    recomputed = [i for i in range(n_shards) if mtimes1[i] != mtimes2[i]]
    assert reused, "no scoring shard was reused"
    assert recomputed, "no scoring shard was recomputed"

    # from-scratch ground truth over the union
    cfg2 = ERConfig(
        checkpoint_dir=str(tmp_path / "ckpt2"),
        extra={"pair_shards": n_shards},
    )
    c_full = (
        run_er(ray.data.from_arrow(docs).repartition(2), cfg2)["clusters"]
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert c_inc.equals(c_full)


@pytest.mark.parametrize("hubness", ["nicdm", "ls"])
def test_er_hubness_variants_end_to_end(hubness, tmp_path):
    """The flagship runs with every within-block hubness variant and
    matches its own straight-line oracle at F1 >= 0.99."""
    docs, _, _ = generate_docs(n_entities=15, seed=3, hub_entities=1,
                               hub_copies=6)
    cfg = ERConfig(hubness=hubness)
    out = run_er(ray.data.from_arrow(docs).repartition(2), cfg)
    pred_tbl = out["clusters"].to_pandas()
    assert len(pred_tbl) == docs.num_rows
    pred = dict(zip(pred_tbl["doc_id"], pred_tbl["cluster_id"]))
    oracle = oracle_clusters(docs, cfg)
    res = pairwise_scores(pred, oracle)
    assert res["f1"] >= 0.99, res


def test_docs_fingerprint_order_invariant_content_sensitive(ray_session):
    """The corpus fingerprint ignores row order / partitioning but
    changes when any doc's content or the row multiset changes."""
    from kiezray.pipelines.er import _docs_fingerprint

    docs, _, _ = generate_docs(n_entities=8, seed=11)
    base = _docs_fingerprint(ray.data.from_arrow(docs).repartition(1))
    shuf = _docs_fingerprint(
        ray.data.from_arrow(docs.take(
            pa.array(np.random.RandomState(0).permutation(docs.num_rows))
        )).repartition(5)
    )
    assert base == shuf
    fewer = _docs_fingerprint(
        ray.data.from_arrow(docs.slice(0, docs.num_rows - 1))
    )
    assert fewer != base
    # content change: drop one span from one doc
    import pandas as pd

    pdf = docs.to_pandas()
    pdf.loc[0, "spans"] = pdf.loc[0, "spans"][:-1]
    changed = _docs_fingerprint(
        ray.data.from_arrow(pa.Table.from_pandas(pdf, schema=docs.schema))
    )
    assert changed != base
    # SAME-LENGTH text edit must also change the fingerprint (a
    # length-only hash would silently reuse stale checkpoints)
    pdf2 = docs.to_pandas()
    sp = [dict(x) for x in pdf2.loc[0, "spans"]]
    t0 = sp[0]["text"]
    sp[0]["text"] = ("X" + t0[1:]) if t0 else "X"
    pdf2.at[0, "spans"] = sp
    edited = _docs_fingerprint(
        ray.data.from_arrow(pa.Table.from_pandas(pdf2, schema=docs.schema))
    )
    assert edited != base
    # span ORDER within a doc is part of the identity
    pdf3 = docs.to_pandas()
    sp3 = list(pdf3.loc[0, "spans"])
    if len(sp3) >= 2 and sp3[0] != sp3[1]:
        sp3[0], sp3[1] = sp3[1], sp3[0]
        pdf3.at[0, "spans"] = sp3
        swapped = _docs_fingerprint(
            ray.data.from_arrow(pa.Table.from_pandas(pdf3, schema=docs.schema))
        )
        assert swapped != base
