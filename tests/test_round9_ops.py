"""Round-9 operator pins: Bollinger exactness and head-frame honesty,
power-iteration semantics vs an independent numpy loop, planted n-gram
novelty, association-rule asymmetry, and the reweighting invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_bollinger_matches_numpy_reference(spark, sf_dir):
    """window_bollinger equals an independent numpy trailing-frame
    mean/std (population, true n on head frames) on the quantized
    values — including the first rows of every user, where n < W and
    a lazy implementation would pad or NULL."""
    import numpy as np

    import __spark_entry__ as entry
    from flod_spark.catalog.relational import _BOLL_W

    got = {
        r.event_id: r
        for r in entry.queries()["window_bollinger"](spark, sf_dir).collect()
    }
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "ts", "value")
        .collect()
    )
    from decimal import ROUND_HALF_UP, Decimal

    by_user: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    n_head = 0
    micro = Decimal("0.000001")
    for rows in by_user.values():
        # quantize exactly as Spark's double->DECIMAL(18,6) cast does
        # (shortest decimal repr, HALF_UP) — Python round() banker's-
        # rounds the binary double and can land 1 micro off on ties
        xq = np.array(
            [
                int(Decimal(repr(r.value)).quantize(micro, ROUND_HALF_UP) * 1_000_000)
                for r in rows
            ],
            dtype="int64",
        )
        for i, r in enumerate(rows):
            lo = max(0, i - _BOLL_W + 1)
            fr = xq[lo : i + 1].astype(float) / 1e6
            n = len(fr)
            g = got[r.event_id]
            assert abs(g.mid_20 - fr.mean()) < 1e-9
            assert abs(g.sigma_20 - fr.std()) < 1e-9
            assert abs(g.upper_20 - (g.mid_20 + 2 * g.sigma_20)) < 1e-12
            if n < _BOLL_W:
                n_head += 1
    assert n_head > 0  # head frames actually exercised


def test_pca_power_iter_is_exact_power_iteration(spark, sf_dir):
    """embed_pca_power_iter equals an INDEPENDENT numpy power iteration
    (same v0, same round count) to quantization precision, and its lam
    is a certified lower bound on the spectral norm. The synthetic
    corpus is nearly isotropic (lambda_2/lambda_1 ~ 0.93), so this pins
    the primitive's semantics, not convergence."""
    import numpy as np

    import __spark_entry__ as entry
    from flod_spark.catalog.similarity import _PCA_ROUNDS, _PCA_V0, DIM

    out = entry.queries()["embed_pca_power_iter"](spark, sf_dir).collect()
    v_got = np.zeros(DIM)
    for r in out:
        v_got[r.dim] = r.comp
    lam_got = out[0].lam

    X = np.array(
        [
            r.embedding
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=float,
    )
    A = X.T @ X
    v = np.full(DIM, _PCA_V0)
    lam = 0.0
    for _ in range(_PCA_ROUNDS):
        w = A @ v
        lam = math.sqrt(float(np.sum(w * w)))
        v = w / lam
    # 2^-40 per-term quantization over |rows| terms: well under 1e-6
    assert np.abs(v_got - v).max() < 1e-6
    assert abs(lam_got - lam) < 1e-6
    lam1 = float(np.linalg.eigvalsh(A)[-1])
    assert lam_got <= lam1 * (1 + 1e-9)


def test_ngram_novelty_planted(spark, tmp_path):
    """First-occurrence attribution on a planted corpus: a verbatim
    re-post scores 0, a half-overlapping doc scores exactly its new
    grams, and a short (<3 tokens) doc reports 0 grams with NULL
    fraction."""
    import __spark_entry__ as entry

    texts = [
        (0, "a b c d e f"),        # 4 grams, all novel
        (1, "a b c d e f"),        # verbatim dup -> 0 novel
        (2, "a b c x y z"),        # abc seen; bcx cxy xyz novel
        (3, "hi"),                 # too short -> 0 grams
    ]
    pdir = tmp_path / "nov"
    pdir.mkdir()
    spark.createDataFrame(texts, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(pdir / "documents.parquet"))
    got = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty_frac)
        for r in entry.queries()["ngram_novelty"](spark, str(pdir)).collect()
    }
    assert got[0] == (4, 4, 1.0)
    assert got[1] == (4, 0, 0.0)
    assert got[2] == (4, 3, 0.75)
    assert got[3][0] == 0 and got[3][1] == 0 and got[3][2] is None


def test_assoc_rules_directional_asymmetry(spark, tmp_path):
    """The statistic the symmetric lift cannot express, planted: part
    9 appears in 4 baskets, part 7 only ever alongside 9 — so
    confidence(7 -> 9) = 1.0 while confidence(9 -> 7) = 0.5."""
    import __spark_entry__ as entry

    rows = [
        (1, 9), (1, 7),
        (2, 9), (2, 7),
        (3, 9), (3, 5),
        (4, 9), (4, 5),
    ]
    pdir = tmp_path / "ar"
    pdir.mkdir()
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(str(pdir / "lineitem.parquet"))
    got = {
        (r.antecedent, r.consequent): (r.support, r.confidence)
        for r in entry.queries()["orders_assoc_rules"](spark, str(pdir)).collect()
    }
    assert got[(7, 9)] == (2, 1.0)
    assert got[(9, 7)] == (2, 0.5)
    assert got[(5, 9)] == (2, 1.0)
    assert (7, 5) not in got  # never co-bought, no rule


def test_importance_reweight_invariants(spark, sf_dir):
    """Shares are distributions and the weights move actual to target:
    sum(actual) = sum(target) = 1 and weight * actual_share =
    target_share per source, to float precision."""
    import __spark_entry__ as entry

    out = entry.queries()["sample_importance_reweight"](spark, sf_dir).collect()
    assert abs(sum(r.actual_share for r in out) - 1.0) < 1e-9
    assert abs(sum(r.target_share for r in out) - 1.0) < 1e-9
    for r in out:
        assert abs(r.weight * r.actual_share - r.target_share) < 1e-12
        assert r.weight > 0


def test_token_budget_live_equals_batch_carve(spark, sf_dir):
    """The live admission controller's drained union IS the batch
    carve — every column of every row, bitwise (the replay delivers
    arrival order = the carve's hash order, and admission is
    exactly-once)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    live = {
        tuple(r)
        for r in qs["stream_token_budget_live"](spark, sf_dir).collect()
    }
    batch = {
        tuple(r)
        for r in qs["sample_token_budget_sharded"](spark, sf_dir).collect()
    }
    assert live == batch and live


def test_ngram_novelty_live_equals_batch(spark, sf_dir):
    """The live claim-state novelty equals the batch first-occurrence
    attribution row for row (replay order = doc_id order = the batch
    MIN(doc_id) attribution), including zero-gram docs."""
    import __spark_entry__ as entry

    qs = entry.queries()
    live = {tuple(r) for r in qs["stream_ngram_novelty_live"](spark, sf_dir).collect()}
    batch = {tuple(r) for r in qs["ngram_novelty"](spark, sf_dir).collect()}
    assert live == batch and live


def test_basket_triples_apriori_prune_planted(spark, tmp_path):
    """Downward closure on a planted basket set: a triple whose three
    pairs are all frequent but whose own support misses the floor is
    generated as a candidate and then KILLED at verification; a
    genuinely frequent triple survives; no triple appears whose pairs
    are not all frequent."""
    import __spark_entry__ as entry

    rows = [
        # triple (1,2,3) in two baskets -> frequent (floor = 2)
        (10, 1), (10, 2), (10, 3),
        (11, 1), (11, 2), (11, 3),
        # pairs (4,5), (4,6), (5,6) each reach support 2 through
        # DIFFERENT baskets; the triple (4,5,6) occurs only once
        (20, 4), (20, 5), (20, 6),
        (21, 4), (21, 5),
        (22, 4), (22, 6),
        (23, 5), (23, 6),
    ]
    pdir = tmp_path / "tri"
    pdir.mkdir()
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(str(pdir / "lineitem.parquet"))
    got = {
        (r.p1, r.p2, r.p3): r.support
        for r in entry.queries()["orders_basket_triples"](spark, str(pdir)).collect()
    }
    assert got == {(1, 2, 3): 2}


def test_bollinger_live_under_rocksdb_state_store(spark, sf_dir):
    """The round-9 applyInPandasWithState op under the production state
    backend: swapping to RocksDBStateStoreProvider changes the
    Bollinger live output not at all (the test_streaming.py
    windowed-agg pin, extended to this round's richest custom state —
    a seen-count + W-1 value array per key)."""
    import __spark_entry__ as entry

    key = "spark.sql.streaming.stateStore.providerClass"
    provider = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    fn = entry.queries()["stream_bollinger_live"]
    default = {tuple(r) for r in fn(spark, sf_dir).collect()}
    spark.conf.set(key, provider)
    try:
        rocks = {tuple(r) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.unset(key)
    assert rocks == default and rocks
