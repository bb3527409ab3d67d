"""Custom-operator correctness against independent in-test oracles:
as-of join vs pandas merge_asof, MinHash recall on planted duplicates,
cosine top-k vs numpy brute force (FIXTURES.md §B)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from flod_spark.operators.asof import asof_join


def _events(spark, n=500, users=20, seed=42):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.integers(0, users, n),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "kind": rng.choice(["click", "purchase"], n),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_asof_join_matches_merge_asof(spark):
    df, pdf = _events(spark)
    left = df.filter(F.col("kind") == "purchase").select("event_id", "user_id", "ts")
    right = df.filter(F.col("kind") == "click").select("event_id", "user_id", "ts")
    out = asof_join(
        left,
        right,
        on="user_id",
        left_time="ts",
        right_time="ts",
        left_cols={"event_id": "purchase_id", "ts": "purchase_ts"},
        right_cols={"event_id": "click_id", "ts": "click_ts"},
        tiebreak="event_id",
    ).toPandas()

    lp = pdf[pdf.kind == "purchase"].sort_values(["ts", "event_id"]).reset_index(drop=True)
    rp = pdf[pdf.kind == "click"].sort_values(["ts", "event_id"]).reset_index(drop=True)
    m = pd.merge_asof(
        lp,
        rp.rename(columns={"event_id": "click_id", "ts": "click_ts"}),
        left_on="ts",
        right_on="click_ts",
        by="user_id",
        direction="backward",
    )
    m = m[m.click_id.notna()]
    expect = {(int(r.event_id), int(r.click_id)) for r in m.itertuples()}
    got = {(int(r.purchase_id), int(r.click_id)) for r in out.itertuples()}
    assert got == expect


def test_minhash_finds_planted_duplicates(spark):
    # dup_documents fixture (FIXTURES.md): base docs + exact copies + near-copies
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(200)]
    base = [" ".join(rng.choice(words, 60)) for _ in range(40)]
    docs = [(i, t) for i, t in enumerate(base)]
    # exact copies (ids 100+) and near-copies with 2 word edits (ids 200+)
    for i in range(10):
        docs.append((100 + i, base[i]))
        toks = base[i].split()
        toks[5], toks[17] = "xx", "yy"
        docs.append((200 + i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    from flod_spark.operators.minhash import minhash_candidates

    pairs = {(r.doc_a, r.doc_b) for r in minhash_candidates(df).collect()}
    exact_expected = {(i, 100 + i) for i in range(10)}
    assert exact_expected <= pairs, f"missing exact dup pairs: {exact_expected - pairs}"
    near_hits = sum((i, 200 + i) in pairs for i in range(10))
    assert near_hits >= 7, f"near-dup recall too low: {near_hits}/10"


def test_sim_topk_matches_numpy(spark, sf_dir):
    from flod_spark.catalog.similarity import sim_topk, K, NQ

    out = sim_topk(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    norms = np.linalg.norm(V, axis=1)
    qidx = np.argsort(ids)[:NQ]
    for qi in qidx:
        cos = (V @ V[qi]) / (norms * norms[qi])
        cos[qi] = -np.inf  # exclude self
        order = np.lexsort((ids, -cos))[:K]
        expect = [int(ids[j]) for j in order]
        got = out[out.query_id == ids[qi]].sort_values("rk").neighbor_id.tolist()
        assert got == expect, f"query {ids[qi]}: {got} != {expect}"


def test_lsh_bucket_recall(spark, sf_dir):
    """SRP-LSH sanity: vectors in the same bucket are on average more
    similar than random pairs (the candidate-generation premise)."""
    from flod_spark.catalog.similarity import _bucket_spark, _as_double

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b = emb.select("vec_id", _as_double("embedding").alias("v"), _bucket_spark(F.col("v")).alias("bucket")).toPandas()
    V = np.stack(b.v.to_numpy())
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = V @ V.T
    n = len(b)
    same = b.bucket.to_numpy()[:, None] == b.bucket.to_numpy()[None, :]
    mask = ~np.eye(n, dtype=bool)
    assert sims[same & mask].mean() > sims[mask].mean()


def test_range_join_bucketed_matches_plain(spark, sf_dir):
    """Bucketed-time range join == plain range join (same pairs)."""
    from pyspark.sql import functions as F

    from flod_spark.io import load
    from flod_spark.operators.rangejoin import range_join_bucketed

    ev = load(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("eid_a"), F.col("user_id").alias("u"), F.col("ts").alias("ts_a")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("eid_b"), F.col("user_id").alias("u2"), F.col("ts").alias("ts_b")
    )
    w = 1800
    plain = s.join(
        c,
        (F.col("u") == F.col("u2"))
        & (F.col("ts_b") >= F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr(f"INTERVAL {w} SECONDS")),
    ).select("eid_a", "eid_b")
    bucketed = range_join_bucketed(
        s, c, "ts_a", "ts_b", w, extra_on=F.col("u") == F.col("u2")
    ).select("eid_a", "eid_b")
    got = {(r.eid_a, r.eid_b) for r in bucketed.collect()}
    expect = {(r.eid_a, r.eid_b) for r in plain.collect()}
    assert got == expect and len(expect) > 0


def test_lsh_max_bucket_caps_pairs(spark):
    """Oversized LSH buckets are dropped under max_bucket."""
    from flod_spark.operators.minhash import lsh_candidate_pairs

    rows = [(i, 0, "sig_big") for i in range(10)] + [(100, 0, "sig_small"), (101, 0, "sig_small")]
    sig = spark.createDataFrame(rows, "doc_id long, band int, bs string")
    capped = lsh_candidate_pairs(sig, max_bucket=5).collect()
    assert {(r.doc_a, r.doc_b) for r in capped} == {(100, 101)}
    full = lsh_candidate_pairs(sig).collect()
    assert len(full) == 45 + 1


def test_simhash_64bit_near_dups_collide(spark):
    """64-bit SimHash: identical token sets => identical signature; a
    one-token change => small Hamming distance (pigeonhole band match)."""
    from flod_spark.operators.simhash import simhash_bands, simhash_signatures

    base = " ".join(f"token{i} word{i} item{i}" for i in range(30))
    rows = [
        (1, base),
        (2, base + " extra"),          # near-dup: one extra token
        (3, base.replace("fox", "cat")),  # near-dup: one swapped token
        (4, "completely different words entirely unrelated content here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = simhash_signatures(df, width=64)
    vals = {r.doc_id: r.simhash for r in sig.collect()}
    ham = lambda a, b: bin((vals[a] ^ vals[b]) & (2**64 - 1)).count("1")
    assert ham(1, 2) <= 7 and ham(1, 3) <= 10
    assert ham(1, 4) > 16
    # pigeonhole: docs within Hamming < bands share a band exactly
    bands = simhash_bands(sig, bands=8, width=64)
    b1 = {(r.band, r.band_bits) for r in bands.filter("doc_id = 1").collect()}
    b2 = {(r.band, r.band_bits) for r in bands.filter("doc_id = 2").collect()}
    assert b1 & b2


def test_dist_over_total_order_matches_builtin_windows(spark):
    """The rank-arithmetic form (bucketed with_seq + broadcast count)
    must reproduce Spark's own percent_rank/cume_dist/ntile over the
    same total order, bitwise — at several n values that exercise the
    ntile remainder logic (n%k = 0 and != 0, n < k)."""
    from pyspark.sql import Window

    from flod_spark.catalog.relational import _dist_over_total_order

    for n, k in ((40, 4), (41, 4), (3, 10), (1, 4)):
        df = spark.range(n).select(
            (F.col("id") * 37 % 100).alias("v"), F.col("id").alias("uid")
        )
        got = {
            (r.v, r.uid): (r._pct_rank, r._cume_dist, r._ntile)
            for r in _dist_over_total_order(df, ["v", "uid"], k).collect()
        }
        w = Window.orderBy("v", "uid")
        want = {
            (r.v, r.uid): (r.p, r.c, r.t)
            for r in df.select(
                "v",
                "uid",
                F.percent_rank().over(w).alias("p"),
                F.cume_dist().over(w).alias("c"),
                F.ntile(k).over(w).cast("long").alias("t"),
            ).collect()
        }
        assert got == want, (n, k)
