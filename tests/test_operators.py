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
