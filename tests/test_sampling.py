"""Deterministic-sampling invariants (catalog/sampling.py).

Correctness vs DuckDB is the parity gate's job; these tests pin the
PRODUCTION properties hash sampling is chosen for: run-to-run stability
and split membership being a pure function of the document (append-safe).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flod_spark.catalog import sampling


def test_sample_hash_stable_across_runs(spark, sf_dir):
    a = {r.doc_id for r in sampling.sample_hash(spark, sf_dir).collect()}
    b = {r.doc_id for r in sampling.sample_hash(spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_split_is_pure_function_of_doc(spark, sf_dir):
    # growing the corpus must never move an existing doc between splits:
    # recompute the split on a half-corpus and on the full corpus and
    # compare per-doc assignment on the intersection
    from flod_spark.io import load

    docs = load(spark, sf_dir, "documents")
    hp = sampling._hash_prefix("p|", F.col("doc_id"))
    split = (
        F.when(hp < sampling._thr(sampling.TRAIN_FRAC), "train")
        .when(hp < sampling._thr(sampling.TRAIN_FRAC + sampling.VAL_FRAC), "val")
        .otherwise("test")
    )
    full = {r.doc_id: r.s for r in docs.select("doc_id", split.alias("s")).collect()}
    half = {
        r.doc_id: r.s
        for r in docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", split.alias("s"))
        .collect()
    }
    assert half and all(full[k] == v for k, v in half.items())


def test_split_covers_all_docs_disjointly(spark, sf_dir):
    counts = {
        (r.split, r.lang): r.n_docs for r in sampling.split_assign(spark, sf_dir).collect()
    }
    from flod_spark.io import load

    total = load(spark, sf_dir, "documents").count()
    assert sum(counts.values()) == total
    assert {s for s, _ in counts} <= {"train", "val", "test"}


def test_stratified_exactly_k_per_stratum(spark, sf_dir):
    out = sampling.sample_stratified(spark, sf_dir)
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per and all(n == sampling.STRAT_K for n in per.values())


def test_token_budget_sharded_composes_on_dominant_lang(spark, tmp_path):
    """The skew story: a 95%-dominant language still fills its budget
    when carved per salted sub-stratum — every shard admits docs until
    its budget/S crossing doc, so the per-lang total composes to
    [budget, budget + S * max_doc_tokens), and each (lang, shard)
    group independently satisfies the prefix property (cum - n_tok <
    budget/S). Also pins that the shards partition the admitted set
    (no doc in two shards) and that the shard hash is the salted_mod
    the oracle computes."""
    from flod_spark.functions.hashbridge import salted_mod

    B, S = sampling._TOK_BUDGET, sampling._TOK_SHARDS
    # ~60 tokens per doc, 400 docs 'en' / 20 docs 'de': en supply per
    # shard (~100 docs * 60 tok) comfortably exceeds B/S = 375
    words = " ".join(f"w{i}" for i in range(60))
    rows = [(i, "en" if i % 21 else "de", words) for i in range(420)]
    pdir = tmp_path / "skew"
    pdir.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).coalesce(1).write.parquet(str(pdir / "documents.parquet"))

    out = sampling.sample_token_budget_sharded(spark, str(pdir)).collect()
    assert {r.lang for r in out} == {"en", "de"}
    # disjoint shards: each admitted doc appears once
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids))
    # per-(lang, shard) prefix property
    for r in out:
        assert r.cum_tokens - r.n_tok < B // S
    # composition on the dominant language: supply suffices in every
    # shard, so each admits its crossing doc -> total in [B, B + S*max)
    en_tot = sum(r.n_tok for r in out if r.lang == "en")
    max_tok = max(r.n_tok for r in out)
    assert B <= en_tot < B + S * max_tok
    # shard column is the oracle's salted_mod, not an ad-hoc hash
    docs = spark.read.parquet(str(pdir / "documents.parquet"))
    exp = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", salted_mod(F.col("doc_id"), "tbs|", S).alias("s")
        ).collect()
    }
    assert all(r.shard == exp[r.doc_id] for r in out)
