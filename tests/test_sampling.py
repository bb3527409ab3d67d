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
