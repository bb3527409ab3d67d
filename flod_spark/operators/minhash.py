"""MinHash + LSH near-duplicate candidate generation (SURVEY §2.5 mandate).

Pipeline (all DataFrame built-ins, scale notes in catalog/dedup.py):
  normalize -> char shingles (bounded prefix) -> per-(doc, seed) min of
  md5(seed:shingle) -> band signatures -> bucket self-join -> pairs.

min over fixed-width md5 hex strings == numeric min-hash (lexicographic
order equals numeric order at fixed width), and md5 is identical across
engines, which keeps the DuckDB oracle exact.

100 TB notes:
- prune_frequent_shingles caps inverted-index skew: a shingle occurring in
  k docs contributes k² candidate join rows; boilerplate (headers, license
  text) explodes without this cap.
- the bounded 4 KB normalization prefix keeps shingling O(1) per doc.
- only (doc_id, band, 4x32B signature) crosses the bucket-join shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(col="text", cap: int = 4000):
    return F.substring(F.regexp_replace(F.lower(col), "[ \\t\\r\\n]+", " "), 1, cap)


def shingles(df: DataFrame, id_col: str = "doc_id", shingle: int = 8, cap: int = 4000) -> DataFrame:
    """Distinct character shingles of the normalized text prefix."""
    norm = df.select(id_col, normalize_text(cap=cap).alias("t"))
    idx = F.explode(F.sequence(F.lit(1), F.greatest(F.length("t") - (shingle - 1), F.lit(1)))).alias("i")
    return (
        norm.select(id_col, "t", idx)
        .select(id_col, F.col("t").substr(F.col("i"), F.lit(shingle)).alias("s"))
        .distinct()
    )


def prune_frequent_shingles(sh: DataFrame, max_docs_per_shingle: int) -> DataFrame:
    """Drop shingles appearing in more than `max_docs_per_shingle` docs
    (boilerplate); bounds the k² blow-up of inverted-index joins."""
    freq = sh.groupBy("s").agg(F.count("*").alias("_k"))
    keep = freq.filter(F.col("_k") <= max_docs_per_shingle).select("s")
    return sh.join(F.broadcast(keep), "s")


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", seeds: int = 16, bands: int = 4
) -> DataFrame:
    """(doc, band) -> comma-joined band signature of seeds/bands min-hashes."""
    rows_per_band = seeds // bands
    seed = F.explode(F.sequence(F.lit(0), F.lit(seeds - 1))).alias("seed")
    mh = (
        sh.select(id_col, "s", seed)
        .withColumn(
            "m",
            F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("s")).cast("binary")),
        )
        .groupBy(id_col, F.expr(f"seed div {rows_per_band}").alias("band"), "seed")
        .agg(F.min("m").alias("m"))
    )
    return mh.groupBy(id_col, "band").agg(
        F.array_join(F.array_sort(F.collect_list(F.struct("seed", "m"))).getField("m"), ",").alias("bs")
    )


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any band signature."""
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bs") == F.col("b.bs"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    shingle: int = 8,
    seeds: int = 16,
    bands: int = 4,
    cap: int = 4000,
    max_docs_per_shingle: int | None = None,
) -> DataFrame:
    sh = shingles(df, id_col, shingle, cap)
    if max_docs_per_shingle is not None:
        sh = prune_frequent_shingles(sh, max_docs_per_shingle)
    return lsh_candidate_pairs(minhash_signatures(sh, id_col, seeds, bands), id_col)
