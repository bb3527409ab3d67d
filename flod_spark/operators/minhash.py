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


def shingles(
    df: DataFrame, id_col: str = "doc_id", shingle: int = 8, cap: int = 4000, distinct: bool = True
) -> DataFrame:
    """Character shingles of the normalized text prefix (distinct per doc
    unless distinct=False — MinHash's min is duplicate-insensitive, so its
    path skips that full shuffle; Jaccard counting must keep it).

    Explicit repartition first: a document table often arrives as few
    parquet files (one input split), and shingling amplifies each row
    ~cap/1 fold — without the exchange ALL that work lands on one task.
    The same rule applies at 100 TB: partition count must track post-
    explosion volume, not input bytes."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    norm = df.select(id_col, normalize_text(cap=cap).alias("t")).repartition(parallelism)
    idx = F.explode(F.sequence(F.lit(1), F.greatest(F.length("t") - (shingle - 1), F.lit(1)))).alias("i")
    out = norm.select(id_col, "t", idx).select(
        id_col, F.col("t").substr(F.col("i"), F.lit(shingle)).alias("s")
    )
    return out.distinct() if distinct else out


def prune_frequent_shingles(sh: DataFrame, max_docs_per_shingle: int) -> DataFrame:
    """Drop shingles appearing in more than `max_docs_per_shingle` docs
    (boilerplate); bounds the k² blow-up of inverted-index joins."""
    freq = sh.groupBy("s").agg(F.count("*").alias("_k"))
    keep = freq.filter(F.col("_k") <= max_docs_per_shingle).select("s")
    return sh.join(F.broadcast(keep), "s")


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", seeds: int = 16, bands: int = 4
) -> DataFrame:
    """(doc, band) -> comma-joined band signature of seeds/bands min-hashes.

    Cost shape: ONE aggregate does everything — the seed hashes are inline
    expressions inside min() (md5 fuses into the whole-stage-codegen'd
    partial aggregate; no seed explode, no vocab join, no extra pass over
    the shingle stream), so the only exchange is the |docs|-row final agg.
    Map-side combine collapses each task to one row per doc before the
    shuffle — at 100 TB the exchange carries |docs| x 16 x 32B, not
    shingles."""
    rows_per_band = seeds // bands
    mins = sh.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")).cast("binary"))).alias(f"_m{i}")
            for i in range(seeds)
        ]
    )
    band_sigs = [
        F.concat_ws(",", *[F.col(f"_m{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(f"_b{b}")
        for b in range(bands)
    ]
    stacked = mins.select(id_col, *band_sigs).select(
        id_col,
        F.expr(
            "stack("
            + str(bands)
            + ", "
            + ", ".join(f"{b}, _b{b}" for b in range(bands))
            + ") AS (band, bs)"
        ),
    )
    return stacked


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any band signature.

    sig is persisted first: a DataFrame self-join re-executes the whole
    upstream pipeline for each side (no automatic subplan reuse), and the
    signature table is tiny (|docs| x bands) even at 100 TB input."""
    sig = sig.persist()
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
    sh = shingles(df, id_col, shingle, cap, distinct=False)
    if max_docs_per_shingle is not None:
        sh = prune_frequent_shingles(sh.distinct(), max_docs_per_shingle)
    return lsh_candidate_pairs(minhash_signatures(sh, id_col, seeds, bands), id_col)
