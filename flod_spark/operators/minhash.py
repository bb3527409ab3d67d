"""MinHash + LSH near-duplicate candidate generation (SURVEY §2.5 mandate).

Pipeline (all DataFrame built-ins, scale notes in catalog/dedup.py):
  normalize -> char shingles (bounded prefix) -> ONE md5 per shingle,
  folded to a 60-bit integer -> per-doc min of k affine transforms
  h_i(x) = (a_i*x + b_i) mod P -> band signatures -> bucket self-join.

The affine hash family over one base hash is the standard MinHash
construction (it is what Spark MLlib's MinHashLSH uses); it hashes each
shingle ONCE instead of once per seed — 16x less hashing than the naive
md5(seed:shingle) scheme at identical statistical quality. P = 2^31-1
keeps every product a_i*x < 2^62, exact in int64 on both engines, so the
DuckDB oracle (CAST('0x'||substr(md5(s),1,15) AS BIGINT)) stays bitwise
identical.

100 TB notes:
- prune_frequent_shingles caps inverted-index skew: a shingle occurring in
  k docs contributes k² candidate join rows; boilerplate (headers, license
  text) explodes without this cap.
- the bounded 4 KB normalization prefix keeps shingling O(1) per doc.
- only (doc_id, band, signature) crosses the bucket-join shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: products stay < 2^62 (exact int64 everywhere).
P = 2_147_483_647


def hash_family(seeds: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) coefficients for h_i(x) = (a_i*x + b_i) mod P.

    Fixed LCG so Spark builder and oracle-SQL generator share one family.
    """
    x = 0x5DEECE66D % P
    coeffs: list[tuple[int, int]] = []
    for _ in range(seeds):
        x = (x * 1103515245 + 12345) % P
        a = x % (P - 1) + 1  # a != 0
        x = (x * 1103515245 + 12345) % P
        coeffs.append((a, x))
    return coeffs


def normalize_text(col="text", cap: int = 4000):
    return F.substring(F.regexp_replace(F.lower(col), "[ \\t\\r\\n]+", " "), 1, cap)


def shingle_hash(col: str = "s") -> F.Column:
    """60-bit integer base hash of a shingle, reduced mod P.

    First 15 hex digits of md5 — portable: DuckDB computes the identical
    value as CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % P.
    """
    return F.conv(F.substring(F.md5(F.col(col).cast("binary")), 1, 15), 16, 10).cast("long") % P


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
    (boilerplate); bounds the k² blow-up of inverted-index joins.

    Broadcasts the DROP set, not the keep set: hot shingles are by
    definition few distinct values (boilerplate), while keepers are the
    long tail — at 100 TB the keep list is unboundedly large but the
    drop list stays broadcastable."""
    freq = sh.groupBy("s").agg(F.count("*").alias("_k"))
    hot = freq.filter(F.col("_k") > max_docs_per_shingle).select("s")
    return sh.join(F.broadcast(hot), "s", "left_anti")


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", seeds: int = 16, bands: int = 4
) -> DataFrame:
    """(doc, band) -> comma-joined band signature of seeds/bands min-hashes.

    Cost shape: one projection computes the base hash (md5 once per
    shingle), then ONE aggregate takes all seed minima as inline affine
    expressions (fused by whole-stage codegen into the partial aggregate;
    no seed explode, no second pass over the shingle stream). Map-side
    combine collapses each task to one row per doc before the shuffle —
    at 100 TB the exchange carries |docs| x seeds x 8B, not shingles."""
    rows_per_band = seeds // bands
    hashed = sh.select(id_col, shingle_hash("s").alias("h"))
    mins = hashed.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(P)).alias(f"_m{i}")
            for i, (a, b) in enumerate(hash_family(seeds))
        ]
    )
    band_sigs = [
        F.concat_ws(
            ",", *[F.col(f"_m{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
        ).alias(f"_b{b}")
        for b in range(bands)
    ]
    return mins.select(id_col, *band_sigs).select(
        id_col,
        F.expr(
            "stack("
            + str(bands)
            + ", "
            + ", ".join(f"{b}, _b{b}" for b in range(bands))
            + ") AS (band, bs)"
        ),
    )


def minhash_band_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    shingle: int = 8,
    seeds: int = 16,
    bands: int = 4,
    cap: int = 4000,
) -> DataFrame:
    """(doc, band, bs) band-signature rows computed ENTIRELY per-row —
    no explode, no groupBy, no shuffle. The whole doc is one row, so the
    shingle set is an array column and each seed's min-hash is an
    array_min over a transform: the min over the shingle MULTISET equals
    the batch path's min over the distinct set, so the signatures are
    bitwise identical to minhash_signatures' (and to the generated
    DuckDB oracle).

    This is the STREAMING-SAFE form: stateless map work, legal on an
    unbounded stream before a keyed dedup. Cost: seeds array traversals
    of <= cap-shingle hashes per doc, all inside whole-stage codegen."""
    rows_per_band = seeds // bands
    t = normalize_text(cap=cap)
    sh_arr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (shingle - 1), F.lit(1))),
        lambda i: t.substr(i, F.lit(shingle)),
    )
    h_arr = F.transform(
        sh_arr,
        lambda s: F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast("long") % P,
    )
    hashed = df.select(id_col, h_arr.alias("_hs"))

    def affine_min(a: int, b: int) -> F.Column:
        # factory closure: a bare lambda with default args would change
        # the arity PySpark infers for the higher-order function
        return F.array_min(F.transform(F.col("_hs"), lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(P)))

    mins = hashed.select(
        id_col,
        *[affine_min(a, b).alias(f"_m{i}") for i, (a, b) in enumerate(hash_family(seeds))],
    )
    band_sigs = [
        F.concat_ws(
            ",", *[F.col(f"_m{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
        ).alias(f"_b{b}")
        for b in range(bands)
    ]
    return mins.select(id_col, *band_sigs).select(
        id_col,
        F.expr(
            "stack("
            + str(bands)
            + ", "
            + ", ".join(f"{b}, _b{b}" for b in range(bands))
            + ") AS (band, bs)"
        ),
    )


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str = "doc_id", max_bucket: int | None = None
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any band signature.

    sig is persisted first: a DataFrame self-join re-executes the whole
    upstream pipeline for each side (no automatic subplan reuse), and the
    signature table is tiny (|docs| x bands) even at 100 TB input.

    ``max_bucket`` is the skew cap for 100 TB: a band bucket with k docs
    emits k² pairs, and boilerplate-heavy corpora produce giant buckets.
    Buckets above the cap are dropped (their members are so common that
    the exact-dup pass catches them anyway) — the same judgment as
    prune_frequent_shingles, applied at the band level."""
    sig = sig.persist()
    if max_bucket is not None:
        small = (
            sig.groupBy("band", "bs")
            .agg(F.count("*").alias("_k"))
            .filter(F.col("_k") <= max_bucket)
            .select("band", "bs")
        )
        sig = sig.join(F.broadcast(small), ["band", "bs"])
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
