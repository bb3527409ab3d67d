"""Ordered-stream convention (SURVEY.md §4.2-1).

flod pipelines are strictly order-preserving (the reference's chain tests
assert exact output prefixes — pipeline.d:1325-1347). Spark DataFrames are
unordered, so order-sensitive operators (take, by_line across chunks,
by_chunk regrouping) key on an explicit ``seq: long`` column.

``with_seq`` computes a gap-free global rank 0..n-1 over a total order
WITHOUT a single-partition window and WITHOUT caching the input:

1. A deterministic hash-sample of the order key (xxhash64 % rate == 0 —
   stable across re-evaluation, unlike RangePartitioner's RDD-id-seeded
   sampling) is collected to the driver and turned into P-1 boundary
   literals; sample size targets ~20·P keys regardless of input size
   (the rate adapts to the optimizer's size estimate).
2. ``bucket = Σ (key >= boundary_i)`` — a pure, deterministic expression,
   so every subtree that computes it agrees without any persist/reuse
   coordination.
3. Local rank within bucket (window partitioned by bucket — one hash
   exchange, parallel across buckets) + per-bucket counts rolled into
   cumulative offsets (a tiny P-row aggregate, broadcast-joined back).

At 100 TB: one pass to sample ~20·P keys, one hash exchange of the data,
a P-row offset table — nothing is cached, nothing is collected that
scales with rows. Boundary-sample quality affects only bucket BALANCE
(performance), never correctness: any deterministic bucketing that is
monotone in the total order yields the same seq.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SEQ = "seq"

_TARGET_SAMPLES_PER_PART = 20
_ASSUMED_ROW_BYTES = 64


def _sample_rate_mod(df: DataFrame, parts: int) -> int:
    """Power-of-two modulus so the expected sample is ~20·parts keys.
    Uses the optimizer's size estimate (parquet footer stats) — accuracy
    only affects sample size, not correctness."""
    try:
        est_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        est_bytes = 0
    est_rows = max(1, est_bytes // _ASSUMED_ROW_BYTES)
    want = max(1, est_rows // (_TARGET_SAMPLES_PER_PART * parts))
    mod = 1
    while mod < want and mod < (1 << 40):
        mod <<= 1
    return mod


def with_seq(df: DataFrame, *order_cols: str | Column, num_partitions: int | None = None) -> DataFrame:
    """Add a deterministic gap-free ``seq`` column ranking by ``order_cols``.

    ``order_cols`` must be a total order (add a unique key as tiebreak).
    """
    if not order_cols:
        raise ValueError("with_seq requires at least one order column")
    parts = int(num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    keyed = df.select("*", *[c.alias(f"_k{i}") for i, c in enumerate(cols)])
    knames = [f"_k{i}" for i in range(len(cols))]
    ktypes = {f.name: f.dataType for f in keyed.schema.fields if f.name in knames}

    # 1. deterministic boundary sample
    mod = _sample_rate_mod(df, parts)
    cap = 50 * _TARGET_SAMPLES_PER_PART * parts  # guard vs a bad size estimate
    sample = (
        keyed.select(*knames)
        .filter(F.pmod(F.xxhash64(*knames), F.lit(mod)) == 0)
        .limit(cap)
        .collect()
    )
    # null-containing keys are never boundaries (they'd make the struct
    # comparison three-valued); nulls sort first and land in bucket 0.
    sample = [r for r in sample if all(v is not None for v in r)]
    sample.sort(key=lambda r: tuple(r))
    step = max(1, len(sample) // parts)
    boundaries = [sample[i] for i in range(step, len(sample), step)][: parts - 1]
    # dedupe equal boundaries (massive ties collapse into one bucket)
    seen, uniq = set(), []
    for b in boundaries:
        t = tuple(b)
        if t not in seen:
            seen.add(t)
            uniq.append(b)

    # 2. pure deterministic bucket expression (monotone in the total order):
    # binary-search WHEN-tree over the boundaries — log2(P) struct
    # comparisons per row instead of P.
    key = F.struct(*[F.col(k) for k in knames])

    def blit(b):
        return F.struct(*[F.lit(b[k]).cast(ktypes[k]).alias(k) for k in knames])

    def search(lo: int, hi: int):  # bucket index within uniq[lo:hi] + lo
        if lo >= hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        # key >= uniq[mid] (null-safe false: null keys sort first)
        ge = F.coalesce((key >= blit(uniq[mid])).cast("boolean"), F.lit(False))
        return F.when(ge, search(mid + 1, hi)).otherwise(search(lo, mid))

    bucketed = keyed.withColumn("_bk", search(0, len(uniq)))

    # 3. local rank within bucket + cumulative bucket offsets (P rows).
    # One EXPLICIT hash exchange on _bk that BOTH subtrees consume: the
    # window's required distribution is already satisfied, and the counts
    # aggregate reads the same exchange — ReuseExchange dedupes it, so the
    # input is scanned and shuffled exactly once (a perf property only;
    # correctness never depends on reuse because _bk is deterministic).
    shuffled = bucketed.repartition(parts, "_bk")
    order_exprs = [F.col(k).asc_nulls_first() for k in knames]
    local = shuffled.withColumn(
        "_lrank", F.row_number().over(Window.partitionBy("_bk").orderBy(*order_exprs)) - 1
    )
    counts = shuffled.groupBy("_bk").agg(F.count("*").alias("_n"))
    # cumulative offsets WITHOUT a global-order window (a Window.orderBy
    # with no partitionBy funnels through ONE partition and logs the
    # WindowExec perf trap even on this P-row table): a triangular
    # self-join over counts is bounded at P^2 <= ~1k pairs by
    # construction and keeps the whole plan window-free.
    ca, cb = counts.alias("ca"), counts.alias("cb")
    offs = (
        ca.join(cb, F.col("cb._bk") < F.col("ca._bk"), "left")
        .groupBy(F.col("ca._bk").alias("_bk"))
        .agg(F.coalesce(F.sum("cb._n"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offs), "_bk")
        .withColumn(SEQ, F.col("_off") + F.col("_lrank"))
        .drop("_bk", "_lrank", "_off", *knames)
    )


def take_by_seq(df: DataFrame, n: int) -> DataFrame:
    """flod ``take(n)`` (package.d:114-199) on an ordered stream: first n by seq."""
    return df.filter(F.col(SEQ) < F.lit(n))
