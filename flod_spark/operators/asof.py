"""As-of (backward) join — SURVEY.md §2.5 extension.

Algorithm (the scale-first formulation):
  1. Tag right rows side=0, left rows side=1; union them.
  2. ONE shuffle: window partitioned by key, ordered by (t, side, tiebreak).
  3. Carry the most recent right payload with last(..., ignorenulls=True)
     over an unbounded-preceding frame; left rows read the carried value.

Right rows sort before left rows at equal t, so a right row with t == left.t
matches (<= semantics); among equal-t right rows the max tiebreak wins.

Cost at 100 TB: one hash exchange on the key + a local per-key sort — same
shape as any windowed agg; NO conditional-join row explosion (a naive
left.join(right, key AND t<=t) is O(|L_k|·|R_k|) per key). Skewed keys:
salt the key and run two passes (carried value re-merged), or feed through
AQE skew-split since the window is monotone in t.

Pandas alternative (merge_asof via applyInPandas) is implemented in
tests for cross-validation but the window form is the production path —
it stays JVM-side with whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    left_cols: dict[str, str],
    right_cols: dict[str, str],
    tiebreak: str,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.t <= left.t within the same `on` key.

    left_cols / right_cols: {source_col: output_name} payload selections.
    tiebreak: right column breaking equal-t ties (max wins). how: inner|left.
    """
    r_payload = F.struct(*[F.col(c).alias(o) for c, o in right_cols.items()])
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        r_payload.alias("_rp"),
    )
    l_payload = F.struct(*[F.col(c).alias(o) for c, o in left_cols.items()])
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        l_payload.alias("_lp"),
    )
    unioned = r.withColumn("_lp", F.lit(None).cast(l.schema["_lp"].dataType)).unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last("_rp", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    if how == "inner":
        out = out.filter(F.col("_match").isNotNull())
    left_outs = [F.col(f"_lp.{o}").alias(o) for o in left_cols.values()]
    right_outs = [F.col(f"_match.{o}").alias(o) for o in right_cols.values()]
    return out.select(F.col("_k").alias(on), *left_outs, *right_outs)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    left_cols: dict[str, str],
    right_cols: dict[str, str],
    tiebreak: str,
) -> DataFrame:
    """pandas ``merge_asof(direction='nearest')`` semantics: for each
    left row, the right row minimizing |right.t - left.t| within the
    key; ties between the two directions go BACKWARD (the <= match),
    matching merge_asof. Among equal-t right rows, backward picks the
    max ``tiebreak`` and forward the min — both mirrored in the oracle.

    Same single-shuffle shape as :func:`asof_join`: one union, one
    window sort, and TWO frames over it — a backward carry
    (last non-null right payload up to the current row) and a forward
    carry (first non-null right payload after it; equal-t rights sort
    before left rows, so the forward frame is strictly-greater t, which
    is exactly right since equal-t already matched backward). The
    left-outer contract keeps left rows with no right at all."""
    from flod_spark.io import ts_micros  # the one NTZ-safe epoch bridge

    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        F.struct(
            *[F.col(c).alias(o) for c, o in right_cols.items()],
            ts_micros(right_time).alias("_tus"),
        ).alias("_rp"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        F.struct(*[F.col(c).alias(o) for c, o in left_cols.items()]).alias("_lp"),
    )
    unioned = r.withColumn("_lp", F.lit(None).cast(l.schema["_lp"].dataType)).unionByName(l)
    base = Window.partitionBy("_k").orderBy(
        F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_last()
    )
    back = F.last("_rp", ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.first("_rp", ignorenulls=True).over(
        base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "_k", "_t", "_side", "_lp", back.alias("_b"), fwd.alias("_f")
    ).filter(F.col("_side") == 1)
    lt_us = ts_micros("_t")
    pick_back = F.col("_f").isNull() | (
        F.col("_b").isNotNull()
        & ((lt_us - F.col("_b._tus")) <= (F.col("_f._tus") - lt_us))
    )
    chosen = F.when(pick_back, F.col("_b")).otherwise(F.col("_f"))
    direction = F.when(chosen.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(pick_back, F.lit("back")).otherwise(F.lit("fwd"))
    )
    left_outs = [F.col(f"_lp.{o}").alias(o) for o in left_cols.values()]
    right_outs = [chosen[o].alias(o) for o in right_cols.values()]
    return carried.select(
        F.col("_k").alias(on), *left_outs, *right_outs, direction.alias("direction")
    )
