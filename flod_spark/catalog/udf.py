"""User-defined stage surface (SURVEY §2.5 `udf_stage`).

flod's closest analog to a UDF is "any user struct with the right methods
is a stage" (traits.d:64-92) and the lambda-driven `pass!(E, fun)` source
(range.d:265-268). On Spark the stage-authoring surface is:

- scalar `pandas_udf`  — element-wise vectorized stage (Arrow batches);
- `mapInPandas`        — chunk-wise stage, the direct analog of flod's
                         peek/consume loop (iterator of batches in, out);
- `applyInPandas`      — grouped-map stage (partitioned peek/consume).

`udf_stage` registers the mapInPandas form because it is the one flod
users would reach for (whole-chunk custom logic). The computation inside
is deliberately SQL-expressible so DuckDB can oracle-check the plumbing
(Arrow round-trip, schema contract, batch iteration) bitwise: same IEEE
double ops in the same order on both sides.

100 TB notes: mapInPandas is a narrow transformation — no shuffle, no
driver involvement; each task streams Arrow batches through one Python
worker. Cost = serialization bandwidth, so select only needed columns
BEFORE the stage (column pruning cannot reach inside the Python fn).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flod_spark.io import load
from flod_spark.registry import query


def _charge_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Chunk-wise user stage: effective charge + price band per lineitem.

    Mirrors the oracle's expression order exactly:
    charge = (price * (1 - discount)) * (1 + tax), left-associated.
    """
    for b in batches:
        charge = (b["l_extendedprice"] * (1.0 - b["l_discount"])) * (1.0 + b["l_tax"])
        band = pd.Series("mid", index=b.index)
        band[charge < 20000.0] = "low"
        band[charge >= 60000.0] = "high"
        yield pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"],
                "l_linenumber": b["l_linenumber"],
                "charge": charge,
                "band": band,
            }
        )


@query(
    "udf_stage",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "  (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge, "
        "  CASE WHEN (l_extendedprice * (1 - l_discount)) * (1 + l_tax) < 20000 THEN 'low' "
        "       WHEN (l_extendedprice * (1 - l_discount)) * (1 + l_tax) >= 60000 THEN 'high' "
        "       ELSE 'mid' END AS band "
        "FROM lineitem"
    ),
)
def udf_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-authored chunk-wise stage via mapInPandas (Arrow-batched; the
    slow-path escape hatch used ONLY when built-ins can't express the
    logic — this example is SQL-expressible precisely so the oracle can
    verify the Python/Arrow plumbing end-to-end).

    Plan shape: pruned 5-column scan -> mapInPandas [narrow] -> done.
    Nothing shuffles; parallelism = scan splits.

    Scale: narrow Arrow stage; parallelism = scan splits; nothing
    shuffles."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
    )
    return li.mapInPandas(
        _charge_stage,
        schema="l_orderkey long, l_linenumber int, charge double, band string",
    )


@query(
    "udf_scalar",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "  (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge "
        "FROM lineitem"
    ),
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf flavor (element-wise, Arrow-vectorized): the
    same charge expression as udf_stage but authored as a column
    function — the stage shape for user math that composes with other
    column expressions. Narrow; pipelines with the scan.

    Scale: Arrow-vectorized narrow stage pipelining with the scan."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return (price * (1.0 - disc)) * (1.0 + tax)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@query(
    "udf_grouped_agg",
    oracle=(
        # the UDF's integer-cents sum == SUM(DECIMAL(18,2)); both exit
        # to double below 2^53 (exact), then the same two IEEE
        # divisions — bit-identical despite a Python aggregate
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items, "
        "  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED-AGG pandas_udf — the remaining stage-authoring flavor
    (scalar / grouped-map / mapInPandas / mapInArrow / UDTF are
    registered already): a user Python AGGREGATE usable inside
    groupBy().agg() next to built-ins. The exactness contract carries
    over: the group's quantities sum as integer cents in numpy
    (order-free, so pandas' row order — which shuffles decide — cannot
    move the result), and the two closing IEEE divisions mirror the
    oracle's decimal path.

    Scale: a grouped-agg UDF materializes EACH GROUP in one executor's
    memory (Arrow-transferred) — fine for bounded groups like these 3
    flags' partials... except it is NOT partial: unlike built-in
    aggregates there is no map-side combine, the full group's rows
    cross the exchange. That is the documented trade of the authoring
    surface — for unbounded groups express the aggregate as decimal
    built-ins (agg_group) or a two-phase mapInPandas summary
    (heavy_hitters' shape) instead."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def exact_avg_qty(q: pd.Series) -> float:
        # half-AWAY-FROM-ZERO to cents (floor(x*100+0.5), valid for the
        # non-negative quantities here) — pandas' .round() is half-to-
        # even, but the oracle's CAST(.. AS DECIMAL(18,2)) rounds half
        # away from zero in DuckDB, and the two diverge on exact .5
        # cents boundaries (ADVICE r6: 0.125 -> 12 vs 13)
        cents = int(np.floor(q * 100.0 + 0.5).astype("int64").sum())
        return (cents / 100.0) / len(q)

    # Spark refuses to mix grouped-agg pandas UDFs with built-in
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    # row count is a pandas aggregate too
    @pandas_udf("long")
    def n_rows(q: pd.Series) -> int:
        return len(q)

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        n_rows("l_quantity").alias("n_items"),
        exact_avg_qty("l_quantity").alias("avg_qty"),
    )


def _qty_share(b: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map user stage: each row's share of its group's total
    quantity. The group total is computed EXACTLY by summing integer
    cents (l_quantity has 2 decimals), so the result is independent of
    pandas' summation order and matches the oracle's DECIMAL window sum."""
    # half-away-from-zero (non-negative input), matching DECIMAL casts —
    # see exact_avg_qty for why pandas .round() (half-to-even) is wrong
    total = np.floor(b["l_quantity"] * 100.0 + 0.5).astype("int64").sum() / 100.0
    return pd.DataFrame(
        {
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": b["l_linenumber"],
            "l_returnflag": b["l_returnflag"],
            "qty_share": b["l_quantity"] / total,
        }
    )


@query(
    "udf_grouped",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_returnflag, "
        "  l_quantity / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) "
        "    OVER (PARTITION BY l_returnflag) AS DOUBLE) AS qty_share "
        "FROM lineitem"
    ),
)
def udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas flavor (flod's partitioned peek/consume):
    the user function sees one FULL group as a pandas DataFrame. Scale
    contract: the group must fit an executor (here: per-returnflag at
    gate scale; real pipelines key on bounded entities) — for unbounded
    groups use mapInPandas or a window expression instead. One shuffle
    on the group key.

    Scale: one shuffle on the group key; groups must fit an executor
    (key on bounded entities)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        _qty_share,
        schema="l_orderkey long, l_linenumber long, l_returnflag string, qty_share double",
    )


@query(
    "udf_table",
    oracle=(
        # fixed-width (100-char) segmentation with ordinal + offset —
        # the same walk the UDTF performs, via a correlated series
        "SELECT doc_id, CAST(i AS BIGINT) AS seg_no, "
        "  CAST((i - 1) * 100 AS BIGINT) AS char_offset, "
        "  CAST(length(substr(text, (i - 1) * 100 + 1, 100)) AS BIGINT) AS n_chars, "
        "  substr(text, (i - 1) * 100 + 1, 100) AS segment "
        "FROM (SELECT doc_id, text, "
        "    unnest(generate_series(1, CAST(ceil(length(text) / 100.0) AS BIGINT))) AS i "
        "  FROM documents)"
    ),
)
def udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function, Spark 3.5+/4.x) — the
    one->many stage-authoring surface the scalar/grouped/mapInPandas trio
    cannot express as a lateral join: each document expands to one row
    per fixed 100-char segment with ordinal + char offset (the chunking
    pass before a token-window model). flod analog: a byChunk-like stage
    authored as a user struct (traits.d:64-92, range.d:549-624) — here a
    plain Python class with a generator eval(). The walk is pure string
    arithmetic, so DuckDB oracles the whole Python round-trip exactly.

    Scale: UDTFs run row-at-a-time in Python — the SLOW path, justified
    only for genuinely one-to-many custom logic; for the hot path prefer
    the JVM posexplode form (by_chunk_arrays shows it). Narrow op, no
    shuffle; output rows stay in the parent task."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "doc_id bigint, seg_no bigint, char_offset bigint, n_chars bigint, segment string"
        )
    )
    class SegmentSplit:
        def eval(self, doc_id, text):
            t = str(text) if text is not None else ""
            for n, k in enumerate(range(0, len(t), 100)):
                seg = t[k : k + 100]
                yield (doc_id, n + 1, k, len(seg), seg)

    docs = load(spark, sf_dir, "documents")
    # lateral-join form: UDTF applied per input row
    spark.udtf.register("flod_segment_split", SegmentSplit)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT s.* FROM _udtf_docs, LATERAL flod_segment_split(doc_id, text) s"
    )


def _charge_stage_arrow(batches):
    """Chunk-wise user stage on RAW ARROW batches (no pandas
    materialization): the same effective-charge computation as
    _charge_stage, expressed with pyarrow.compute kernels. Mirrors the
    oracle's left-associated op order exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        price = b.column("l_extendedprice")
        disc = b.column("l_discount")
        tax = b.column("l_tax")
        charge = pc.multiply(
            pc.multiply(price, pc.subtract(pa.scalar(1.0), disc)),
            pc.add(pa.scalar(1.0), tax),
        )
        band = pc.if_else(
            pc.less(charge, pa.scalar(20000.0)),
            pa.scalar("low"),
            pc.if_else(
                pc.greater_equal(charge, pa.scalar(60000.0)),
                pa.scalar("high"),
                pa.scalar("mid"),
            ),
        )
        yield pa.RecordBatch.from_arrays(
            [b.column("l_orderkey"), b.column("l_linenumber"), charge, band],
            names=["l_orderkey", "l_linenumber", "charge", "band"],
        )


@query(
    "udf_arrow",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "  (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge, "
        "  CASE WHEN (l_extendedprice * (1 - l_discount)) * (1 + l_tax) < 20000 THEN 'low' "
        "       WHEN (l_extendedprice * (1 - l_discount)) * (1 + l_tax) >= 60000 THEN 'high' "
        "       ELSE 'mid' END AS band "
        "FROM lineitem"
    ),
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """udf_stage's computation through mapInArrow — the zero-copy stage
    surface: batches stay pyarrow RecordBatches end to end (no
    Arrow->pandas->Arrow conversion, no index bookkeeping, exact float
    semantics with no NaN/None coercions), which is the right authoring
    level for byte-oriented stages (codecs, tokenizers) where pandas
    materialization is pure overhead. Same oracle as udf_stage — the
    two stage APIs are proven computation-identical.

    Scale: identical shape to mapInPandas (narrow, Arrow-batched, no
    shuffle) minus the per-batch pandas conversion cost; parallelism =
    scan splits."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
    )
    return li.mapInArrow(
        _charge_stage_arrow,
        schema="l_orderkey long, l_linenumber int, charge double, band string",
    )
