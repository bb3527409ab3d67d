"""Corpus-layout operators: deterministic shuffle + sequence packing.

The last stage of an LLM training-data pipeline lays the cleaned corpus
out for the trainer: a reproducible global shuffle (so epoch order is
stable across reruns and resumable mid-epoch) and sequence packing
(concatenate documents, chop into fixed token-budget contexts — the
"concat-and-chop" packing GPT-style pretraining uses).

flod has no ordering/layout surface (its streams preserve arrival order,
SURVEY.md §2.5); both ops enter via the driver's LLM-data mandate like
the dedup/sampling families.

Scale notes (100 TB):
- sample_shuffle: order key is md5(salt || doc_id) — uniform, so the
  range partitioning with_seq derives from its hash-sampled boundaries
  is balanced BY CONSTRUCTION (no skewed-key hotspots possible). One
  hash exchange + a P-row offset broadcast; nothing driver-side scales
  with rows (seq.py docstring).
- pack_sequences: packing is shard-local — the window partitions on a
  uniform hash shard, so each shard's cumulative sum is an independent
  task and NSHARDS is just re-tuned to ~cluster parallelism at scale
  (trainers shard their input identically: one packed stream per data
  loader). No global order, no single-partition window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flod_spark.catalog.text import BPE_RE
from flod_spark.functions.hashbridge import salted_mod, salted_mod_sql
from flod_spark.io import load
from flod_spark.registry import query
from flod_spark.seq import SEQ, with_seq

NSHARDS = 32
PACK_BUDGET = 2048  # tokens per packed training sequence


def _shard_col() -> F.Column:
    """Uniform deterministic shard of the salted doc_id
    (functions/hashbridge.py — the one salted-md5 hex-int bridge)."""
    return salted_mod(F.col("doc_id"), "k|", NSHARDS)


_SHARD_SQL = salted_mod_sql("doc_id", "k|", NSHARDS)


@query(
    "pack_sequences",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        f"    CAST(length(regexp_extract_all(lower(text), '{BPE_RE}')) AS BIGINT) AS n_tokens, "
        f"    {_SHARD_SQL} AS shard FROM documents), "
        "o AS (SELECT doc_id, shard, n_tokens, "
        "    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id "
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS tok_offset "
        "  FROM t) "
        "SELECT doc_id, shard, n_tokens, tok_offset, "
        f"  shard * 1000000 + (tok_offset // {PACK_BUDGET}) AS pack_id "
        "FROM o"
    ),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop sequence packing: within each hash shard, documents
    are laid end-to-end in doc_id order; a document's pack is the
    PACK_BUDGET-token context its first token falls into (documents
    straddle context boundaries, exactly like pretraining token streams).
    Output is the layout manifest (doc -> shard, token offset, pack id)
    a packing job writes for the trainer.

    Plan shape: token count is a map-only JVM regexp; the only exchange
    is the hash partition on shard; the running sum is a within-shard
    window (no global order). DuckDB's SUM() OVER yields HUGEINT, hence
    the CAST to BIGINT in the oracle (the stream_session lesson).

    Scale: one hash exchange on the uniform shard key; the running sum
    is a within-shard window (no global order)."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), F.lit(0)))
        .cast("long")
        .alias("n_tokens"),
        _shard_col().alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = t.withColumn("tok_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return o.select(
        "doc_id",
        "shard",
        "n_tokens",
        "tok_offset",
        (F.col("shard") * 1000000 + F.expr(f"tok_offset div {PACK_BUDGET}")).alias("pack_id"),
    )


@query(
    "sample_shuffle",
    oracle=(
        "SELECT doc_id, CAST(ROW_NUMBER() OVER ("
        "  ORDER BY md5('sh|' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS pos "
        "FROM documents"
    ),
)
def sample_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle: position = rank in md5-hash
    order (salted, so independent of the sample/split/shard decisions).
    Reproducible across runs and cluster sizes — rerunning the pipeline
    yields the identical epoch order, and a trainer can resume mid-epoch.

    Scale: rank comes from with_seq (seq.py) — hash-sampled range
    boundaries, one exchange, P-row offset broadcast; never a global
    single-partition sort. The md5 key makes every range bucket uniform,
    so the exchange cannot skew regardless of doc_id distribution."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    key = F.md5(F.concat(F.lit("sh|"), F.col("doc_id").cast("string")).cast("binary"))
    keyed = docs.withColumn("_skey", key)
    return with_seq(keyed, "_skey", "doc_id").select("doc_id", F.col(SEQ).alias("pos"))


_BUCKET_EDGES = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def _bucket_case_sql(n: str) -> str:
    case = "CASE "
    for e in _BUCKET_EDGES:
        case += f"WHEN {n} <= {e} THEN {e} "
    return case + f"ELSE {2 * _BUCKET_EDGES[-1]} END"


@query(
    "length_buckets",
    oracle=(
        "WITH t AS (SELECT lang, "
        f"    CAST(length(regexp_extract_all(lower(text), '{BPE_RE}')) AS BIGINT) AS n_tok "
        "  FROM documents) "
        f"SELECT lang, CAST({_bucket_case_sql('n_tok')} AS BIGINT) AS bucket, "
        "  CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "  CAST(SUM(n_tok) AS BIGINT) AS total_tokens, "
        f"  CAST(SUM({_bucket_case_sql('n_tok')} - n_tok) AS BIGINT) AS padding_waste "
        "FROM t GROUP BY 1, 2"
    ),
)
def length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length bucketing for batch assembly: each doc lands in the
    smallest power-of-two token bucket that holds it, and the report
    prices the padding a pad-to-bucket batcher would burn per (lang,
    bucket) — the stat that decides pack-vs-pad for a training run (the
    alternative layout to pack_sequences' concat-and-chop). The bucket
    ladder is a pure integer CASE (no float log2), so both engines agree
    exactly. Scale: map-side tokenize + partial agg; the exchange
    carries |langs x buckets| rows."""
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), F.lit(0))).cast("long")
    expr = None
    for e in _BUCKET_EDGES:
        expr = F.when(F.col("n_tok") <= e, e) if expr is None else expr.when(F.col("n_tok") <= e, e)
    bucket = expr.otherwise(2 * _BUCKET_EDGES[-1]).cast("long")
    return (
        docs.select("lang", n_tok.alias("n_tok"))
        .withColumn("bucket", bucket)
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(F.col("bucket") - F.col("n_tok")).alias("padding_waste"),
        )
    )
