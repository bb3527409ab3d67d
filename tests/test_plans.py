"""Physical-plan assertions — the 100 TB design gate (task mandate):
filters/projections reach the parquet scan, small dims broadcast, global
top-k avoids full sorts, whole-stage codegen covers the hot path."""

from __future__ import annotations

from pyspark.sql import functions as F

from flod_spark.catalog.relational import join_equi, sort_topk, tpch_q6
from flod_spark.catalog.surface import take_limit


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_q6_pushes_filters_and_prunes_columns(spark, sf_dir):
    plan = plan_of(tpch_q6(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    # only the 4 needed columns are read
    read = plan.split("ReadSchema")[1][:400]
    assert "l_extendedprice" in read and "l_returnflag" not in read


def test_join_equi_broadcasts_dims(spark, sf_dir):
    plan = plan_of(join_equi(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle at this SF


def test_topk_avoids_global_sort(spark, sf_dir):
    assert "TakeOrderedAndProject" in plan_of(sort_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan_of(take_limit(spark, sf_dir))


def test_codegen_covers_scan_filter(spark, sf_dir):
    # AQE wraps the plan and reports codegen only post-execution; assert on
    # the static plan (AQE off) that scan->filter->partial-agg is fused.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(tpch_q6(spark, sf_dir))
        # formatted mode marks fused operators with [codegen id : N]
        assert "[codegen id : 1]" in plan
        # scan->filter->project->partial agg all in the same codegen stage
        assert plan.count("[codegen id : 1]") >= 3
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Reading one partition of a partitionBy write shows PartitionFilters
    and lists only that directory's files."""
    from pyspark.sql import functions as F

    from flod_spark.io import load

    o = load(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    pruned = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    p = plan_of(pruned)
    assert "PartitionFilters" in p and "o_orderstatus" in p.split("PartitionFilters")[1][:200]


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Joining two tables bucketed on the join key runs with ZERO shuffle
    exchanges (SortMergeJoin directly over bucketed scans)."""
    import uuid

    from flod_spark.io import load

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    tag = uuid.uuid4().hex[:8]
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    to, tl = f"t_bo_{tag}", f"t_bl_{tag}"
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(to)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tl)
    try:
        bo, bl = spark.table(to), spark.table(tl)
        joined = bo.join(bl, bl.l_orderkey == bo.o_orderkey)
        p = plan_of(joined)
        assert "Exchange hashpartitioning" not in p, p
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {to}")
        spark.sql(f"DROP TABLE IF EXISTS {tl}")


def test_stratified_sample_uses_window_group_limit(spark, sf_dir):
    # rank<=k must truncate per task BEFORE the exchange (stratum-skew
    # immunity) — WindowGroupLimit in the plan is that guarantee
    from flod_spark.catalog.sampling import sample_hash, sample_stratified

    assert "WindowGroupLimit" in plan_of(sample_stratified(spark, sf_dir))
    # the uniform sample is a pure scan-fused filter: no exchange at all
    assert "Exchange" not in plan_of(sample_hash(spark, sf_dir))


def test_dedup_ngram_bounds_posting_lists(spark, sf_dir):
    # the rank<=cap+1 prune must compile to WindowGroupLimit — it is the
    # memory bound for hot shingles (see catalog/dedup.py::dedup_ngram)
    from flod_spark.catalog.dedup import dedup_ngram

    assert "WindowGroupLimit" in plan_of(dedup_ngram(spark, sf_dir))


def test_sim_ivf_broadcasts_centroids(spark, sf_dir):
    # centroid set and probe map must broadcast; the corpus must never
    # sort-merge against them
    from flod_spark.catalog.similarity import sim_ivf

    plan = plan_of(sim_ivf(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    # the benchmark gram set must broadcast — the corpus side of the
    # collision join never shuffles its n-grams
    from flod_spark.catalog.dedup import decontaminate

    plan = plan_of(decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the only SMJ allowed is the final doc_id left join at this SF;
    # no n-gram column may feed a sort-merge join
    for frag in plan.split("SortMergeJoin")[1:]:
        assert "g#" not in frag[:80]


def test_tpch_q5_broadcasts_dim_chain(spark, sf_dir):
    # region->nation chain and supplier must broadcast; fact joins may
    # co-shuffle (custkey/orderkey) but dims must never sort-merge
    from flod_spark.catalog.relational import tpch_q5

    plan = plan_of(tpch_q5(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_embed_centroids_single_exchange(spark, sf_dir):
    # posexplode + partial-agg: exactly one shuffle, keyed (label, pos)
    from flod_spark.catalog.similarity import embed_centroids

    import re

    plan = plan_of(embed_centroids(spark, sf_dir))
    # formatted mode's detail section: exactly one "(N) Exchange" entry,
    # keyed on (label, pos)
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "hashpartitioning(label" in plan


def test_token_histogram_topk_no_global_sort(spark, sf_dir):
    # the top-K cut must be TakeOrderedAndProject (per-partition heaps),
    # never a global Sort of the full token table
    from flod_spark.catalog.text import token_histogram

    assert "TakeOrderedAndProject" in plan_of(token_histogram(spark, sf_dir))


def test_tpch_q1_pushes_filter_and_prunes(spark, sf_dir):
    from flod_spark.catalog.relational import tpch_q1

    plan = plan_of(tpch_q1(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    read = plan.split("ReadSchema")[1][:500]
    # 7 needed columns read, join keys not among them
    assert "l_tax" in read and "l_orderkey" not in read
    assert "HashAggregate" in plan


def test_simhash_pairs_shuffles_signatures_not_text(spark, sf_dir):
    """The band self-join must exchange only (band, bits, doc_id, sig) —
    the document text stays behind the signature aggregation."""
    from flod_spark.catalog.dedup import simhash_pairs

    plan = plan_of(simhash_pairs(spark, sf_dir))
    # hashpartitioning exchanges = the join/agg shuffles; the RoundRobin
    # ones are io._respread's deliberate small-input spread of the scan
    ex = [seg[:300] for seg in plan.split("Exchange")[1:] if "hashpartitioning" in seg[:300]]
    assert ex, "expected at least one hash exchange (band join / degree agg)"
    assert not any("text" in seg or " t#" in seg for seg in ex)


def test_simhash_pairs_band_buckets_capped(spark, sf_dir):
    """The gated plan ships the hot-bucket bound: the per-(band, bucket)
    row_number cap compiles to WindowGroupLimit (pruned before the join
    exchange), and at test scale every 16-bit band bucket holds far
    fewer distinct signatures than SIMHASH_BUCKET_CAP — so the cap
    never binds and the brute-force oracle stays exact, while the plan
    that would run at 100x carries the bound structurally."""
    from flod_spark.catalog.dedup import SIMHASH_BUCKET_CAP, simhash_pairs

    df = simhash_pairs(spark, sf_dir)
    plan = plan_of(df)
    assert "WindowGroupLimit" in plan
    # recompute bucket occupancy from the same signature definition the
    # query uses (distinct (hi, lo) per (band, 16-bit value))
    from flod_spark.catalog.dedup import _norm_col
    from flod_spark.io import load as _load

    docs = _load(spark, sf_dir, "documents")
    norm = docs.select("doc_id", _norm_col().alias("t"))
    tok = norm.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.col("t"), F.lit("[a-z0-9]+"), F.lit(0))
            )
        ).alias("tk"),
    ).distinct()
    tokh = tok.select(
        "doc_id",
        F.md5(F.col("tk").cast("binary")).alias("h1"),
        F.md5(F.concat(F.lit("x"), F.col("tk")).cast("binary")).alias("h2"),
    )
    vote = lambda h, p: F.sum(  # noqa: E731
        F.when(F.instr(F.lit("89abcdef"), F.substring(h, p, 1)) > 0, 1).otherwise(-1)
    )
    v = tokh.groupBy("doc_id").agg(
        *[vote("h1", p).alias(f"a{p}") for p in range(1, 33)],
        *[vote("h2", p).alias(f"b{p}") for p in range(1, 33)],
    )

    def pack(prefix):
        s = None
        for p in range(1, 33):
            term = F.when(
                F.col(f"{prefix}{p}") >= 0, F.lit(1 << (32 - p)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            s = term if s is None else s + term
        return s

    sgrp = (
        v.select(pack("a").alias("hi"), pack("b").alias("lo"))
        .groupBy("hi", "lo")
        .count()
    )
    buckets = sgrp.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(half, sh)
                        .bitwiseAND(F.lit(65535))
                        .alias("bits"),
                    )
                    for b, (half, sh) in enumerate(
                        [("hi", 16), ("hi", 0), ("lo", 16), ("lo", 0)]
                    )
                ]
            )
        ).alias("e")
    ).groupBy("e.band", "e.bits").count()
    mx = buckets.agg(F.max("count")).collect()[0][0]
    assert mx <= SIMHASH_BUCKET_CAP, "cap violated"
    assert mx < SIMHASH_BUCKET_CAP, "cap binds at test scale — oracle no longer exact"


def test_pii_scrub_is_map_only(spark, sf_dir):
    from flod_spark.catalog.text import pii_scrub

    plan = plan_of(pii_scrub(spark, sf_dir))
    assert "Exchange" not in plan  # pure narrow regexp stage


def test_sample_exact_k_uses_topk_not_global_sort(spark, sf_dir):
    from flod_spark.catalog.sampling import sample_exact_k

    plan = plan_of(sample_exact_k(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_embed_quantize_is_map_only(spark, sf_dir):
    from flod_spark.catalog.similarity import embed_quantize

    plan = plan_of(embed_quantize(spark, sf_dir))
    assert "Exchange" not in plan  # narrow transform, pipelines with the scan


def test_tpch_q9_dims_broadcast_single_fact_shuffle(spark, sf_dir):
    # part slice / supplier / nation must broadcast; only the orderkey
    # fact join may shuffle (and even that can broadcast at tiny SF)
    from flod_spark.catalog.relational import tpch_q9

    plan = plan_of(tpch_q9(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") <= 1


def test_tpch_q16_not_in_becomes_broadcast_anti(spark, sf_dir):
    # the NOT-IN supplier exclusion must compile to a broadcast anti
    # join — never a shuffle of lineitem against 100 suppliers
    from flod_spark.catalog.relational import tpch_q16

    plan = plan_of(tpch_q16(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Whole-registry plan-shape gate (round-3 verdict item 3)

# (shuffle exchanges, sort-merge joins) pinned per bench-headline query at
# sf0.001 — a new exchange or a broadcast that degrades to SMJ is a plan
# regression this test catches before the bench does.
HEADLINE_PINS = {
    "agg_group": (1, 0),
    "tpch_q6": (0, 0),
    "join_equi": (1, 0),
    "join_asof": (1, 0),
    "window_rank": (1, 0),
    "sort_topk": (0, 0),
    "by_chunk": (4, 0),
    "stream_session": (1, 0),
    "stream_window": (1, 0),
    "dedup_exact": (1, 0),
    "dedup_minhash": (3, 0),
    "sim_topk": (1, 0),
    "text_stats": (0, 0),
    "take_limit": (0, 0),
    "tpch_q3": (1, 0),
    "tpch_q5": (4, 1),
    "codec_gzip": (0, 0),
    "udf_stage": (0, 0),
    "dedup_ngram": (6, 0),
    "tpch_q1": (1, 0),
    "media_decode": (0, 0),
    "tpch_q9": (2, 0),
    "tpch_q2": (5, 1),
    "dedup_verify": (3, 0),
    "fingerprint_winnow": (0, 0),
    # round-5 bench additions (values = PLANS.md at introduction)
    "dedup_substring": (4, 0),
    "media_decode_png": (0, 0),
    "heavy_hitters": (2, 0),
    "triangle_count": (5, 2),
    "sort_zorder": (1, 0),
    "rollup_hierarchy": (1, 0),
    "join_fuzzy": (4, 0),
    # round-6 bench additions (fingerprinted at sf0.001 at introduction)
    "bars_ohlc": (1, 0),
    "bm25_score": (0, 0),
    "join_bloom": (1, 0),
    "sketch_countmin": (3, 0),
    "window_rolling_regression": (1, 0),
    "entity_resolve": (5, 1),
    # r16: 6 -> 5 — _assign_cells went map-side (broadcast centroid
    # array + array_max argmax), removing the groupBy(vec_id, v)
    # exchange that shuffled the vector payload
    "sim_ivfpq": (5, 1),
    "quantile_exact_2pass": (0, 0),
    # round-7 additions (fingerprinted at sf0.001 at introduction)
    "graph_jaccard_approx": (7, 0),
    "dedup_semantic_text": (5, 0),
    "join_asof_dim": (1, 0),
    "text_seg_dedup": (2, 0),
    "window_ewma": (1, 0),
    "split_time_embargo": (2, 0),
    "agg_hyperloglog_exact": (6, 0),
    # localCheckpoint truncates the peel lineage, so only the final
    # degree aggregate shows — the O(1)-plan-per-round property itself
    "graph_kcore": (1, 0),
    "sim_mips": (1, 0),
    "agg_bitmap_distinct": (2, 0),
    # basket build localCheckpointed; pair + part counts remain
    "orders_market_basket": (3, 0),
    "sample_group_k": (1, 0),
    "histogram_heatmap": (1, 0),
    # Catalyst decorrelates the LATERAL subquery into join + WindowGroupLimit
    "join_lateral_topn": (1, 0),
    "agg_skewness": (1, 0),
    # round-8 additions (fingerprinted at sf0.001 at introduction)
    "sim_mips_ann": (2, 0),
    "agg_diversity": (2, 0),
    "agg_argminmax": (1, 0),
    "window_cusum": (1, 0),
    "window_drawdown": (1, 0),
    # priorities are map-only; the top-k is TakeOrderedAndProject
    "sample_weighted_k": (0, 0),
    "sample_token_budget": (1, 0),
    "orders_pareto_abc": (2, 0),
    # ev + regs_t localCheckpointed (shared frames); the union of the
    # per-type and rolled-up estimate paths costs the extra exchanges
    # over agg_hyperloglog_exact's 6
    "agg_hll_rollup": (8, 0),
    # late round-8 additions
    "window_rsi": (1, 0),
    # cohort table localCheckpointed (size count + fact join share it)
    "orders_cohort_ltv": (3, 0),
    "media_frame_sample": (0, 0),
    "bpe_apply": (2, 0),
    # the merge-table result is a local frame; the loop's per-round
    # plans are driver-iterated (kmeans_iter precedent)
    "bpe_train_iter": (0, 0),
    # round-9 additions (fingerprinted at sf0.001 at introduction)
    "window_bollinger": (1, 0),
    # gram-hash claim + per-doc recount + the doc_id base join
    "ngram_novelty": (3, 0),
    # basket build localCheckpointed (cnt + pair paths share it)
    "orders_assoc_rules": (3, 0),
    "sample_importance_reweight": (2, 0),
    "sample_token_budget_sharded": (1, 0),
    # the power-iteration result is a local frame; per-round plans are
    # driver-iterated (kmeans_iter / bpe_train_iter precedent)
    "embed_pca_power_iter": (0, 0),
    # op + frequent-pair table localCheckpointed; the pair count and
    # the final triple count remain
    "orders_basket_triples": (2, 0),
    # round-11 additions (fingerprinted at sf0.001 at introduction)
    # binaryFile scan + Arrow member split, map-only
    "scan_archive": (0, 0),
    # driver-loop twins: per-round plans are driver-iterated and the
    # returned frame reads checkpointed state (the embed_pca_power_iter
    # precedent); kcore's final degree aggregate is the one exchange
    "pagerank_converged": (0, 0),
    "kcore_converged": (1, 0),
    "pca_power_converged": (0, 0),
    "kmeans_fit": (0, 0),
    # round-12 additions (fingerprinted at sf0.001 at introduction)
    # the shard pack+write is eager (applyInPandas collect); the gated
    # read-back is binaryFile + Arrow member split, map-only
    "sink_tar_shards": (0, 0),
    # r15: the lifecycle gates serve through serve_and_cleanup (an
    # eager localCheckpoint so the temp state trees can be swept) —
    # the admission/serve exchanges run at materialization and the
    # RETURNED plan is the checkpoint scan (the sim_ivfpq_compacted
    # precedent); the live plan shapes stay pinned by
    # test_bucketed_claims_anti_join_has_no_claims_shuffle and the
    # PartitionFilters pins
    "dedup_incremental": (0, 0),
    "sim_pq_adc_persisted": (0, 0),
    "sim_ivfpq_persisted": (0, 0),
    # prefix-retrieve rank + full-dim rerank rank, one exchange
    "sim_mrl_rerank": (1, 0),
    # late round-12 additions (fingerprinted at sf0.001 at introduction)
    # the streamed/eager writes happen before the gated read-back; the
    # returned plan is binaryFile + Arrow member split, map-only
    "sink_warc_shards": (0, 0),
    "stream_sink_tar_live": (0, 0),
    "stream_curate_loop_live": (0, 0),
    # r15: serve_and_cleanup checkpoint scan (see dedup_incremental)
    "dedup_minhash_incremental": (0, 0),
    # packed-sign Hamming scan (16 B/row crosses the rank exchange) +
    # candidate-only vector fetch via broadcast join-back + the
    # candidate-sized rerank exchange
    "sim_binary_rerank": (2, 0),
    # r15: serve_and_cleanup checkpoint scans (see dedup_incremental)
    "scan_wds_samples": (0, 0),
    "sim_ivfpq_advanced": (0, 0),
    # index build/write are eager; the lookup plan is needle-sized
    # groupBys + broadcast joins around the ONE pruned data scan
    "scan_bloom_pruned": (4, 0),
    # shard-local split+pivot inside one Arrow stage — zero shuffle
    "stream_wds_samples_live": (0, 0),
    # lag window + running session-id sum + ordered-list agg all share
    # the one user_id exchange
    "conversation_pack": (1, 0),
}


def test_headline_exchange_counts_pinned(spark, sf_dir):
    """Every bench-headline query keeps its pinned (exchange, SMJ)
    counts — shuffle-count creep is the quiet way a 1.7x win erodes."""
    import __spark_entry__ as entry
    from tools.plan_report import fingerprint

    qs = entry.queries()
    got = {}
    for name, (ex, smj) in HEADLINE_PINS.items():
        # cold-plan fingerprints: a materialized cache entry left by an
        # earlier test (lsh_candidate_pairs persists its signature table
        # by design) substitutes InMemoryRelation stats into identical
        # subtrees and flips broadcast decisions — clear per query
        spark.catalog.clearCache()
        p = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        f = fingerprint(p)
        got[name] = (f["ex"], f["smj"])
    assert got == HEADLINE_PINS


def test_no_unpartitioned_windows_in_any_registered_query(spark, sf_dir):
    """ZERO order-only (single-partition) Window nodes across the whole
    registry — the one plan shape that cannot survive 100x data. Runs
    every batch query's physical plan through the same detector
    PLANS.md reports (tools/plan_report.py::unpartitioned_windows)."""
    from tools.plan_report import iter_plans, unpartitioned_windows

    offenders = {}
    for name, plan in iter_plans(spark, sf_dir):
        hits = unpartitioned_windows(plan)
        if hits:
            offenders[name] = hits[0]
    assert not offenders, offenders
