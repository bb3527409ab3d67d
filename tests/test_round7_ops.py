"""Tests for the round-7 additions: the ADVICE r6 rounding/packing
regressions, and the operators registered this round."""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F  # noqa: F401  (used by later test classes)


class TestUdfGroupedAggRounding:
    def test_half_cent_rounds_away_from_zero_like_decimal_cast(self, spark, tmp_path):
        """ADVICE r6 regression: pandas .round() is half-to-even, so a
        quantity of 0.125 became 12 cents while the oracle's
        CAST(.. AS DECIMAL(18,2)) makes 13 in DuckDB. The fixed
        floor(q*100+0.5) must match the DECIMAL semantics on exact .5
        cent boundaries — checked against DuckDB running the actual
        registered oracle on the same parquet."""
        import duckdb

        from flod_spark.catalog.udf import udf_grouped_agg
        from flod_spark.registry import ORACLES

        d = str(tmp_path / "sfhalf")
        os.makedirs(d, exist_ok=True)
        # 0.125 and 0.135 both sit exactly on .5 cents; 3.0 is a control
        pd.DataFrame(
            {
                "l_returnflag": ["A", "A", "B"],
                "l_quantity": [0.125, 0.135, 3.0],
            }
        ).to_parquet(f"{d}/lineitem.parquet")
        got = {
            r["l_returnflag"]: (r["n_items"], r["avg_qty"])
            for r in udf_grouped_agg(spark, d).collect()
        }
        con = duckdb.connect()
        con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{d}/lineitem.parquet'")
        want = {
            r[0]: (r[1], r[2])
            for r in con.sql(ORACLES["udf_grouped_agg"]).fetchall()
        }
        assert got == want
        # and the A group really took the away-from-zero branch:
        # (13 + 14) cents / 2 rows, not half-to-even's (12 + 14) / 2
        assert got["A"] == (2, (27 / 100.0) / 2)


def _docs_dir(tmp_path, rows):
    d = str(tmp_path / "sfdocs")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(rows, columns=["doc_id", "lang", "text"]).astype(
        {"doc_id": "int64"}
    ).to_parquet(f"{d}/documents.parquet")
    return d


class TestStreamDedupMinhashLive:
    def test_arrival_prefix_semantics_on_planted_near_dups(self, spark, tmp_path):
        """Doc 1 arrives first and claims all its bands; doc 3 is an
        exact copy arriving later (all 4 bands dup); doc 4 is a light
        edit of doc 1 (high Jaccard — at least one band collides); doc
        2 is unrelated (zero dup bands). Asymmetry is the point: the
        EARLIER doc of a dup pair shows 0, unlike the symmetric batch
        pair report."""
        import random

        from flod_spark.catalog.streaming_live import stream_dedup_minhash_live

        rng = random.Random(7)
        alpha = "abcdefghij "
        base = "".join(rng.choice(alpha) for _ in range(2000))
        other = "".join(rng.choice(alpha) for _ in range(2000))
        near = base[:1990] + "zzzzzzzzzz"  # shared prefix, tiny tail edit
        d = _docs_dir(
            tmp_path,
            [(1, "en", base), (2, "en", other), (3, "en", base), (4, "en", near)],
        )
        got = {
            r["doc_id"]: (r["n_dup_bands"], r["near_dup"])
            for r in stream_dedup_minhash_live(spark, d).collect()
        }
        assert got[1] == (0, False)  # first arrival claims everything
        assert got[2] == (0, False)  # unrelated
        assert got[3] == (4, True)  # exact copy: every band claimed earlier
        assert got[4][0] >= 1 and got[4][1]  # near-dup: some band collides


class TestGraphJaccardApprox:
    def test_identical_sets_estimate_one(self, spark, tmp_path):
        """Two suppliers with IDENTICAL order sets share every min-hash
        (same set -> same min under every seed), so n_match = K and
        j_est = 1.0 exactly; a disjoint supplier matches (almost)
        nothing. Planted on a tiny lineitem."""
        from flod_spark.catalog.analytics import _GJA_K, graph_jaccard_approx

        d = str(tmp_path / "sfgja")
        os.makedirs(d, exist_ok=True)
        rows = []
        # suppliers 1 and 2: the same 10 orders; supplier 3: 10 others
        for o in range(100, 110):
            rows += [(o, 1), (o, 2)]
        for o in range(500, 510):
            rows.append((o, 3))
        pd.DataFrame(rows, columns=["l_orderkey", "l_suppkey"]).astype(
            "int64"
        ).to_parquet(f"{d}/lineitem.parquet")
        got = {
            (r["s1"], r["s2"]): (r["n_match"], r["j_est"])
            for r in graph_jaccard_approx(spark, d).collect()
        }
        assert got[(1, 2)] == (_GJA_K, 1.0)
        assert (1, 3) not in got and (2, 3) not in got

    def test_estimates_track_true_jaccard(self, spark, sf_dir):
        """Estimate-vs-exact on the gate graph: the sketch's mean
        absolute error against the true Jaccard must sit within the
        K=16 binomial noise budget (std ~ sqrt(J(1-J)/K) ~ 0.1 at the
        graph's J levels), and every estimate is a valid k/K fraction.
        (Enrichment-vs-baseline is untestable here: the sf0.001 graph
        has ~10 suppliers that ALL pairwise overlap at J ~ 0.2.)"""
        from flod_spark.catalog.analytics import _GJA_K, graph_jaccard_approx

        li = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
            .distinct()
        )
        deg = li.groupBy("s").agg(F.count("*").alias("d"))
        a, b = li.alias("a"), li.alias("b")
        exact = (
            a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
            .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
            .agg(F.count("*").alias("shared"))
            .join(deg.select(F.col("s").alias("s1"), F.col("d").alias("d1")), "s1")
            .join(deg.select(F.col("s").alias("s2"), F.col("d").alias("d2")), "s2")
            .select(
                "s1",
                "s2",
                (
                    F.col("shared").cast("double")
                    / (F.col("d1") + F.col("d2") - F.col("shared"))
                ).alias("j"),
            )
        )
        est = graph_jaccard_approx(spark, sf_dir)
        assert est.count() > 0
        picked = est.join(exact, ["s1", "s2"], "left").select(
            F.coalesce("j", F.lit(0.0)).alias("j"), "j_est"
        )
        mae = picked.agg(F.avg(F.abs(F.col("j_est") - F.col("j")))).first()[0]
        assert mae < 0.15, mae
        for r in est.select("n_match", "j_est").collect():
            assert r["j_est"] == r["n_match"] / _GJA_K
            assert 1 <= r["n_match"] <= _GJA_K


class TestJoinAsofDim:
    def test_version_flip_mid_stream(self, spark, tmp_path):
        """A key whose dimension version flips between two facts: the
        earlier fact reads the old version's value, the later fact the
        new one, a fact BEFORE the first version reads NULL, and a fact
        inside a tombstone interval reads the tombstone (op 'D'), NOT
        an older live version — the BETWEEN-join semantics the as-of
        carry must reproduce."""
        import datetime as dt

        from flod_spark.catalog.relational import join_asof_dim

        d = str(tmp_path / "sfscd")
        os.makedirs(d, exist_ok=True)
        # key 5 (op U by construction): versions at seq 1005 and 2005;
        # key 9 (op D): tombstone versions at 1009 and 2009
        pd.DataFrame(
            {
                "o_orderkey": pd.Series([1005, 2005, 1009, 2009], dtype="int64"),
                "o_totalprice": [10.0, 20.0, 66.0, 77.0],
            }
        ).to_parquet(f"{d}/orders.parquet")
        t = dt.datetime(2025, 1, 1)
        pd.DataFrame(
            {
                "event_id": pd.Series([500, 1500, 2500, 1509], dtype="int64"),
                "ts": pd.Series([t] * 4, dtype="datetime64[us]"),
                "user_id": pd.Series([5, 5, 5, 9], dtype="int64"),
                "event_type": ["view"] * 4,
                "value": [1.0] * 4,
                "props": ["{}"] * 4,
            }
        ).to_parquet(f"{d}/events.parquet")
        got = {
            r["event_id"]: (r["valid_from"], r["op"], r["val"])
            for r in join_asof_dim(spark, d).collect()
        }
        assert got[500] == (None, None, None)  # before any version
        assert got[1500] == (1005, "U", 10.0)  # old version
        assert got[2500] == (2005, "U", 20.0)  # flipped version
        assert got[1509] == (1009, "D", 66.0)  # tombstone, no fallback


class TestTextSegDedup:
    def test_first_occurrence_keeps_later_drops(self, spark, tmp_path):
        """Doc 1 owns its segments; doc 2 repeats doc 1's first 10
        tokens (one dup segment) plus 10 unique tokens; doc 3 repeats
        its OWN first segment (self-dup counts too — the second copy
        is dropped)."""
        from flod_spark.catalog.text import text_seg_dedup

        seg_a = " ".join(f"alpha{i}" for i in range(10))
        seg_b = " ".join(f"beta{i}" for i in range(10))
        seg_c = " ".join(f"gamma{i}" for i in range(10))
        seg_d = " ".join(f"delta{i}" for i in range(10))
        d = _docs_dir(
            tmp_path,
            [
                (1, "en", seg_a + " " + seg_b),
                (2, "en", seg_a + " " + seg_c),
                (3, "en", seg_d + " " + seg_d),
            ],
        )
        got = {
            r["doc_id"]: (r["n_segs"], r["n_dup_segs"])
            for r in text_seg_dedup(spark, d).collect()
        }
        assert got[1] == (2, 0)  # first occurrences of both segments
        assert got[2] == (2, 1)  # seg_a already claimed by doc 1
        assert got[3] == (2, 1)  # second copy of its own segment


class TestDedupSemanticText:
    def test_rare_tokens_dominate_boilerplate(self, spark, tmp_path):
        """Two docs share rare vocabulary but differ in corpus-wide
        boilerplate -> SAME signature (the weighted win). The
        boilerplate tokens appear in every doc (weight ~1) while the
        shared rare tokens (df=1-2, weight ~ilog2(N)) dominate the
        votes. Sanity: a doc with disjoint rare vocabulary gets a
        different signature."""
        from flod_spark.catalog.dedup import dedup_semantic_text

        # 4 boilerplate tokens/doc, appearing in EVERY doc (df = N ->
        # weight 1, so |boiler vote| <= 4 per bit) vs 5 shared rare
        # tokens (df = 2; with N = 43 docs, weight = ilog2(43) -
        # ilog2(2) + 1 = 5, and an ODD count keeps the rare margin >=
        # 5 per bit) — rare vocabulary dominates STRICTLY, so the
        # collision is deterministic, not a lucky vote
        boiler_a = "the quick brown fox"
        boiler_b = "some fast red wolf"
        rare1 = "zyxwvut qponmlk jihgfed tsrqpon mlkjihg"
        rare2 = "aabbccdd eeffgghh iijjkkll mmnnoopp qqrrsstt"
        rows = [
            (1, "en", boiler_a + " " + rare1),
            (2, "en", boiler_b + " " + rare1),
            (3, "en", boiler_a + " " + rare2),
        ]
        # pad the corpus so boilerplate df is maximal (weight 1)
        for i in range(4, 44):
            rows.append((i, "en", boiler_a + " " + boiler_b + f" filler{i}"))
        d = _docs_dir(tmp_path, rows)
        got = {
            r["doc_id"]: (r["simhash"], r["canonical_id"])
            for r in dedup_semantic_text(spark, d).collect()
        }
        assert got[1][0] == got[2][0], "shared rare vocab must collide"
        assert got[2][1] == 1  # canonical = min doc_id of the pair
        assert got[3][0] != got[1][0], "disjoint rare vocab must differ"


class TestWindowEwma:
    def test_matches_python_model(self, spark, tmp_path):
        """Closed-form check against a plain Python model of the
        truncated adjusted EWM (weights 2^(H-1-k) over existing lags),
        including the short-prefix renormalization."""
        import datetime as dt

        from flod_spark.catalog.relational import _EWMA_H, _EWMA_W, window_ewma

        t0 = dt.datetime(2025, 1, 1)
        vals = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0, 256.0, 512.0]
        d = str(tmp_path / "sfewma")
        os.makedirs(d, exist_ok=True)
        pd.DataFrame(
            {
                "event_id": pd.Series(range(1, len(vals) + 1), dtype="int64"),
                "ts": pd.Series(
                    [t0 + dt.timedelta(minutes=i) for i in range(len(vals))],
                    dtype="datetime64[us]",
                ),
                "user_id": pd.Series([1] * len(vals), dtype="int64"),
                "event_type": ["view"] * len(vals),
                "value": vals,
                "props": ["{}"] * len(vals),
            }
        ).to_parquet(f"{d}/events.parquet")
        got = {
            r["event_id"]: r["ewma_8"] for r in window_ewma(spark, d).collect()
        }
        for t in range(len(vals)):
            ks = range(min(t + 1, _EWMA_H))
            num = sum(_EWMA_W[k] * vals[t - k] for k in ks)
            den = sum(_EWMA_W[k] for k in ks)
            assert got[t + 1] == num / den, t


class TestAggHyperloglogExact:
    def test_estimate_within_sketch_error(self, spark, sf_dir):
        """HLL with m=64 registers carries ~13% standard error (linear
        counting tightens the small range); pin a 3-sigma-ish 35%
        relative-error ceiling per group, plus estimator sanity."""
        from flod_spark.catalog.analytics import agg_hyperloglog_exact

        rows = agg_hyperloglog_exact(spark, sf_dir).collect()
        assert rows
        for r in rows:
            rel = abs(r["hll_est"] - r["n_true"]) / r["n_true"]
            assert rel < 0.35, (r["event_type"], r["n_true"], r["hll_est"])
            assert 0 <= r["n_zero_regs"] <= 64


class TestStreamHllLive:
    def test_rows_identical_to_batch(self, spark, sf_dir):
        """The live register build MAX-merges the same (group, register,
        rank) rows the batch build aggregates, so the drained estimate
        must be ROW-IDENTICAL to agg_hyperloglog_exact — the
        batch/stream agreement extended to cardinality sketches."""
        from flod_spark.catalog.analytics import agg_hyperloglog_exact
        from flod_spark.catalog.streaming_live import stream_hll_live

        live = {tuple(r) for r in stream_hll_live(spark, sf_dir).collect()}
        batch = {tuple(r) for r in agg_hyperloglog_exact(spark, sf_dir).collect()}
        assert live == batch and live


class TestAggBitmapDistinct:
    def test_exact_equals_count_distinct(self, spark, sf_dir):
        """The bitmap count is EXACT — it must equal COUNT(DISTINCT)
        per group, bit for bit, and the live twin must be row-identical
        to the batch form (OR-monotone emission argument)."""
        from flod_spark.catalog.analytics import agg_bitmap_distinct
        from flod_spark.catalog.streaming_live import stream_bitmap_distinct_live

        got = {
            r["event_type"]: r["n_distinct"]
            for r in agg_bitmap_distinct(spark, sf_dir).collect()
        }
        truth = {
            r["event_type"]: r["n"]
            for r in spark.read.parquet(f"{sf_dir}/events.parquet")
            .filter(F.col("user_id").isNotNull())
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert got == truth and got
        live = {tuple(r) for r in stream_bitmap_distinct_live(spark, sf_dir).collect()}
        batch = {tuple(r) for r in agg_bitmap_distinct(spark, sf_dir).collect()}
        assert live == batch


class TestGraphKcore:
    def test_fixpoint_and_core_property(self, spark, sf_dir):
        """The bounded peel must have CONVERGED at gate scale (one more
        peel changes nothing) — then the output really is the k-core:
        every surviving node's degree within the core is >= k."""
        from flod_spark.catalog.analytics import graph_kcore

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        e0 = (
            o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .select(
                F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
                F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
            )
            .distinct()
        )
        sym = e0.unionByName(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        k = sym.agg(
            F.expr("cast(count(*) as bigint) div (2 * count(distinct a))")
        ).first()[0]
        got = {r["node"]: r["degree"] for r in graph_kcore(spark, sf_dir).collect()}
        assert got, "peel emptied the graph — k is miscalibrated"
        assert min(got.values()) >= k  # converged: nobody left to peel
        # and it peeled SOMETHING (non-vacuous at gate scale)
        n_nodes = sym.select("a").distinct().count()
        assert len(got) < n_nodes


class TestSimMips:
    def test_norm_wins_over_angle(self, spark, tmp_path):
        """The MIPS-vs-cosine separation, planted: the query's nearest
        neighbor BY ANGLE is a short vector, but a longer vector at a
        wider angle carries a bigger inner product — MIPS must rank the
        long one first (cosine would invert it)."""
        import numpy as np

        from flod_spark.catalog.similarity import DIM, sim_mips

        d = str(tmp_path / "sfmips")
        os.makedirs(d, exist_ok=True)
        q = np.zeros(DIM, dtype="float32"); q[0] = 1.0
        same_dir_short = q * 0.5                      # cos 1.0, ip 0.5
        wide_long = np.zeros(DIM, dtype="float32")
        wide_long[0] = 2.0; wide_long[1] = 2.0        # cos 0.707, ip 2.0
        filler = np.zeros(DIM, dtype="float32"); filler[2] = 0.1
        rows = [(0, q), (1, same_dir_short), (2, wide_long), (3, filler)]
        # sim_mips takes the first NQ vec_ids as queries; only query 0
        # matters here, the rest pad determinism
        pd.DataFrame(
            {
                "vec_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "embedding": [r[1].tolist() for r in rows],
                "label": pd.Series([0] * len(rows), dtype="int32"),
            }
        ).to_parquet(f"{d}/embeddings.parquet")
        got = {
            (r["query_id"], r["rk"]): r["neighbor_id"]
            for r in sim_mips(spark, d).collect()
        }
        assert got[(0, 1)] == 2  # the long wide vector wins on ip
        assert got[(0, 2)] == 1  # the short aligned one is second


class TestOrdersMarketBasket:
    def test_planted_baskets_support_and_lift(self, spark, tmp_path):
        """Three orders: parts (1,2) co-occur twice (kept, support 2),
        (1,3) once (dropped by the floor). Lift checked against the
        hand-computed P(1,2)/(P(1)P(2))."""
        from flod_spark.catalog.analytics import orders_market_basket

        d = str(tmp_path / "sfmb")
        os.makedirs(d, exist_ok=True)
        rows = [(10, 1), (10, 2), (20, 1), (20, 2), (30, 1), (30, 3)]
        pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).astype(
            "int64"
        ).to_parquet(f"{d}/lineitem.parquet")
        got = {
            (r["p1"], r["p2"]): (r["support"], r["lift"])
            for r in orders_market_basket(spark, d).collect()
        }
        # N=3 orders; c(1)=3, c(2)=2, c(3)=1; support(1,2)=2
        assert got == {(1, 2): (2, (2 * 3) / (3 * 2))}


class TestStreamMarketBasketLive:
    def test_rows_identical_to_batch(self, spark, sf001_dir):
        """Pair supports are add-monotone, so the drained live support
        table (plus the shared lift phase) must be ROW-IDENTICAL to
        the batch mining."""
        from flod_spark.catalog.analytics import orders_market_basket
        from flod_spark.catalog.streaming_live import stream_market_basket_live

        live = {tuple(r) for r in stream_market_basket_live(spark, sf001_dir).collect()}
        batch = {tuple(r) for r in orders_market_basket(spark, sf001_dir).collect()}
        assert live == batch and live


class TestHistogramHeatmap:
    def test_mass_conservation_and_bounds(self, spark, sf_dir):
        """Cell counts sum to the event count, hours are 0-23, value
        bins 0..B-1 — the invariants any 2-D profile must keep."""
        from flod_spark.catalog.relational import _HM_BINS, histogram_heatmap

        rows = histogram_heatmap(spark, sf_dir).collect()
        total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert sum(r["n"] for r in rows) == total
        for r in rows:
            assert 0 <= r["hour_of_day"] <= 23
            assert 0 <= r["vbin"] < _HM_BINS


class TestSampleGroupK:
    def test_exactly_k_per_group_and_small_group_whole(self, spark, tmp_path):
        """A group larger than k yields exactly k rows; a group smaller
        than k yields all of itself — the per-stratum guarantee a rate
        sample cannot give."""
        from flod_spark.catalog.sampling import SAMPLE_GROUP_K, sample_group_k

        rows = [(i, "en", "t", "web") for i in range(100)]
        rows += [(1000 + i, "fi", "t", "web") for i in range(3)]
        d = str(tmp_path / "sfgk")
        os.makedirs(d, exist_ok=True)
        pd.DataFrame(
            rows, columns=["doc_id", "lang", "text", "source"]
        ).astype({"doc_id": "int64"}).to_parquet(f"{d}/documents.parquet")
        got = sample_group_k(spark, d).groupBy("lang").count().collect()
        sizes = {r["lang"]: r["count"] for r in got}
        assert sizes == {"en": SAMPLE_GROUP_K, "fi": 3}


class TestRound7EmptyInputs:
    """Every new batch op must return an empty (or degenerate-correct)
    frame — not crash — on empty inputs (regenerated testdata
    insurance, the r6 convention)."""

    def test_doc_ops_survive_empty_documents(self, spark, tmp_path):
        from flod_spark.catalog.dedup import dedup_semantic_text
        from flod_spark.catalog.text import text_seg_dedup

        d = _docs_dir(tmp_path, [])
        for fn in (dedup_semantic_text, text_seg_dedup):
            assert fn(spark, d).count() == 0, fn.__name__

    def test_event_ops_survive_empty_events(self, spark, tmp_path):
        from flod_spark.catalog.analytics import agg_hyperloglog_exact
        from flod_spark.catalog.relational import window_ewma
        from flod_spark.catalog.sampling import split_time_embargo

        d = str(tmp_path / "sfempty")
        os.makedirs(d, exist_ok=True)
        pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "user_id": pd.Series([], dtype="int64"),
                "event_type": pd.Series([], dtype="object"),
                "value": pd.Series([], dtype="float64"),
                "props": pd.Series([], dtype="object"),
            }
        ).to_parquet(f"{d}/events.parquet")
        for fn in (agg_hyperloglog_exact, window_ewma, split_time_embargo):
            assert fn(spark, d).count() == 0, fn.__name__

    def test_graph_ops_survive_empty_lineitem(self, spark, tmp_path):
        from flod_spark.catalog.analytics import graph_jaccard_approx, graph_kcore

        d = str(tmp_path / "sfemptyli")
        os.makedirs(d, exist_ok=True)
        pd.DataFrame(
            {
                "l_orderkey": pd.Series([], dtype="int64"),
                "l_suppkey": pd.Series([], dtype="int64"),
            }
        ).to_parquet(f"{d}/lineitem.parquet")
        pd.DataFrame(
            {
                "o_orderkey": pd.Series([], dtype="int64"),
                "o_custkey": pd.Series([], dtype="int64"),
            }
        ).to_parquet(f"{d}/orders.parquet")
        assert graph_jaccard_approx(spark, d).count() == 0
        assert graph_kcore(spark, d).count() == 0  # NULL-k guard path

    def test_seg_dedup_empty_text_doc(self, spark, tmp_path):
        """A present-but-empty document reports (0, 0, NULL) — zero
        segments, not a crash and not a phantom empty-string segment."""
        from flod_spark.catalog.text import text_seg_dedup

        d = _docs_dir(tmp_path, [(1, "en", ""), (2, "en", "alpha beta")])
        got = {
            r["doc_id"]: (r["n_segs"], r["n_dup_segs"], r["dup_frac"])
            for r in text_seg_dedup(spark, d).collect()
        }
        assert got[1] == (0, 0, None)
        assert got[2] == (1, 0, 0.0)


class TestSplitTimeEmbargo:
    def test_partition_and_gap_invariants(self, spark, sf_dir):
        """The three sides partition the corpus, the embargo really
        separates them: max train ts + embargo < min test ts, and no
        event is lost or double-counted."""
        import duckdb

        from flod_spark.catalog.sampling import _STE_EMBARGO_US, split_time_embargo

        got = {r["split"]: r for r in split_time_embargo(spark, sf_dir).collect()}
        total = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'"
        ).fetchone()[0]
        assert sum(r["n_events"] for r in got.values()) == total
        assert got["train"]["n_events"] > 0 and got["test"]["n_events"] > 0
        gap_us = (
            got["test"]["min_ts"] - got["train"]["max_ts"]
        ).total_seconds() * 1e6
        assert gap_us > _STE_EMBARGO_US



class TestJoinLateralTopn:
    def test_per_customer_cap_and_order(self, spark, sf001_dir):
        """Every customer yields at most 3 rows, descending by price
        (o_orderkey tiebreak), and only customers WITH orders appear
        (inner lateral semantics)."""
        from flod_spark.catalog.relational import join_lateral_topn

        rows = join_lateral_topn(spark, sf001_dir).collect()
        assert rows
        by_c: dict = {}
        for r in rows:
            by_c.setdefault(r["c_custkey"], []).append(
                (r["o_totalprice"], r["o_orderkey"])
            )
        o = spark.read.parquet(f"{sf001_dir}/orders.parquet")
        with_orders = {r[0] for r in o.select("o_custkey").distinct().collect()}
        assert set(by_c) <= with_orders
        for c, lst in by_c.items():
            assert len(lst) <= 3
            ranked = sorted(lst, key=lambda t: (-t[0], t[1]))
            assert lst == ranked or sorted(lst) == sorted(ranked)


class TestAggSkewness:
    def test_symmetric_zero_skewed_positive_allequal_null(self, spark, tmp_path):
        """A symmetric group has m3 = 0 in exact arithmetic -> skewness
        0.0; a right-skewed group is positive; an all-equal group has
        m2 = 0 exactly -> NULL (not NaN)."""
        import datetime as dt

        from flod_spark.catalog.relational import agg_skewness

        t0 = dt.datetime(2025, 1, 1)
        rows = []
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0]):  # symmetric
            rows.append((i, t0, 1, "sym", v, "{}"))
        for i, v in enumerate([1.0, 1.0, 1.0, 10.0]):  # right tail
            rows.append((100 + i, t0, 1, "skew", v, "{}"))
        for i in range(4):  # all equal
            rows.append((200 + i, t0, 1, "flat", 7.0, "{}"))
        d = str(tmp_path / "sfskew")
        os.makedirs(d, exist_ok=True)
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        ).astype(
            {"event_id": "int64", "user_id": "int64", "ts": "datetime64[us]"}
        ).to_parquet(f"{d}/events.parquet")
        got = {r["event_type"]: r for r in agg_skewness(spark, d).collect()}
        assert got["sym"]["skewness"] == 0.0
        assert got["skew"]["skewness"] > 1.0
        assert got["flat"]["skewness"] is None
        assert got["flat"]["mean"] == 7.0
