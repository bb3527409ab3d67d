"""Semantic invariants for the corpus-level training-data ops
(decontaminate, dedup_apply, token_histogram). Oracle equivalence is
covered by tools/parity.py; these tests pin the semantics that the
oracle comparison alone can't express (exclusions, monotonicity,
cross-op consistency)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_decontaminate_excludes_benchmark_and_flags_consistently(spark, sf_dir):
    from flod_spark.catalog.dedup import DECON_BENCH_MOD, DECON_MIN_OVERLAP, decontaminate
    from flod_spark.io import load

    out = decontaminate(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents").select("doc_id").collect()
    train_ids = {r.doc_id for r in docs if r.doc_id % DECON_BENCH_MOD != 0}

    assert {r.doc_id for r in out} == train_ids  # every train doc, no bench doc
    for r in out:
        assert r.n_shared >= 0
        assert r.contaminated == (r.n_shared >= DECON_MIN_OVERLAP)


def test_decontaminate_planted_benchmark_copy_is_flagged(spark):
    """A train doc that IS a benchmark doc's text must be contaminated."""
    import pandas as pd

    from flod_spark.catalog.dedup import decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog " * 10
    pdf = pd.DataFrame(
        {
            "doc_id": [20, 41, 43],  # 20 -> benchmark (id % 20 == 0)
            "text": [bench_text, bench_text, "completely unrelated content zzz"],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [len(bench_text), len(bench_text), 32],
        }
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "documents.parquet"))
        rows = {r.doc_id: r for r in decontaminate(spark, d).collect()}
    assert rows[41].contaminated
    assert not rows[43].contaminated


def test_dedup_apply_keeps_exactly_the_cluster_keepers(spark, sf_dir):
    from flod_spark.catalog.dedup import dedup_apply, dedup_cluster
    from flod_spark.io import load

    kept = {r.doc_id for r in dedup_apply(spark, sf_dir).select("doc_id").collect()}
    cc = dedup_cluster(spark, sf_dir).collect()
    keepers = {r.doc_id for r in cc if not r.is_dup}
    assert kept == keepers
    assert 0 < len(kept) <= load(spark, sf_dir, "documents").count()


def test_token_histogram_ordering_and_bounds(spark, sf_dir):
    from flod_spark.catalog.text import TOPK_TOKENS, token_histogram

    rows = token_histogram(spark, sf_dir).collect()
    assert 0 < len(rows) <= TOPK_TOKENS
    occ = [r.n_occur for r in rows]
    assert occ == sorted(occ, reverse=True)
    for r in rows:
        assert 1 <= r.n_docs <= r.n_occur
    # ties at equal n_occur break on token ascending (deterministic cut)
    for a, b in zip(rows, rows[1:]):
        if a.n_occur == b.n_occur:
            assert a.token < b.token


def test_embed_centroids_matches_numpy(spark, sf_dir):
    import numpy as np

    from flod_spark.catalog.similarity import embed_centroids
    from flod_spark.io import load

    out = embed_centroids(spark, sf_dir).collect()
    emb = load(spark, sf_dir, "embeddings").select("label", "embedding").collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(r.embedding)

    n_labels = len(by_label)
    dim = len(emb[0].embedding)
    assert len(out) == n_labels * dim

    for r in out:
        m = np.array(by_label[r.label], dtype=np.float64)
        assert r.n_vecs == len(m)
        v = m[:, r.pos - 1]
        assert abs(r.centroid - v.mean()) < 1e-9  # 2^-40 quantization only
        assert abs(r.dispersion - v.var()) < 1e-9
        assert r.dispersion >= -1e-9


def test_agg_approx_error_bounds(spark, sf_dir):
    """No oracle possible (engine-specific sketches) — gate accuracy
    against the exact aggregates instead: HLL++ default rsd is 5%,
    percentile_approx at accuracy 10000 is near-exact at this SF."""
    from pyspark.sql import functions as F

    from flod_spark.catalog.relational import agg_approx, agg_distinct
    from flod_spark.io import load

    approx = {r.l_returnflag: r for r in agg_approx(spark, sf_dir).collect()}
    exact = {r.l_returnflag: r for r in agg_distinct(spark, sf_dir).collect()}
    li = load(spark, sf_dir, "lineitem")
    emed = {
        r.l_returnflag: r.m
        for r in li.groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", F.lit(0.5)).alias("m"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, a in approx.items():
        assert abs(a.approx_parts - exact[k].n_parts) <= 0.15 * exact[k].n_parts
        assert abs(a.approx_supps - exact[k].n_supps) <= 0.15 * exact[k].n_supps
        assert a.n_rows == exact[k].n_rows
        # accuracy=10000 over ~2k rows/group: within 1% of the exact median
        assert abs(a.approx_median_price - emed[k]) <= 0.01 * emed[k]


def test_pipeline_corpus_filters_chain(spark):
    import flod_spark as fs
    from flod_spark.catalog.text import QUALITY_MIN_CHARS

    good = (
        "the cat and the dog went to the market and it was a fine day for all of "
        "them to walk in the sun with many other friendly animals nearby today"
    )
    bad_short = "too short"
    # passes quality (has stopwords, long enough) but is pure repetition
    bad_repeat = ("the spam and spam " * 15).strip()
    p = fs.from_array(spark, [good, bad_short, bad_repeat], type_hint="string")

    q = p.quality_filter().to_array()
    assert [r.value for r in q] == [good, bad_repeat]  # length+stopword rule
    assert len(good) >= QUALITY_MIN_CHARS

    r = p.repetition_filter().to_array()
    assert [r.value for r in r] == [good, bad_short]  # dup-gram rule

    both = p.quality_filter().repetition_filter().to_array()
    assert [x.value for x in both] == [good]


def test_pipeline_decontaminate_matches_catalog_rule(spark):
    import flod_spark as fs

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    leaked = "prefix words then alpha beta gamma delta epsilon and more"
    clean = "completely different phrasing with no overlap at all here"
    bench = fs.from_array(spark, [bench_text], type_hint="string")
    p = fs.from_array(spark, [leaked, clean], type_hint="string")
    out = p.decontaminate(bench).to_array()
    assert [r.value for r in out] == [clean]

    # empty benchmark: nothing drops
    empty = fs.from_array(spark, ["a b"], type_hint="string")  # < 5 tokens -> no grams
    assert len(p.decontaminate(empty).to_array()) == 2


def test_pipeline_filters_preserve_order_and_reseq(spark):
    import flod_spark as fs

    texts = [f"doc {i} " + ("the cat sat on the mat and it was good " * 4) for i in range(6)]
    texts[2] = "x"  # fails quality
    p = fs.from_array(spark, texts, type_hint="string").ordered_by("value")
    out = p.quality_filter()
    rows = out.df.select("seq").collect()
    assert sorted(r.seq for r in rows) == list(range(5))  # gap-free reseq


def test_dedup_url_variants_collapse_to_canonical_groups(spark, sf_dir):
    """The planted case/port/tracking/trailing-slash/fragment variants
    must ALL collapse: exactly one canon per doc_id%100 group (so 100
    distinct canons), with no dangling '?'/'&'/'/' artifacts left by the
    tracking-param strip (the '?&id=7' regression)."""
    from flod_spark.catalog import text

    out = text.dedup_url(spark, sf_dir).cache()
    per_group = (
        out.groupBy((F.col("doc_id") % 100).alias("g"))
        .agg(F.countDistinct("canon").alias("n_canon"))
        .collect()
    )
    assert all(r.n_canon == 1 for r in per_group)
    assert out.select("canon").distinct().count() == 100
    bad = out.filter(
        F.col("canon").rlike("[?&]$") | F.col("canon").contains("?&") | F.col("canon").rlike("/[?]")
    )
    assert bad.count() == 0
    out.unpersist()


def test_ngram_lm_score_invariants(spark, sf_dir):
    """Quantized bigram log-probs: every score is <= 0 (MLE p <= 1, and
    floor-log2 quantization preserves that), a doc's n_bigrams is its
    token count minus one, and the normalized score is the exact ratio
    of the two integer columns."""
    from flod_spark.catalog import text

    out = text.ngram_lm(spark, sf_dir).cache()
    assert out.filter(F.col("q_log2") > 0).count() == 0
    assert out.filter(F.col("bits_per_bigram") > 0).count() == 0
    # n_bigrams == n_tokens - 1 (docs with >= 2 tokens)
    toks = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(text.TOKEN_RE), F.lit(0))).alias("nt"),
    )
    j = out.join(toks, "doc_id")
    assert j.filter(F.col("n_bigrams") != F.col("nt") - 1).count() == 0
    bad = j.filter(
        F.col("bits_per_bigram")
        != F.col("q_log2").cast("double") / F.col("n_bigrams").cast("double")
    )
    assert bad.count() == 0
    out.unpersist()


def test_tfidf_terms_rank_contract(spark, sf_dir):
    """Exactly ranks 1..k per doc with distinct terms, and the rank-1
    term's quantized tf-idf score is >= every other ranked term's."""
    from flod_spark.catalog import text

    out = text.tfidf_terms(spark, sf_dir).cache()
    per_doc = (
        out.groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("rk")).alias("rks"),
            F.countDistinct("term").alias("nt"),
            F.max(F.when(F.col("rk") == 1, (F.col("tf") * 100000) / F.col("df"))).alias("s1"),
            F.min((F.col("tf") * 100000) / F.col("df")).alias("smin"),
        )
        .collect()
    )
    for r in per_doc:
        assert r.rks == list(range(1, len(r.rks) + 1))
        assert r.nt == len(r.rks)
        assert r.s1 >= r.smin - 1e-9
    out.unpersist()


def test_dedup_verify_jaccard_invariants(spark, sf_dir):
    """Verification-stage sanity: jaccard in [0,1]; intersection bounded
    by both set sizes; every LSH candidate pair appears exactly once."""
    from flod_spark.catalog.dedup import dedup_verify

    rows = dedup_verify(spark, sf_dir).collect()
    assert rows, "LSH produced no candidate pairs at this SF"
    seen = set()
    for r in rows:
        key = (r["doc_a"], r["doc_b"])
        assert key not in seen and r["doc_a"] < r["doc_b"]
        seen.add(key)
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["n_common"] <= min(r["n_a"], r["n_b"])
        assert r["is_dup"] == (r["jaccard"] >= 0.8)


def test_snapshot_diff_statuses_partition_by_plant(spark, sf_dir):
    """The planted split fully determines each doc's status."""
    from flod_spark.catalog.dedup import snapshot_diff

    for r in snapshot_diff(spark, sf_dir).collect():
        want = {0: "removed", 1: "added", 2: "changed"}.get(r["doc_id"] % 10, "same")
        assert r["status"] == want, (r["doc_id"], r["status"])


def test_winnow_fingerprint_is_position_robust(spark):
    """The property md5 fingerprints lack and winnowing guarantees: a
    passage shared between two documents selects (mostly) the same
    hashes regardless of WHERE it appears, so the sketch overlap
    detects partial duplication. Also pins the density guarantee
    (>= one selected hash per window) and rolling==direct sanity via
    identical docs."""
    import random

    from flod_spark.catalog.text import winnow_sketch

    rng = random.Random(7)
    alpha = "abcdefghij "
    passage = "".join(rng.choice(alpha) for _ in range(400))
    pre = "".join(rng.choice(alpha) for _ in range(300))
    post = "".join(rng.choice(alpha) for _ in range(250))
    docs = spark.createDataFrame(
        [
            (1, passage + post),       # passage at the start
            (2, pre + passage),        # same passage, shifted 300 chars
            (3, pre + post),           # no passage at all
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in winnow_sketch(docs, keep_hashes=True).collect()}
    s1, s2, s3 = (set(got[i]["sel_hashes"]) for i in (1, 2, 3))
    # shared passage -> strong sketch overlap despite the offset
    assert len(s1 & s2) >= 0.5 * min(len(s1), len(s2))
    # doc 3 shares pre/post fragments with 1 and 2 but NOT the passage;
    # its overlap with doc 1 (which has only `post` in common) is smaller
    assert len(s1 & s3) < len(s1 & s2)
    # density guarantee: at least one selection per window of 8 grams
    for r in got.values():
        assert r["n_selected"] >= r["n_grams"] // 8 // 2  # loose lower bound


def test_rolling_recurrence_equals_direct_horner(spark):
    """The Karp-Rabin identity: the O(n) rolling recurrence (kept in
    rolling_gram_hashes) and the per-position Horner fold the hot path
    uses produce identical mod-P residues — on text long enough to
    exercise many subtract-and-renormalize steps."""
    import random

    from pyspark.sql import functions as F

    from flod_spark.catalog.text import _KR_B, _KR_K, _KR_P, rolling_gram_hashes

    rng = random.Random(11)
    txt = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz .,!") for _ in range(500))
    df = spark.createDataFrame([(1, txt)], "doc_id long, t string")
    codes = F.transform(
        F.sequence(F.lit(1), F.length("t")),
        lambda i: F.ascii(F.col("t").substr(i, F.lit(1))).cast("long"),
    )
    d = df.select(codes.alias("codes"))
    direct = F.transform(
        F.sequence(F.lit(1), F.size("codes") - (_KR_K - 1)),
        lambda i: F.aggregate(
            F.slice(F.col("codes"), i, _KR_K),
            F.lit(0).cast("long"),
            lambda a, c: (a * _KR_B + c) % _KR_P,
        ),
    )
    row = d.select(
        direct.alias("direct"), rolling_gram_hashes(F.col("codes")).alias("rolled")
    ).collect()[0]
    assert len(row["direct"]) == 500 - _KR_K + 1
    assert row["direct"] == row["rolled"]


def test_winnow_arrow_kernel_matches_jvm_expression_form(spark, sf_dir):
    """The gated Arrow/numpy kernel and the pure-Catalyst expression
    form (winnow_sketch) must agree row-for-row — sketch hex included —
    on real documents."""
    from flod_spark.catalog.text import fingerprint_winnow, winnow_sketch
    from flod_spark.io import load

    fast = {r["doc_id"]: r for r in fingerprint_winnow(spark, sf_dir).collect()}
    ref = {r["doc_id"]: r for r in winnow_sketch(load(spark, sf_dir, "documents")).collect()}
    assert set(fast) == set(ref) and fast
    for k, r in ref.items():
        f = fast[k]
        assert (f["n_grams"], f["n_selected"], f["fp_sketch"]) == (
            r["n_grams"], r["n_selected"], r["fp_sketch"]
        ), k


def test_substring_dup_planted_passage_coverage(spark):
    """dedup_substring's core on planted data: two docs sharing a long
    passage both report dup coverage close to the passage length, a
    fully-unique doc reports zero, and an exact full copy reports
    near-total coverage. Pin the exactness direction too: dup_chars
    never exceeds n_chars."""
    import random

    from flod_spark.catalog.text import _KR_K, _KR_W, substring_dup_report

    rng = random.Random(11)
    alpha = "abcdefghij "
    passage = "".join(rng.choice(alpha) for _ in range(500))
    pre = "".join(rng.choice(alpha) for _ in range(300))
    post = "".join(rng.choice(alpha) for _ in range(300))
    other = "".join(rng.choice(alpha) for _ in range(600))
    full = pre + passage  # docs 1 & 4 are byte-identical
    docs = spark.createDataFrame(
        [
            (1, full),              # passage at the end
            (2, passage + post),    # same passage at the start
            (3, other),             # fully unique
            (4, full),              # exact copy of doc 1
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in substring_dup_report(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    for r in got.values():
        assert 0 <= r["dup_chars"] <= r["n_chars"]
        assert abs(r["dup_frac"] - r["dup_chars"] / r["n_chars"]) < 1e-12
    # the unique doc: no shared anchors at all
    assert got[3]["n_shared_anchors"] == 0 and got[3]["dup_chars"] == 0
    # exact copies cover (nearly) everything — every anchor is shared
    assert got[4]["dup_chars"] == got[1]["dup_chars"]
    assert got[1]["dup_frac"] > 0.8
    # the partially-shared pair: coverage is in the passage's ballpark
    # (anchors near the splice boundary legitimately differ), and well
    # below the full doc
    lo = len(passage) * 0.5
    hi = len(passage) + (_KR_K + _KR_W) * 2
    assert lo <= got[2]["dup_chars"] <= hi
    assert got[2]["dup_frac"] < 0.95
