"""Round-8 operator tests: bounded-state lossy counting (the market
basket eviction handoff), plus pins for the new r8 registrations."""

from __future__ import annotations

from pyspark.sql import functions as F


def _true_pair_supports(spark, sf_dir):
    """Exact (p1, p2) -> support over distinct parts per order — the
    same basket/pair semantics the streaming forms replay."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    op = li.distinct()
    pairs = (
        op.alias("a")
        .join(op.alias("b"), "o")
        .filter(F.col("a.p") < F.col("b.p"))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count("*").alias("support"))
    )
    return {(r.p1, r.p2): r.support for r in pairs.collect()}


def test_lossy_market_basket_guarantees(spark, sf_dir):
    """The Manku–Motwani contract on the replayed basket stream
    (B = 4 micro-batch buckets):
    1. no false dismissals above the bucket count — every pair with
       true support > B survives to the final state,
    2. bounded undercount — c <= true support <= c + d per survivor,
    3. eviction actually runs — the final state is strictly smaller
       than the ever-observed pair set, and every per-(shard, bucket)
       emission is too."""
    from flod_spark.catalog.streaming_live import stream_market_basket_bounded

    true = _true_pair_supports(spark, sf_dir)
    got = {
        (r.p1, r.p2): (r.c, r.d)
        for r in stream_market_basket_bounded(spark, sf_dir).collect()
    }
    B = 4
    heavy = {k for k, s in true.items() if s > B}
    missing = heavy - set(got)
    assert not missing, f"pairs above the bucket bound evicted: {sorted(missing)[:5]}"
    for k, (c, d) in got.items():
        assert c <= true[k] <= c + d, (k, c, d, true[k])
        assert d <= B
    # 3: state is bounded below the ever-seen pair space
    assert len(got) < len(true)
    em = stream_market_basket_bounded(spark, sf_dir, emissions=True)
    sizes = (
        em.groupBy("shard", "bucket").agg(
            F.count("*").alias("n"),
            F.sum(F.col("k").isNull().cast("int")).alias("markers"),
        ).collect()
    )
    assert sizes and all(r.n - 1 < len(true) for r in sizes)
    # the bucket-marker contract: exactly one k=NULL row per
    # (shard, trigger-with-data) — what keeps an all-evicted final
    # bucket from resurrecting the previous bucket's survivors
    assert all(r.markers == 1 for r in sizes)


def test_lossy_shard_fn_eviction_unit():
    """Driver-side unit check of the shard fold itself: a singleton
    NEVER survives its insertion bucket (c + delta = 1 + (b-1) <= b —
    classic Manku–Motwani), whether it arrives early or late; a key
    recurring every bucket survives with an exact count; a late key
    that recurs within its insertion bucket survives carrying
    delta = bucket - 1."""
    import pandas as pd

    from flod_spark.streaming.lossy import _lossy_shard_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    batches = [
        ["hot", "hot", "once"],
        ["hot"],
        ["hot", "late", "late2", "late2"],
    ]
    out = []
    for b in batches:
        pdf = pd.DataFrame({"k": b, "c": [1] * len(b)})
        out = list(_lossy_shard_fn((0,), iter([pdf]), st))[0]
    ks, cs, ds, bucket = st.get
    final = {k: (c, d) for k, c, d in zip(ks, cs, ds)}
    assert bucket == 3
    assert "once" not in final  # singleton: evicted at its own boundary
    assert "late" not in final  # late singleton: same rule, bucket 3
    assert final["hot"] == (4, 0)  # tracked from bucket 1, exact
    assert final["late2"] == (2, 2)  # recurred within bucket 3, delta = 2
    assert set(out["k"]) == {None, "hot", "late2"}  # incl. bucket marker

    # total eviction still advances the bucket VISIBLY: bucket 1 keeps a
    # doubled key, bucket 2 (one new singleton) evicts EVERYTHING —
    # the emission must be the lone k=NULL marker at bucket 2, so a
    # max-bucket pick downstream returns the true empty state instead
    # of resurrecting bucket 1's survivor (round-9 review finding)
    st2 = FakeState()
    pdf = pd.DataFrame({"k": ["a", "a"], "c": [1, 1]})
    out1 = list(_lossy_shard_fn((0,), iter([pdf]), st2))[0]
    assert set(out1["k"]) == {None, "a"}
    pdf = pd.DataFrame({"k": ["b"], "c": [1]})
    out2 = list(_lossy_shard_fn((0,), iter([pdf]), st2))[0]
    ks2, _cs2, _ds2, bucket2 = st2.get
    assert bucket2 == 2 and ks2 == []
    assert list(out2["k"]) == [None] and list(out2["bucket"]) == [2]


def _peel_cascade(spark):
    """Triangle + an 8-node chain hanging off it: k=2 peeling removes
    exactly one chain node per round (each removal exposes the next),
    so quiescence needs 8 rounds — the 5-round unrolled prefix of the
    registered graph_kcore provably cannot finish this graph."""
    tri = [("t1", "t2"), ("t2", "t3"), ("t3", "t1")]
    chain = [(f"c{i}", f"c{i+1}") for i in range(1, 8)] + [("c8", "t1")]
    e = spark.createDataFrame(tri + chain, "a string, b string")
    return e.union(e.select(e.b.alias("a"), e.a.alias("b")))


def test_kcore_converged_forced_continuation(spark):
    from flod_spark.catalog.analytics import _KCORE_ROUNDS
    from flod_spark.operators.graph import kcore_converged

    sym = _peel_cascade(spark)
    core = kcore_converged(sym, k=2)
    nodes = {r.a for r in core.select("a").distinct().collect()}
    assert nodes == {"t1", "t2", "t3"}  # the triangle, nothing else
    assert core.count() == 6  # its 3 edges, symmetric
    # the forced-continuation premise: the bounded 5-round prefix leaves
    # chain remnants on this graph (otherwise this test proves nothing)
    e = sym.localCheckpoint()
    for _ in range(_KCORE_ROUNDS):
        surv = (
            e.groupBy("a").agg(F.count("*").alias("d")).filter(F.col("d") >= 2).select("a")
        )
        e = (
            e.join(surv, "a", "left_semi")
            .join(surv.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint()
        )
    bounded_nodes = {r.a for r in e.select("a").distinct().collect()}
    assert bounded_nodes > nodes  # strictly more than the true core


def test_kcore_converged_matches_bounded_at_gate_scale(spark, sf_dir):
    """At gate scale the registered 5-round peel IS the fixpoint, so the
    converged operator must reproduce graph_kcore exactly."""
    import __spark_entry__ as entry
    from flod_spark.operators.graph import kcore_converged

    bounded = {
        (r.node, r.degree)
        for r in entry.queries()["graph_kcore"](spark, sf_dir).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    e0 = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    sym = e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
    n = sym.select("a").distinct().count()
    k = sym.count() // (2 * n)
    core = kcore_converged(sym, k=k)
    got = {
        (r.a, r.degree)
        for r in core.groupBy("a").agg(F.count("*").alias("degree")).collect()
    }
    assert got == bounded


def test_distinct_auto_routing(spark, sf_dir):
    """The planted-key routing pin for distinct_count_auto: dense
    surrogate keys take the exact bitmap path, a sparse key space
    (1 in ~1e6 of the span) takes the HLL twin — the enforced form of
    agg_bitmap_distinct's dense-key precondition."""
    from flod_spark.catalog.analytics import _HLL_M, distinct_count_auto

    dense = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("k")
    )
    path, out = distinct_count_auto(dense, "g", "k")
    assert path == "bitmap"
    got = {r.g: r.n_distinct for r in out.collect()}
    assert got == {"0": 1000, "1": 1000}  # exact, per group

    sparse = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") * 1_000_003).alias("k"),
    )
    path, out = distinct_count_auto(sparse, "g", "k")
    assert path == "hll"
    rows = {r.g: r for r in out.collect()}
    assert set(rows) == {"0", "1"}
    for r in rows.values():
        assert r.n_true == 1000
        # m=64 registers: standard error ~1.04/sqrt(64) = 13%; 3-sigma
        assert abs(r.hll_est - r.n_true) / r.n_true < 0.4

    # the registered query's own guard holds on the gate data
    import __spark_entry__ as entry

    df = entry.queries()["agg_bitmap_distinct"](spark, sf_dir)
    assert {c for c in df.columns} == {"event_type", "n_distinct", "n_words"}


def test_sim_mips_ann_recall_floor(spark, sf_dir, sf001_dir):
    """The norm-augmentation reduction retrieves real MIPS neighbors:
    recall@5 vs the exact sim_mips, pinned at both gate scales. The
    planes are deterministic (md5-derived), so recall is a fixed
    number per dataset — floors sit below the measured 0.58 / 0.52
    with regeneration slack. Candidate scan rate is ~25% of the
    corpus (8 tables / 32 buckets), so the floor also proves a >2x
    lift over a random scan of the same budget."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for d, floor in ((sf_dir, 0.50), (sf001_dir, 0.45)):
        exact = {(r.query_id, r.neighbor_id) for r in qs["sim_mips"](spark, d).collect()}
        ann = {(r.query_id, r.neighbor_id) for r in qs["sim_mips_ann"](spark, d).collect()}
        assert len(exact & ann) / len(exact) >= floor, d


def test_sim_mips_ann_lift_preserves_order(spark):
    """The reduction's core identity on a planted corpus: lifted-space
    cosine ranks EXACTLY as original inner product (every lifted item
    has norm M, queries lift with a 0 component), including when a
    long vector must outrank a nearer-by-angle short one."""
    import math

    vecs = {1: [4.0, 0.0], 2: [0.6, 0.8], 3: [0.0, 2.0]}
    q = [1.0, 0.1]
    m2 = max(v[0] * v[0] + v[1] * v[1] for v in vecs.values())
    ip = {i: q[0] * v[0] + q[1] * v[1] for i, v in vecs.items()}
    lifted = {
        i: v + [math.sqrt(m2 - (v[0] * v[0] + v[1] * v[1]))] for i, v in vecs.items()
    }
    lq = q + [0.0]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    by_ip = sorted(vecs, key=lambda i: -ip[i])
    by_cos = sorted(vecs, key=lambda i: -cos(lq, lifted[i]))
    assert by_ip == by_cos == [1, 2, 3]  # long #1 beats closer-angle #2


def test_pareto_abc_properties(spark, sf_dir):
    """Structural pins for the per-brand ABC cut: classes are ordered
    A..C along the revenue rank (share-before-item is monotone), every
    brand's top-ranked part is an A (even a dominant one — the
    crossing rule), and the A set is minimal: dropping a brand's last
    A leaves the remainder strictly under the 80% line."""
    import __spark_entry__ as entry

    rows = entry.queries()["orders_pareto_abc"](spark, sf_dir).collect()
    by_brand = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append(r)
    assert len(by_brand) > 1
    order = {"A": 0, "B": 1, "C": 2}
    for brand, rs in by_brand.items():
        rs.sort(key=lambda r: (-r.revenue, r.p_partkey))
        assert rs[0].abc_class == "A", brand
        labels = [order[r.abc_class] for r in rs]
        assert labels == sorted(labels), brand  # never back to a better class
        a = [r for r in rs if r.abc_class == "A"]
        # share covered by all A-items but the last is < 80%
        total = sum(r.revenue for r in rs)
        before_last_a = sum(r.revenue for r in a[:-1])
        assert before_last_a / total < 0.8 + 1e-12, brand
        assert abs(rs[-1].cum_share - 1.0) < 1e-9, brand


def test_cusum_and_drawdown_properties(spark, sf_dir):
    """CUSUM is a clamped non-negative statistic; drawdown is
    non-negative and its running max is monotone per user."""
    import __spark_entry__ as entry

    qs = entry.queries()
    cs = qs["window_cusum"](spark, sf_dir).collect()
    assert cs and all(r.cusum >= 0 for r in cs)
    dd = qs["window_drawdown"](spark, sf_dir).collect()
    assert dd and all(r.drawdown >= 0 for r in dd)
    per_user = {}
    for r in sorted(dd, key=lambda r: (r.user_id, r.ts)):
        prev = per_user.get(r.user_id, 0.0)
        assert r.max_drawdown >= prev - 1e-12
        assert r.max_drawdown >= r.drawdown - 1e-12
        per_user[r.user_id] = r.max_drawdown


def test_diversity_bounds(spark, sf_dir):
    """Simpson lies in [1/richness, 1] (equality at uniform /
    single-key); gini = 1 - simpson; berger_parker in [1/richness, 1]
    and <= sqrt(simpson) never... just the standard dominance bound
    berger_parker^2 <= simpson <= berger_parker."""
    import __spark_entry__ as entry

    rows = entry.queries()["agg_diversity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1.0 / r.richness - 1e-12 <= r.simpson <= 1.0
        assert abs(r.gini_impurity - (1.0 - r.simpson)) < 1e-12
        assert r.berger_parker ** 2 - 1e-12 <= r.simpson <= r.berger_parker + 1e-12


def test_weighted_sample_estimator_unbiased_shape(spark, sf_dir):
    """Priority sampling's defining property on the gate data: the
    subset-sum estimator w-hat = max(w, tau) (tau = the (k+1)-th
    priority) over the k kept docs lands within 30% of the true total
    n_chars — loose, but it catches a broken priority formula or a
    wrong tail cut outright."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from flod_spark.catalog.sampling import _PRI_K

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("pri|"), F.col("doc_id").cast("string")).cast("binary")),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    allp = docs.select(
        "doc_id", "n_chars",
        (F.col("n_chars").cast("double") / ((h32 + F.lit(1)) / F.lit(4294967296.0))).alias("q"),
    ).orderBy(F.col("q").desc(), "doc_id").collect()
    kept = allp[:_PRI_K]
    tau = float(allp[_PRI_K].q)
    est = sum(max(float(r.n_chars), tau) for r in kept)
    true = sum(r.n_chars for r in allp)
    assert abs(est - true) / true < 0.30
    got = {r.doc_id for r in entry.queries()["sample_weighted_k"](spark, sf_dir).collect()}
    assert got == {r.doc_id for r in kept}


def _sennrich_merge(syms, a, b):
    """INDEPENDENT reference merge: explicit index scan over the symbol
    list, leftmost non-overlapping — Sennrich et al.'s learn_bpe step,
    deliberately NOT the fold/replace construct the operator or oracle
    uses (the round-8 reference reimplemented the operator's delimited
    replace, so it could not catch the consecutive-repeat defect)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _sennrich_train(freq, rounds):
    """Driver-side Sennrich BPE train loop over a word->count dict.
    Returns ([(round, 'a b', cnt)], final vocab as {word: symbol list})."""
    vocab = {w: list(w) + ["</w>"] for w in freq}
    merges = []
    for rnd in range(1, rounds + 1):
        pairs = {}
        for w, syms in vocab.items():
            c = freq[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        merges.append((rnd, f"{a} {b}", cnt))
        if rnd < rounds:
            vocab = {w: _sennrich_merge(s, a, b) for w, s in vocab.items()}
    # apply the LAST merge too — bpe_apply's contract (train stops
    # rewriting after its final count; apply uses all merges)
    a, b = merges[-1][1].split(" ")
    vocab = {w: _sennrich_merge(s, a, b) for w, s in vocab.items()}
    return merges, vocab


def test_bpe_train_matches_reference_model(spark, sf_dir):
    """The distributed BPE loop equals an independent index-scan
    implementation of Sennrich BPE run driver-side on the same
    word-frequency table — merge pairs AND weighted counts, all
    _BPE_ROUNDS rounds."""
    import __spark_entry__ as entry
    from flod_spark.catalog.text import _BPE_ROUNDS

    import re as _re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    freq = {}
    for r in docs:
        for w in _re.findall(r"[a-z]+", (r.text or "").lower()):
            freq[w] = freq.get(w, 0) + 1
    expect, _ = _sennrich_train(freq, _BPE_ROUNDS)
    got = [
        (r.round, r.pair, r.cnt)
        for r in entry.queries()["bpe_train_iter"](spark, sf_dir).collect()
    ]
    assert sorted(got) == expect


def test_bpe_consecutive_repeat_words_planted(spark, tmp_path):
    """The round-8 defect's exact trigger, planted: words where the
    learned pair occurs CONSECUTIVELY ('banana' -> 'b an an a </w>',
    'nanana' -> 'n an an a </w>', 'aaaa' with merge 'a a' ->
    'aa aa </w>'). A delimited replace(' a b ',' ab ') skips the
    second occurrence (its shared delimiter space is consumed by the
    first match), so this corpus separates Sennrich BPE from the
    replace trick — in the OPERATOR, the DUCKDB ORACLE, and the
    per-doc bpe_apply token counts, all three checked against the
    independent index-scan reference."""
    import duckdb

    import __spark_entry__ as entry
    from flod_spark.catalog.text import _BPE_ROUNDS
    from flod_spark.registry import ORACLES

    words = [
        "banana", "banana", "banana", "banana",
        "nanana", "nanana", "nanana",
        "anan", "anan",
        "aaaa", "aaaa", "aaaa",
        "aaa",
        "papaya", "papaya",
        "mississippi",
    ]
    texts = [
        " ".join(words[:6]), " ".join(words[6:11]), " ".join(words[11:]),
    ]
    pdir = tmp_path / "planted"
    pdir.mkdir()
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(pdir / "documents.parquet"))

    freq = {}
    for t in texts:
        for w in t.split(" "):
            freq[w] = freq.get(w, 0) + 1
    expect, vocab = _sennrich_train(freq, _BPE_ROUNDS)
    # the corpus only separates the semantics if the round-8 delimited
    # replace would actually produce something DIFFERENT on it — rerun
    # the defective model and assert divergence (the plant is live)
    rvocab = {w: " ".join(list(w)) + " </w>" for w in freq}
    rmerges = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        pairs = {}
        for s, fw in ((s, freq[w]) for w, s in rvocab.items()):
            syms = s.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[f"{a} {b}"] = pairs.get(f"{a} {b}", 0) + fw
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        rmerges.append((rnd, best[0], best[1]))
        pat, tgt = f" {best[0]} ", " " + best[0].replace(" ", "") + " "
        rvocab = {
            w: (" " + s + " ").replace(pat, tgt).strip()
            for w, s in rvocab.items()
        }
    a, b = rmerges[-1][1].split(" ")
    rvocab = {
        w: (" " + s + " ").replace(f" {a} {b} ", f" {a}{b} ").strip()
        for w, s in rvocab.items()
    }
    assert rmerges != expect or any(
        rvocab[w].split(" ") != vocab[w] for w in freq
    ), "planted corpus no longer separates Sennrich from the replace trick"

    got = [
        (r.round, r.pair, r.cnt)
        for r in entry.queries()["bpe_train_iter"](spark, str(pdir)).collect()
    ]
    assert sorted(got) == expect

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pdir}/documents.parquet/*.parquet')"
    )
    oracle_got = [
        (int(r[0]), r[1], int(r[2]))
        for r in con.sql(ORACLES["bpe_train_iter"]).fetchall()
    ]
    assert sorted(oracle_got) == expect

    # bpe_apply: per-doc token counts under ALL merges (train + last)
    exp_tok = {
        i: (len(t.split(" ")), sum(len(vocab[w]) for w in t.split(" ")))
        for i, t in enumerate(texts)
    }
    apply_got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in entry.queries()["bpe_apply"](spark, str(pdir)).collect()
    }
    assert apply_got == exp_tok
    oracle_apply = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.sql(ORACLES["bpe_apply"]).fetchall()
    }
    assert oracle_apply == exp_tok


def test_argminmax_tiebreak_planted(spark):
    """Price ties resolve exactly as the oracle's rank-1 windows:
    max side takes the LARGEST key, min side the SMALLEST — one struct
    key serves both (a (p, -k) min-key would silently invert the min
    side's tie rule; no gate-scale data has ties, so only this planted
    frame guards it)."""
    o = spark.createDataFrame(
        [(1, "P", 10.0), (2, "P", 10.0), (3, "P", 1.0), (4, "P", 1.0)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    key = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    r = o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("mx"),
        F.min_by("o_orderkey", key).alias("mn"),
    ).first()
    assert (r.mx, r.mn) == (2, 3)


def test_lossy_state_bound_holds_at_sf01(spark, sf01_dir):
    """The state-bounding claim at 100x the unit scale: at sf0.1 the
    replayed basket stream observes tens of thousands of distinct
    pairs, and every per-(shard, bucket) lossy-counter emission must
    stay well below the per-shard share of that space — eviction is
    doing real work, not just passing small inputs through. Also
    re-pins no-false-dismissals above the bucket count at this
    scale."""
    from flod_spark.catalog.streaming_live import stream_market_basket_bounded

    em = stream_market_basket_bounded(spark, sf01_dir, emissions=True)
    rows = em.collect()
    assert rows
    n_pairs_seen = len({r.k for r in rows if r.k is not None})
    by_sb = {}
    for r in rows:
        by_sb[(r.shard, r.bucket)] = by_sb.get((r.shard, r.bucket), 0) + 1
    # distinct observed pairs >> any single shard-bucket state snapshot
    assert max(by_sb.values()) < n_pairs_seen / 2
    # survivors at the final bucket of each shard must include every
    # pair with true support > B (B = 4 replay buckets)
    true = _true_pair_supports(spark, sf01_dir)
    maxb = {}
    for r in rows:
        maxb[r.shard] = max(maxb.get(r.shard, 0), r.bucket)
    final = {r.k for r in rows if r.bucket == maxb[r.shard]}
    heavy = {f"{p1}|{p2}" for (p1, p2), s in true.items() if s > 4}
    assert heavy <= final
