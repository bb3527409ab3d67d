"""ANN quality: the approximate paths (sim_lsh buckets, sim_ivf probes)
measured against the exact brute-force baseline (sim_topk).

Exact-match correctness vs DuckDB is the parity gate's job; what it
cannot express is RECALL — an approximate index that returns the wrong
neighbors would still "pass" its own oracle. These tests pin that the
approximation actually finds true neighbors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flod_spark.catalog import similarity


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    exact = _topk_sets(similarity.sim_topk(spark, sf_dir))
    approx = _topk_sets(similarity.sim_ivf(spark, sf_dir))
    assert set(approx) == set(exact)  # every query answered
    # with N_PROBE/N_CELLS = 1/4 of the corpus scanned per query, the
    # label-clustered synthetic embeddings put most true neighbors in
    # the probed cells; require macro-averaged recall well above the
    # 0.25 a random quarter-scan would give
    recall = sum(len(approx[q] & exact[q]) / len(exact[q]) for q in exact) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f}"


def test_ivf_returns_full_k_per_query(spark, sf_dir):
    counts = (
        similarity.sim_ivf(spark, sf_dir)
        .groupBy("query_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert len(counts) == similarity.NQ
    assert all(r.n == similarity.K for r in counts)


def test_lsh_bucket_recall(spark, sf_dir):
    # an LSH candidate set = same-bucket vectors, unioned over L salted
    # tables (OR-amplification — the production form). For this data the
    # strongest true-neighbor cosines are ~0.45 => single-table collision
    # ~ 0.63^6 ~= 0.06 (4x the 1/64 random rate); 8 tables amplify to
    # ~ 1-(1-0.06)^8 ~= 0.4. Assert both: single table beats random by
    # >= 2x, and the amplified candidate set catches a real share.
    from flod_spark.io import load

    emb = load(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", similarity._as_double("embedding").alias("v"))
    tables = []
    for t in range(8):
        salt = "" if t == 0 else f"t{t}:"
        tables.append(
            {
                r.vec_id: r.bucket
                for r in e.select(
                    "vec_id", similarity._bucket_spark(F.col("v"), salt).alias("bucket")
                ).collect()
            }
        )
    exact = _topk_sets(similarity.sim_topk(spark, sf_dir))
    single = multi = total = 0
    for q, nbrs in exact.items():
        for n in nbrs:
            total += 1
            single += tables[0][q] == tables[0][n]
            multi += any(b[q] == b[n] for b in tables)
    assert single / total >= 2 / 64, f"single-table recall {single/total:.3f}"
    assert multi / total >= 0.2, f"8-table candidate recall {multi/total:.3f}"


def _exact_l2_topk(spark, sf_dir):
    """Exact squared-L2 top-K per query — the metric PQ approximates
    (the embeddings are unit-norm, so this agrees with cosine order;
    computed in numpy so the baseline shares no code with the index)."""
    import numpy as np

    from flod_spark.io import load

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    pdf = emb.select("vec_id", "embedding").toPandas()
    V = np.array([np.asarray(v, dtype=float) for v in pdf.embedding])
    ids = pdf.vec_id.to_numpy()
    out: dict[int, set[int]] = {}
    for qi, q in enumerate(ids):
        if q >= similarity.NQ:
            continue
        d = ((V - V[qi]) ** 2).sum(axis=1)
        order = sorted((dd, int(i)) for dd, i in zip(d, ids) if i != q)
        out[int(q)] = {i for _, i in order[: similarity.K]}
    return out


def test_pq_adc_recall_vs_brute_force(spark, sf_dir):
    """The round-5 verdict's gap: sim_pq_adc's ADC arithmetic is
    oracle-exact, but nothing asserted the lossy codes actually FIND
    true neighbors — a degenerate codebook (e.g. a collapsed Forgy
    sample) would pass the parity gate while returning junk. Floor:
    macro-averaged recall@5 >= 0.25 against exact L2 top-K (the
    M=8 x K=64 geometry measures 0.30 on this data; random selection
    would score K/n ~= 0.01)."""
    from flod_spark.io import load

    exact = _exact_l2_topk(spark, sf_dir)
    approx = _topk_sets(similarity.sim_pq_adc(spark, sf_dir))
    assert set(approx) == set(exact)  # every query answered
    recall = sum(len(approx[q] & exact[q]) / len(exact[q]) for q in exact) / len(exact)
    if recall < 0.25:
        # random recall = K / corpus size — computed only on failure
        n_corpus = (
            load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull()).count()
        )
        raise AssertionError(
            f"PQ-ADC recall {recall:.2f} (floor 0.25, random ~{similarity.K / n_corpus:.3f})"
        )


def test_ivfpq_recall_vs_brute_force(spark, sf_dir):
    """sim_ivfpq composes cell-pruning loss (sim_ivf probes 1/4 of the
    cells) on top of the PQ code loss, so its floor sits below
    sim_pq_adc's: macro recall@5 >= 0.15 (measures 0.24 here). Every
    query must still answer — an empty probe set would be a silent
    retrieval failure the parity oracle cannot see."""
    exact = _exact_l2_topk(spark, sf_dir)
    approx = _topk_sets(similarity.sim_ivfpq(spark, sf_dir))
    assert set(approx) == set(exact)
    recall = sum(len(approx[q] & exact[q]) / len(exact[q]) for q in exact) / len(exact)
    assert recall >= 0.15, f"IVF-PQ recall {recall:.2f} (floor 0.15)"


def test_truncated_prefix_topk_recall(spark, sf_dir):
    """The MRL serving claim embed_truncate_energy measures: prefix
    energies are monotone in depth, and top-K in the 32-dim prefix
    space recovers far more of the full 64-dim neighbors than chance.
    The synthetic embeddings are NOT MRL-trained — information is
    spread uniformly, so the prefix holds ~half the energy and recall
    measures ~0.20 (floor 0.1; random would be K/corpus ~0.01). An
    MRL-trained model front-loads energy and pushes this toward 1.0 —
    which is exactly the decision the energy audit informs."""
    import numpy as np

    from flod_spark.catalog.similarity import embed_truncate_energy
    from flod_spark.io import load

    en = {r["vec_id"]: r for r in embed_truncate_energy(spark, sf_dir).collect()}
    for r in en.values():
        assert 0 <= r["e8"] <= r["e16"] <= r["e32"] <= r["e_full"] * (1 + 1e-12)
    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    pdf = emb.select("vec_id", "embedding").toPandas()
    V = np.array([np.asarray(v, dtype=float) for v in pdf.embedding])
    ids = pdf.vec_id.to_numpy()
    K, NQ = similarity.K, similarity.NQ
    rec_sum = n_q = 0
    for qi, q in enumerate(ids):
        if q >= NQ:
            continue
        full = ((V - V[qi]) ** 2).sum(axis=1)
        pref = ((V[:, :32] - V[qi, :32]) ** 2).sum(axis=1)
        top = lambda d: {  # noqa: E731
            i for _, i in sorted((dd, int(i)) for dd, i in zip(d, ids) if i != q)[:K]
        }
        rec_sum += len(top(full) & top(pref)) / K
        n_q += 1
    assert rec_sum / n_q >= 0.1, f"32-dim prefix recall {rec_sum / n_q:.2f}"


def test_kmeans_fit_two_rounds_persisted_matches_recompute(spark, sf_dir):
    """The production driver loop (localCheckpoint state between rounds)
    must produce bit-identical assignments to the pure-lineage recompute
    form — persistence is a performance choice, never a semantic one."""
    from flod_spark.io import load

    emb = load(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", similarity._as_double("embedding").alias("v"))
    a_p, moved_p = similarity.kmeans_fit(e, n_rounds=2, persist=True)
    a_r, moved_r = similarity.kmeans_fit(e, n_rounds=2, persist=False)
    assert moved_p == moved_r
    got_p = {r.vec_id: r.cell for r in a_p.select("vec_id", "cell").collect()}
    got_r = {r.vec_id: r.cell for r in a_r.select("vec_id", "cell").collect()}
    assert got_p == got_r
    # and round 1 of the loop == the gated kmeans_iter query's round 2
    one, moved1 = similarity.kmeans_fit(e, n_rounds=1, persist=True)
    q = {r.vec_id: r.cell_round2 for r in similarity.kmeans_iter(spark, sf_dir).collect()}
    got1 = {r.vec_id: r.cell for r in one.select("vec_id", "cell").collect()}
    assert got1 == q
    assert moved1[0] == sum(
        1 for r in similarity.kmeans_iter(spark, sf_dir).collect() if r.moved
    )


def test_split_hot_cells_bound_holds_at_sf01(spark, sf01_dir):
    """The documented semdedup/sim_ivf scale caveat, now implemented:
    after split_hot_cells no cell exceeds the bound at sf0.1, membership
    is preserved, and cold cells keep their original ids."""
    from flod_spark.io import load

    emb = load(spark, sf01_dir, "embeddings")
    e = emb.select("vec_id", similarity._as_double("embedding").alias("v"))
    a = similarity._assign_cells(e, similarity._cent_df(e))
    bound = 32
    before = a.groupBy("cell").count().toPandas()
    split = similarity.split_hot_cells(a, max_cell=bound)
    after = split.groupBy("cell").count().toPandas()
    assert after["count"].max() <= bound
    # no vector lost or duplicated
    assert split.count() == a.count()
    assert split.select("vec_id").distinct().count() == a.select("vec_id").distinct().count()
    # cold cells untouched: same id (stringified), same size
    cold = before[before["count"] <= bound]
    after_by_cell = dict(zip(after["cell"], after["count"]))
    for cell, n in zip(cold["cell"], cold["count"]):
        assert after_by_cell.get(str(cell)) == n
    # refined ids prefix back to their parent cell
    hot = {str(c) for c in before[before["count"] > bound]["cell"]}
    refined = [c for c in after["cell"] if "|" in c or "#" in c]
    for c in refined:
        assert c.split("|")[0].split("#")[0] in hot


def test_split_hot_cells_degenerate_identical_vectors(spark):
    """A cell of identical vectors defeats every hyperplane — the final
    row_number chop must still guarantee the bound."""
    n, dim = 200, 8
    rows = [(i, [1.0] * dim) for i in range(n)]
    a = spark.createDataFrame(rows, "vec_id long, v array<double>").withColumn(
        "cell", F.lit(0)
    )
    split = similarity.split_hot_cells(a, max_cell=16)
    sizes = split.groupBy("cell").count().toPandas()
    assert sizes["count"].max() <= 16
    assert int(sizes["count"].sum()) == n


def test_semdedup_bounded_gated_path_holds_bound_at_sf01(spark, sf01_dir):
    """The GATED bounded variant (not just the helper): at sf0.1 the
    refinement is non-vacuous (2000 vecs / 16 cells >> bound), every
    refined cell respects SEMDEDUP_BOUND before the pair join, and the
    membership is exactly the corpus."""
    out = similarity.semdedup_bounded(spark, sf01_dir).cache()
    sizes = out.groupBy("cell_id").count().toPandas()
    assert sizes["count"].max() <= similarity.SEMDEDUP_BOUND
    assert int(sizes["count"].sum()) == 2000
    # refinement actually fired: some cells carry a split/chop suffix
    assert any(("|" in c) or ("#" in c) for c in sizes["cell_id"])
    # and it still finds duplicates (planted near-dups exist at sf0.1)
    assert out.filter("is_dup").count() > 0
    out.unpersist()


def test_embed_quantize_reconstruction_bound(spark, sf_dir):
    """Dequantized values land within one lattice step of the original:
    |x - q * scale/127| <= scale/127 (floor lattice), and q stays in
    the int8 range [-127, 127]."""
    from flod_spark.catalog.similarity import embed_quantize
    from flod_spark.io import load

    got = embed_quantize(spark, sf_dir).collect()
    src = {
        r["vec_id"]: r["embedding"]
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    assert len(got) > 0
    for r in got[:200]:
        q = [int(v) for v in r["qvec"].split(",")]
        step = r["scale"] / 127.0
        assert all(-127 <= v <= 127 for v in q)
        for x, qi in zip(src[r["vec_id"]], q):
            assert abs(float(x) - qi * step) <= step * (1 + 1e-9)
