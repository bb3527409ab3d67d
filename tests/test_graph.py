"""connected_components (operators/graph.py): star-algorithm correctness.

Ground truth is a driver-side union-find — independent of the Spark
implementation, so the two can only agree by both being right.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flod_spark.operators.graph import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member of the component
    label = {}
    for x in range(n_nodes):
        r = find(x)
        label.setdefault(r, min(i for i in range(n_nodes) if find(i) == r))
    return {x: label[find(x)] for x in range(n_nodes)}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_cc_chain(spark):
    # path graph 0-1-2-3-4: worst case for naive propagation (diameter 4)
    got = _run(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0}


def test_cc_triangle_and_pair(spark):
    got = _run(spark, [(10, 11), (11, 12), (12, 10), (20, 21)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_tolerates_duplicates_reversals_self_loops(spark):
    got = _run(spark, [(1, 2), (2, 1), (1, 2), (3, 3), (2, 4)])
    # 3 only appears in a self-loop: dropped from the edge set entirely
    assert got == {1: 1, 2: 1, 4: 1}


def test_cc_random_vs_union_find(spark):
    rng = random.Random(421)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(n, edges)
    got = _run(spark, edges)
    touched = {x for e in edges for x in e}
    assert set(got) == touched
    for x in touched:
        assert got[x] == want[x], f"node {x}: got {got[x]} want {want[x]}"


def test_cc_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "src: string, dst: string"
    )
    out = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_dedup_cluster_invariants(spark, sf_dir):
    """dedup_cluster covers every doc, labels clusters by their min
    member, and flags exactly the non-canonical members as dups."""
    from flod_spark.catalog.dedup import dedup_cluster

    out = dedup_cluster(spark, sf_dir)
    rows = out.collect()
    n_docs = out.sparkSession.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)  # canonical = min member
    dup_flags = {r["doc_id"]: r["is_dup"] for r in rows}
    for cid, members in by_cluster.items():
        for m in members:
            assert dup_flags[m] == (m != cid)


def test_pagerank_iter_mass_conservation_and_positivity(spark, sf_dir):
    """PageRank invariants: every rank positive, total mass ~= 1 after
    each round (exactly 1 minus the fixed-point floor loss, which is
    bounded by |edges|/2^40), and round 2 differs from round 1 (the
    iteration is not a fixed point on this graph)."""
    from flod_spark.catalog.analytics import pagerank_iter
    from pyspark.sql import functions as F

    out = pagerank_iter(spark, sf_dir).cache()
    n = out.count()
    assert n > 0
    assert out.filter((F.col("rank_round1") <= 0) | (F.col("rank_round2") <= 0)).count() == 0
    s1, s2 = out.agg(F.sum("rank_round1"), F.sum("rank_round2")).first()
    assert abs(s1 - 1.0) < 1e-6 and abs(s2 - 1.0) < 1e-6
    assert out.filter(F.col("rank_round1") != F.col("rank_round2")).count() > 0
    out.unpersist()
