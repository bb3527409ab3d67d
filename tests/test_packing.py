"""Corpus-layout ops (catalog/packing.py): semantic invariants + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from flod_spark.catalog.packing import NSHARDS, PACK_BUDGET, pack_sequences, sample_shuffle
from tests.test_plans import plan_of


def test_pack_offsets_are_contiguous_per_shard(spark, sf_dir):
    rows = pack_sequences(spark, sf_dir).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(NSHARDS))
    for members in by_shard.values():
        members.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in members:
            assert r["tok_offset"] == expect  # end-to-end layout, no gaps
            assert r["pack_id"] == r["shard"] * 1000000 + r["tok_offset"] // PACK_BUDGET
            expect += r["n_tokens"]


def test_pack_id_monotone_in_offset(spark, sf_dir):
    rows = pack_sequences(spark, sf_dir).collect()
    per_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["tok_offset"])):
        last = per_shard.get(r["shard"])
        assert last is None or r["pack_id"] >= last
        per_shard[r["shard"]] = r["pack_id"]


def test_shuffle_is_gapfree_permutation_and_stable(spark, sf_dir):
    out = sample_shuffle(spark, sf_dir)
    rows = out.collect()
    n = len(rows)
    assert sorted(r["pos"] for r in rows) == list(range(n))
    # deterministic: a second independent evaluation gives identical positions
    again = {r["doc_id"]: r["pos"] for r in sample_shuffle(spark, sf_dir).collect()}
    assert {r["doc_id"]: r["pos"] for r in rows} == again
    # and the order differs from doc_id order (it actually shuffled)
    by_id = [r["pos"] for r in sorted(rows, key=lambda r: r["doc_id"])]
    assert by_id != sorted(by_id)


def test_pack_plan_has_no_global_window(spark, sf_dir):
    """The window must partition on shard — a missing partitionBy would
    funnel the whole corpus through one task at 100 TB."""
    plan = plan_of(pack_sequences(spark, sf_dir))
    assert "Window" in plan
    assert "partitionBy=[]" not in plan.lower().replace(" ", "")
    # the only wide ops are the shard hash-partitioning for the window
    assert plan.count("Exchange") <= 2


def test_shuffle_plan_is_window_free_of_global_sort(spark, sf_dir):
    """with_seq's contract: no single-partition WindowExec, offsets come
    from the broadcast P-row table (seq.py)."""
    plan = plan_of(sample_shuffle(spark, sf_dir))
    assert "BroadcastExchange" in plan  # the offset table joins back broadcast
    # every window spec is partitioned: its first argument must be a
    # partition column, not an ORDER BY column (unpartitioned specs start
    # with "col ASC/DESC ...")
    specs = plan.split("windowspecdefinition(")[1:]
    assert specs, "expected a window (the per-bucket local rank)"
    for seg in specs:
        first_arg = seg.split(",")[0]
        assert "ASC" not in first_arg and "DESC" not in first_arg


def test_length_buckets_invariants(spark, sf_dir):
    """Doc counts are conserved across buckets; each bucket holds its
    docs (capacity = n_docs * bucket = total_tokens + padding_waste,
    exactly); buckets are powers of two from the ladder."""
    from flod_spark.catalog.packing import _BUCKET_EDGES, length_buckets
    from flod_spark.io import load

    rows = length_buckets(spark, sf_dir).collect()
    n_docs_total = sum(r["n_docs"] for r in rows)
    assert n_docs_total == load(spark, sf_dir, "documents").count()
    valid = set(_BUCKET_EDGES) | {2 * _BUCKET_EDGES[-1]}
    for r in rows:
        assert r["bucket"] in valid
        assert r["n_docs"] * r["bucket"] == r["total_tokens"] + r["padding_waste"]
        assert r["padding_waste"] >= 0
