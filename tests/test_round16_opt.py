"""Round-16 optimization-round pins: slice-0 reservation in the live
claim sink (r15 ADVICE medium), the bucketed-table-absent fallback
(r15 ADVICE low), the ivfpq ingest compaction/replay guard (r15 ADVICE
low), and behavior-preservation pins for the optimized internals
(single-pass replay spool, single-materialization compaction)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _fp_batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "fp", "n_chars"]).astype(
            {"doc_id": "int64", "fp": "object", "n_chars": "int64"}
        )
        if rows
        else pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                           "fp": pd.Series([], dtype="object"),
                           "n_chars": pd.Series([], dtype="int64")}),
        "doc_id long, fp string, n_chars long",
    )


def test_fresh_checkpoint_batch0_preserves_compacted_base(spark, tmp_path):
    """r15 ADVICE (medium): a stream started on a FRESH checkpoint over
    an EXISTING compacted claim table gets batch_id 0 again. With
    slice = batch_id that batch's dynamic overwrite replaced the entire
    compacted base (slice=0) with one batch's admissions — data loss —
    and the seen read excluded the whole base, re-admitting claimed
    fps. With slice 0 reserved (sink writes batch_id + 1), the base
    survives and still rejects."""
    from flod_spark.catalog.dedup import compact_claim_table
    from flod_spark.catalog.surface import crawl_claims_sink

    cdir = str(tmp_path / "claims")
    sink = crawl_claims_sink(cdir)
    sink(_fp_batch(spark, [(1, "aa", 5), (2, "bb", 6)]), 0)
    sink(_fp_batch(spark, [(3, "cc", 7)]), 1)
    compact_claim_table(spark, cdir)  # everything folds into slice=0

    # checkpoint lost: a NEW stream over the same table starts at batch 0
    fresh = crawl_claims_sink(cdir)
    fresh(_fp_batch(spark, [(9, "aa", 5), (10, "dd", 8)]), 0)

    got = {(r.first_id, r.fp) for r in spark.read.parquet(cdir).collect()}
    # base intact (aa/bb/cc keep their original first_ids), 'aa' rejected,
    # only the genuinely new 'dd' admitted by the fresh stream's batch 0
    assert got == {(1, "aa"), (2, "bb"), (3, "cc"), (10, "dd")}
    slices = {r.slice for r in spark.read.parquet(cdir).collect()}
    assert 0 in slices and 1 in slices  # fold partition + batch0's slice


def test_batch0_replay_after_midstream_compaction(spark, tmp_path):
    """r15 verdict item 3: replaying batch 0 through a fresh sink AFTER
    a mid-stream compaction must be admission-correct without leaning
    on engine invariants — its fps are already covered by the folded
    base, so the anti-join admits nothing and the table is unchanged."""
    from flod_spark.catalog.dedup import compact_claim_table
    from flod_spark.catalog.surface import crawl_claims_sink

    cdir = str(tmp_path / "claims")
    b0 = [(1, "aa", 5), (2, "bb", 6)]
    sink = crawl_claims_sink(cdir)
    sink(_fp_batch(spark, b0), 0)
    compact_claim_table(spark, cdir)
    want = {(r.first_id, r.fp, r.slice) for r in spark.read.parquet(cdir).collect()}
    assert {s for (_, _, s) in want} == {0}

    # restart: fresh sink, batch 0 re-delivered
    crawl_claims_sink(cdir)(_fp_batch(spark, b0), 0)
    got = {(r.first_id, r.fp, r.slice) for r in spark.read.parquet(cdir).collect()}
    assert got == want  # nothing re-admitted, base untouched


def test_claims_fp_side_falls_back_when_bucketed_table_absent(spark, tmp_path):
    """r15 ADVICE (low): a compactor crash between DROP TABLE and
    saveAsTable leaves no catalog table; batch admissions passing
    bucketed_table must fall back to the distinct dir read instead of
    failing with TABLE_OR_VIEW_NOT_FOUND."""
    import uuid

    from flod_spark.catalog.dedup import (
        build_claim_table,
        dedup_against_claims,
    )

    cdir = str(tmp_path / "claims")
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha"), (3, "beta")], "doc_id long, text string"
    )
    build_claim_table(docs.filter("doc_id <= 2"), cdir)
    absent = "t_gone_" + uuid.uuid4().hex[:8]  # never created
    verdicts = dedup_against_claims(
        docs.filter("doc_id >= 2"), spark, cdir, bucketed_table=absent
    )
    got = {(r.doc_id, bool(r.admitted)) for r in verdicts.collect()}
    assert got == {(2, False), (3, True)}  # 'alpha' claimed, 'beta' new
