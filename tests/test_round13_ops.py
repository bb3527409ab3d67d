"""Round-13 operator tests: the r12 ADVICE fixes (atomic-swap crash
recovery, idempotent IVF-PQ slice fold, conversation_pack NULL
semantics) plus the lifecycle/extraction registrations added this
round."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F


def test_recover_swap_dir_finishes_half_completed_swap(spark, sf_dir, tmp_path):
    """Simulate the one non-atomic instant of atomic_swap_dir — target
    renamed away, fully-written .compact present — and assert
    compact_claim_table (whose first step is recover_swap_dir) repairs
    the directory and completes, leaving the same logical table the
    uninterrupted compaction produces (r12 advice: the callers used to
    read the absent target and fail)."""
    from flod_spark.catalog.dedup import build_claim_table, compact_claim_table
    from flod_spark.io import load, recover_swap_dir

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    cdir = str(tmp_path / "claims")
    build_claim_table(docs, cdir)
    want = sorted(
        (r.fp, r.first_id)
        for r in spark.read.parquet(cdir).select("fp", "first_id").collect()
    )
    # half-swapped state: .compact fully written, target renamed to .old
    shutil.copytree(cdir, cdir + ".compact")
    os.rename(cdir, cdir + ".old")
    assert not os.path.exists(cdir)
    compact_claim_table(spark, cdir)
    got = sorted(
        (r.fp, r.first_id)
        for r in spark.read.parquet(cdir).select("fp", "first_id").collect()
    )
    assert got == want and want
    assert not os.path.exists(cdir + ".compact")
    # degraded variant: only .old survives -> restore pre-swap state
    os.rename(cdir, cdir + ".old")
    recover_swap_dir(cdir)
    assert os.path.exists(cdir)
    # healthy state -> no-op
    recover_swap_dir(cdir)
    assert os.path.exists(cdir)


def test_ivfpq_compaction_is_crash_idempotent(spark, sf_dir, tmp_path):
    """The r12 ADVICE hole: a crash between compact_ivfpq_index's swap
    and its slice cleanup leaves an already-folded codes_slice_* dir on
    disk; a re-run used to union it into the base AGAIN (doubling the
    codes table). Now the fold dropDuplicates on (vec_id, m), so the
    re-run is a no-op on both the base row count and the served
    rankings."""
    from flod_spark.catalog.similarity import (
        NQ,
        _emb_v,
        compact_ivfpq_index,
        ivfpq_index_advance,
        ivfpq_index_query,
        ivfpq_index_save,
    )

    emb = _emb_v(spark, sf_dir)
    mm = emb.agg(F.min("vec_id").alias("mn"), F.max("vec_id").alias("mx")).first()
    mid = (mm.mn + mm.mx) // 2
    idx = str(tmp_path / "idx")
    ivfpq_index_save(emb.filter(F.col("vec_id") <= mid), idx)
    ivfpq_index_advance(emb.filter(F.col("vec_id") > mid), spark, idx, 1)
    # stash the slice so we can re-plant it post-fold (= crash between
    # atomic_swap_dir and the rmtree loop)
    slice_dir = idx + "/codes_slice_00001"
    shutil.copytree(slice_dir, str(tmp_path / "stash"))
    queries = emb.filter(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("query_id"), "v"
    )

    def state():
        served = sorted(
            (r.query_id, r.rk, r.neighbor_id, r.adist)
            for r in ivfpq_index_query(
                spark, idx, queries, include_slices=True
            ).collect()
        )
        n = spark.read.parquet(idx + "/codes_by_cell").count()
        return served, n

    compact_ivfpq_index(spark, idx)
    want = state()
    # crash replay: the folded slice reappears, compaction re-runs
    shutil.copytree(str(tmp_path / "stash"), slice_dir)
    compact_ivfpq_index(spark, idx)
    assert state() == want and want[0]


def test_conversation_pack_null_event_type_matches_oracle(spark, tmp_path):
    """r12 ADVICE: a NULL event_type must behave like `||` + string_agg
    (line dropped from the document AND from n_turns; an all-NULL
    session's conversation is NULL) in BOTH engines. Plant events with
    NULLs — including one session that is entirely NULL-typed — and run
    the registered query against its own DuckDB oracle on the same
    parquet."""
    import datetime as dt

    import duckdb

    import __spark_entry__ as e

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    # user 1: mixed null/non-null within one session
    for i, et in enumerate(["click", None, "view", None, "buy"]):
        rows.append((i, t0 + dt.timedelta(seconds=10 * i), 1, et, 1.0, "{}"))
    # user 2: ALL-null session (conversation must be NULL, n_turns 0)
    for i, et in enumerate([None, None, None]):
        rows.append((100 + i, t0 + dt.timedelta(seconds=10 * i), 2, et, 1.0, "{}"))
    # user 1, second session (gap > 30 min), non-null
    rows.append((200, t0 + dt.timedelta(hours=2), 1, "logout", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = sorted(
        tuple(r)
        for r in e.queries()["conversation_pack"](spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(e.oracle_sql()["conversation_pack"]).fetchall())
    assert got == want
    # the planted NULLs actually exercise every branch
    by_key = {(r[0], r[1]): r for r in got}
    assert by_key[(2, 1)][2] is None and by_key[(2, 1)][3] == 0
    assert by_key[(1, 1)][3] == 3  # 2 NULL lines dropped from n_turns


def test_html_extract_composes_into_warc_member_chain(spark, sf_dir, tmp_path):
    """The crawl-ingestion chain the r12 verdict asked for: WARC scan
    -> html_main_text EXTRACT inline on member bytes -> same results
    as extracting from the source pages directly. Pages are planted
    HTML (nav/share/footer chrome + two content blocks); the member
    payload round-trips through pack_warc_shards + archive_member_rows
    (keep_content=True), and extraction runs as pure column
    expressions over the decoded bytes — no extra shuffle beyond the
    member split itself."""
    from flod_spark.catalog.surface import archive_member_rows, pack_warc_shards
    from flod_spark.catalog.text import html_main_text
    from flod_spark.io import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    page = F.concat(
        F.lit('<html><body><nav><a href="/">Home</a> <a href="/a">A</a></nav><p>'),
        F.col("text"),
        F.lit('</p><p>Trailing paragraph about doc '),
        F.col("doc_id").cast("string"),
        F.lit(' with enough characters to clear the floor.</p>'
              '<footer><a href="/p">Privacy</a> (c)</footer></body></html>'),
    )
    pages = docs.select("doc_id", page.alias("text"))
    out = str(tmp_path / "warc")
    pack_warc_shards(pages, out, shard_docs=25).collect()

    raw = spark.read.format("binaryFile").load(out + "/*.warc")
    members = archive_member_rows(raw, keep_content=True)
    via_warc = sorted(
        (r.member, r.e.extracted, r.e.n_blocks)
        for r in members.select(
            "member", html_main_text(F.col("content").cast("string")).alias("e")
        ).collect()
    )
    direct = sorted(
        (f"doc_{r.doc_id:06d}.txt", r.e.extracted, r.e.n_blocks)
        for r in pages.select(
            "doc_id", html_main_text(F.col("text")).alias("e")
        ).collect()
    )
    assert via_warc == direct and via_warc
    # chrome dropped, both content blocks kept, anchor text gone
    assert all(n == 2 for _, _, n in via_warc)
    assert not any("Home" in x or "Privacy" in x for _, x, _ in via_warc)


def test_unigram_segmentation_covers_words_exactly(spark, sf_dir):
    """Viterbi invariants over the real corpus vocabulary: every
    distinct word's segmentation concatenates back to the word, every
    emitted piece is in the current vocab, and no piece exceeds
    _UNI_MAX_PIECE chars."""
    from flod_spark.catalog.text import (
        _UNI_MAX_PIECE,
        _uni_seed_vocab,
        _uni_vocab_map,
        _uni_words,
        unigram_viterbi_seg,
    )

    words = _uni_words(spark, sf_dir)
    vocab = [(r.piece, r.cnt) for r in _uni_seed_vocab(words).collect()]
    vmap = _uni_vocab_map(sorted(vocab))
    rows = words.select(
        "w", unigram_viterbi_seg(F.col("w"), vmap).alias("seg")
    ).collect()
    assert rows
    vset = {p for p, _ in vocab}
    for r in rows:
        pieces = r.seg.split(" ")
        assert "".join(pieces) == r.w
        assert all(p in vset and 1 <= len(p) <= _UNI_MAX_PIECE for p in pieces)


def test_unigram_tiebreak_and_leftmost_semantics(spark):
    """Freeze the segmentation's total order on a crafted vocab: fewest
    pieces wins ('nanana' -> 2 pieces), count breaks piece-count ties
    ('banana' -> 'ban an a' over 'b an an a'-style splits), and equal
    (n, sum) falls to the lexicographically smallest piece sequence
    ('na nana' < 'nana na')."""
    from flod_spark.catalog.text import _uni_vocab_map, unigram_viterbi_seg

    vmap = _uni_vocab_map(
        sorted({"b": 2, "a": 10, "n": 1, "an": 8, "ban": 3, "na": 7, "nana": 1}.items())
    )
    df = spark.createDataFrame([("banana",), ("ban",), ("a",), ("nanana",)], "w string")
    got = {r.w: r.seg for r in df.select("w", unigram_viterbi_seg(F.col("w"), vmap).alias("seg")).collect()}
    assert got == {"banana": "ban an a", "ban": "ban", "a": "a", "nanana": "na nana"}


def test_unigram_training_converges_and_is_stable(spark, sf_dir):
    """The driver-loop convergence twin (the *_converged discipline):
    EM usage counts reach a fixpoint on this corpus within a small
    round cap, and once converged, extra rounds leave the vocab
    IDENTICAL — so the registered fixed-round query is a prefix of the
    converged trajectory."""
    from flod_spark.catalog.text import _UNI_ROUNDS, _unigram_rounds

    cap = 8
    out, _final = _unigram_rounds(spark, sf_dir, cap)
    by_round = {}
    for r, p, c in out:
        by_round.setdefault(r, set()).add((p, c))
    conv = None
    for r in range(1, cap + 1):
        if by_round[r] == by_round[r - 1]:
            conv = r
            break
    assert conv is not None, f"no EM fixpoint within {cap} rounds"
    for r in range(conv, cap + 1):
        assert by_round[r] == by_round[conv - 1]
    # the registered trajectory is a prefix of the converged one
    reg, _ = _unigram_rounds(spark, sf_dir, _UNI_ROUNDS)
    assert set(reg) == {
        (r, p, c) for r, p, c in out if r <= _UNI_ROUNDS
    }


def test_crawl_pipeline_stages_all_fire(spark, sf_dir):
    """The composed crawl chain's three stages are each non-vacuous at
    any sf BY CONSTRUCTION: thin-page stubs fall to the quality floor
    (both fetches), every surviving original is admitted, and every
    surviving re-fetched copy is rejected by dedup with the SAME
    fingerprint as its original."""
    import __spark_entry__ as e
    from flod_spark.catalog.surface import _CRAWL_REFETCH, _CRAWL_THIN_MOD
    from flod_spark.io import load

    n = load(spark, sf_dir, "documents").count()
    rows = e.queries()["crawl_pipeline"](spark, sf_dir).collect()
    assert 0 < len(rows) < 2 * n  # quality dropped something
    orig = {r.doc_id: r for r in rows if r.doc_id < _CRAWL_REFETCH}
    copy = {r.doc_id - _CRAWL_REFETCH: r for r in rows if r.doc_id >= _CRAWL_REFETCH}
    assert set(orig) == set(copy) and orig
    assert all(r.admitted for r in orig.values())
    assert not any(r.admitted for r in copy.values())
    assert all(orig[d].fp == copy[d].fp for d in orig)
    # the quality-dropped set is exactly the thin-page residue (their
    # chrome-only extraction is under the floor at this corpus's sizes)
    dropped = {d for d in range(n) if d not in orig}
    assert dropped and dropped <= {d for d in range(n) if d % _CRAWL_THIN_MOD == 0}


def test_unigram_vocab_table_roundtrip_matches_registered_apply(spark, sf_dir, tmp_path):
    """The production inference path (ship the vocab table, never
    re-train): unigram_save_vocab + unigram_apply_from_table equals
    the registered unigram_apply bit-for-bit — the bpe_apply_merges
    discipline for the unigram pair."""
    import __spark_entry__ as e
    from flod_spark.catalog.text import (
        _UNI_ROUNDS,
        _unigram_rounds,
        unigram_apply_from_table,
        unigram_save_vocab,
    )
    from flod_spark.io import load

    _, vocab = _unigram_rounds(spark, sf_dir, _UNI_ROUNDS)
    vpath = str(tmp_path / "uni_vocab")
    unigram_save_vocab(vocab, spark, vpath)
    docs = load(spark, sf_dir, "documents")
    got = sorted(
        tuple(r) for r in unigram_apply_from_table(docs, spark, vpath).collect()
    )
    want = sorted(
        tuple(r) for r in e.queries()["unigram_apply"](spark, sf_dir).collect()
    )
    assert got == want and got


def test_unigram_dp_pads_do_not_truncate(spark):
    """The non-truncating-pad pin (r11 lesson applied to the unigram
    oracle): positions and scores encode via printf — which PADS TO AT
    LEAST the width — where lpad would silently TRUNCATE past it and
    corrupt the DP's string-encoded candidate order. Pin the primitive
    on both engines, then pin full cross-engine DP agreement on a
    300-char word (long enough that per-position parsing is exercised
    far past one digit; the >9999-char cliff is covered by the
    primitive pin since the DP treats the pad purely positionally)."""
    import duckdb

    from flod_spark.catalog.text import (
        _uni_seg_sql,
        _uni_vocab_map,
        unigram_viterbi_seg,
    )

    con = duckdb.connect()
    # the primitive: printf never truncates; lpad (the rejected form) does
    assert con.execute("SELECT printf('%04d', 123456)").fetchone()[0] == "123456"
    assert con.execute("SELECT lpad('123456', 4, '0')").fetchone()[0] == "1234"
    big = 12_345_678_901_234_567
    assert con.execute(f"SELECT printf('%020d', CAST({big} AS BIGINT))").fetchone()[
        0
    ] == f"{big:020d}"

    w = "ab" * 150
    vocab = sorted({"a": 5, "b": 3, "ab": 9}.items())
    got_spark = (
        spark.createDataFrame([(w,)], "w string")
        .select(unigram_viterbi_seg(F.col("w"), _uni_vocab_map(vocab)).alias("seg"))
        .first()
        .seg
    )
    got_duck = con.execute(
        "WITH v(piece, cnt) AS (VALUES ('a', CAST(5 AS BIGINT)), ('b', 3), ('ab', 9)), "
        "m AS (SELECT map_from_entries(list(row(piece, cnt))) AS vmap FROM v), "
        f"wrds(w) AS (VALUES ('{w}')) "
        f"SELECT {_uni_seg_sql()} FROM wrds, m"
    ).fetchone()[0]
    assert got_spark == got_duck == " ".join(["ab"] * 150)
