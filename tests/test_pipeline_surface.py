"""Reference-surface operator tests, mirroring the reference's test strategy
(SURVEY.md §5): parameterized operator × input-size matrix with exact,
order-aware assertions (sizes {0, n/3, n-1, n, n+1} like pipeline.d:1318),
take edge limits (package.d:209-228), byLine separator/terminator edge cases
(range.d:470-483, 511-547), byChunk partial last chunk (range.d:627-632),
file round-trip (file.d:69-84).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import flod_spark as fs

N = 173  # scaled-down analog of the reference's 173447-element stream


def values(p):
    return [r.value for r in p.to_array()]


SIZES = [0, N // 3, N - 1, N, N + 1]


@pytest.mark.parametrize("n", SIZES)
def test_from_range_roundtrip(spark, n):
    assert values(fs.from_range(spark, 0, n)) == list(range(n))


@pytest.mark.parametrize("n", SIZES)
def test_from_array_roundtrip(spark, n):
    data = [i * 7 for i in range(n)]
    assert values(fs.from_array(spark, data)) == data


# take limits mirror package.d:218: 0, 1, n/3, n-1, n, n+1, huge
@pytest.mark.parametrize("limit", [0, 1, N // 3, N - 1, N, N + 1, 999_999_999_999])
def test_take_limits(spark, limit):
    out = values(fs.from_range(spark, 0, N).take(limit))
    assert out == list(range(min(limit, N)))


def test_take_chains(spark):
    # take(take(s, a), b) == take(s, min(a,b)) — flod stacks Take stages
    p = fs.from_range(spark, 0, N).take(100).take(17)
    assert values(p) == list(range(17))


@pytest.mark.parametrize(
    "text,sep,keep,expected",
    [
        # classic: terminated + unterminated final line (range.d:407-419)
        ("first\nsecond\nthird", "\n", False, ["first", "second", "third"]),
        ("first\nsecond\n", "\n", False, ["first", "second"]),
        # keepTerminator (range.d:445-451)
        ("first\nsecond\nthird", "\n", True, ["first\n", "second\n", "third"]),
        ("first\nsecond\n", "\n", True, ["first\n", "second\n"]),
        # CRLF with empty lines (range.d:470-483 pattern)
        ("Foo\r\nBar\r\n\r\n", "\r\n", False, ["Foo", "Bar", ""]),
        # multi-char separator
        ("a--b--c", "--", False, ["a", "b", "c"]),
        # UTF-8 text (Polish/Korean, range.d:511-547)
        ("Zażółć gęślą jaźń\n여보세요 세계", "\n", False, ["Zażółć gęślą jaźń", "여보세요 세계"]),
        # empty input
        ("", "\n", False, []),
        # separator-only
        ("\n", "\n", False, [""]),
        # regex-metachar separators split LITERALLY (flod Splitter takes
        # arbitrary terminator strings, range.d:359-515)
        ("a.b.c", ".", False, ["a", "b", "c"]),
        ("a|b|c", "|", False, ["a", "b", "c"]),
        ("a$b$", "$", False, ["a", "b"]),
        ("x**y**z", "**", False, ["x", "y", "z"]),
        ("a\\Qb\\Qc", "\\Q", False, ["a", "b", "c"]),
        ("a\\Eb\\Ec", "\\E", False, ["a", "b", "c"]),
    ],
)
def test_by_line(spark, text, sep, keep, expected):
    p = fs.from_array(spark, [text], type_hint="string").by_line(sep=sep, keep_terminator=keep)
    assert values(p) == expected


def test_by_line_multirow_order(spark):
    # lines from consecutive stream elements keep global order
    p = fs.from_array(spark, ["a\nb", "c", "d\ne\n"], type_hint="string").by_line()
    assert values(p) == ["a", "b", "c", "d", "e"]


@pytest.mark.parametrize("size,n", [(1, 5), (2, 5), (3, 10), (4, 4), (7, 6)])
def test_by_chunk_partial_last(spark, size, n):
    # mirrors range.d:627-632: last chunk is partial
    p = fs.from_range(spark, 0, n).by_chunk(size)
    rows = p.to_array()
    chunks: dict[int, list[int]] = {}
    for r in rows:
        chunks.setdefault(r.chunk_id, []).append(r.value)
    expected = {i: list(range(i * size, min((i + 1) * size, n))) for i in range((n + size - 1) // size)}
    assert {k: sorted(v) for k, v in chunks.items()} == expected


def test_sink_file_roundtrip(spark, tmp_path):
    # file.d:69-84 round-trip through a real file sink
    src = fs.from_range(spark, 0, 100)
    path = str(tmp_path / "roundtrip.parquet")
    src.write_parquet(path)
    back = fs.read_parquet(spark, path).ordered_by("seq")
    assert values(back) == list(range(100))


def test_sink_copy_and_discard(spark):
    p = fs.from_range(spark, 0, 10)
    target: list = []
    p.copy_to(target)
    assert [r.value for r in target] == list(range(10))
    assert p.discard() == 10


def test_queue_put_chunks(spark):
    q = fs.Queue(spark)
    q.put([1, 2])
    q.put([3])
    q.put([])
    q.put([4, 5, 6])
    assert values(q.snapshot()) == [1, 2, 3, 4, 5, 6]


def test_iterate_as_input_range(spark):
    # entry point B: lazy element-wise iteration (pipeline.d:467-470)
    it = iter(fs.from_range(spark, 0, 1000))
    first = [next(it).value for _ in range(5)]
    assert first == [0, 1, 2, 3, 4]


def test_tags_nearest_upstream(spark):
    p = fs.from_array(spark, [1], type_hint="long")
    p2 = p.set_tag("k", "a").set_tag("k", "b")
    assert p2.get_tag("k") == "b"
    with pytest.raises(KeyError):
        p.get_tag("missing")


def test_on_change_fires(spark):
    seen: list = []
    p = fs.from_array(spark, [1], type_hint="long").on_change("rate", seen.append)
    p.set_tag("rate", 48000)
    assert seen == [48000]


def test_on_change_survives_transforms(spark):
    # listeners are pipeline metadata, not stage state: an intervening
    # transform must not drop them (pipeline.d:251-262)
    seen: list = []
    p = fs.from_array(spark, [1, 2, 3], type_hint="long").on_change("rate", seen.append)
    p2 = p.take(2).map_values(F.col("value") * 2)
    p2.set_tag("rate", 8000)
    assert seen == [8000]
    # and the original pipeline's listener list is not aliased
    p.set_tag("rate", 16000)
    assert seen == [8000, 16000]


def test_order_required_error(spark):
    with pytest.raises(ValueError, match="ordered_by"):
        fs.read_parquet(spark, "/root/testdata/sf0.001/nation.parquet").by_chunk(4)


def test_adapter_noop_identity(spark):
    # adapters are identity on data (adapter.d:12-580)
    p = fs.from_range(spark, 0, 50)
    assert sorted(values(p.repartition_hint(4))) == list(range(50))


@pytest.mark.parametrize("size,n", [(16, 100), (7, 50), (5, 5), (3, 0)])
def test_by_chunk_arrays_element_type(spark, size, n):
    """byChunk's true semantics: chunks ARE the elements (E -> E[]),
    last partial chunk kept (range.d:627-632)."""
    p = fs.from_range(spark, 0, n).ordered_by("value").by_chunk_arrays(size)
    rows = sorted(p.to_array(), key=lambda r: r.seq)
    expect = [list(range(i, min(i + size, n))) for i in range(0, n, size)]
    assert [r.value for r in rows] == expect
    assert [r.seq for r in rows] == list(range(len(expect)))


def test_observe_dynamic_tag(spark):
    p, obs = fs.from_array(spark, [3, 1, 4, 1, 5], type_hint="long").observe(
        "st", mx=F.max("value"), n=F.count(F.lit(1))
    )
    p.discard()  # any action materializes the observation
    assert obs.get == {"mx": 5, "n": 5}


def test_chainable_dedup_exact_ordered_keeps_first(spark):
    p = fs.from_array(spark, [7, 7, 3, 3, 7], type_hint="long")
    out = p.dedup_exact().to_array()
    # ordered stream: canonical = first occurrence, stream order preserved
    # and seq re-ranked gap-free (downstream take/by_chunk depend on it)
    assert [(r.value, r.seq) for r in out] == [(7, 0), (3, 1)]


def test_chainable_dedup_then_take_honors_stream_order(spark):
    # regression: a gapped seq after dedup made take(2) return 1 row
    p = fs.from_array(spark, [7, 7, 3, 3, 7, 9], type_hint="long")
    assert [r.value for r in p.dedup_exact().take(2).to_array()] == [7, 3]
    assert [r.value for r in p.dedup_exact().by_chunk_arrays(2).to_array()][0] == [7, 3]


def test_chainable_sample_and_split_disjoint_total(spark):
    p = fs.from_range(spark, 0, 1000)
    s = p.sample_hash(0.25)
    n = s.df.count()
    assert 150 <= n <= 350  # ~250 expected, deterministic but hash-spread
    assert s.df.count() == n  # stable across evaluations
    parts = p.split({"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {k: v.df.count() for k, v in parts.items()}
    assert sum(counts.values()) == 1000
    ids = [set(r.value for r in v.df.select("value").collect()) for v in parts.values()]
    assert not (ids[0] & ids[1]) and not (ids[0] & ids[2]) and not (ids[1] & ids[2])
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_set_tag_accepts_arbitrary_objects(spark):
    # engine write-through needs JSON-able values; anything else must
    # still work driver-side (flod tags are arbitrary in-process values)
    class Cfg:
        rate = 48000

    c = Cfg()
    p = fs.from_array(spark, [1, 2], type_hint="long").set_tag("cfg", c).take(1)
    assert p.get_tag("cfg") is c


def test_chainable_decontaminate_broadcasts_no_collect(spark):
    # a train doc that shares >=3 token 5-grams with a bench doc drops;
    # unrelated docs survive. The bench gram set must reach executors as
    # a broadcast (one-row crossJoin), never through a driver collect.
    contaminated = "the quick brown fox jumps over the lazy dog again and again"
    clean = "completely different words about spark partitions and shuffles here"
    bench = fs.from_array(spark, [contaminated], type_hint="string")
    train = fs.from_array(spark, [contaminated, clean], type_hint="string")
    out = train.decontaminate(bench)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    vals = [r.value for r in out.to_array()]
    assert vals == [clean]


def test_chainable_decontaminate_empty_bench_keeps_all(spark):
    bench = fs.from_array(spark, [], type_hint="string")
    train = fs.from_array(spark, ["keep me", "and me"], type_hint="string")
    assert len(train.decontaminate(bench).to_array()) == 2


def test_chainable_pii_scrub(spark):
    p = fs.from_array(
        spark,
        ["mail me at a.b@x-corp.io or call 555-123-4567 from 10.0.0.1", "clean text"],
        type_hint="string",
    )
    vals = [r.value for r in p.pii_scrub().to_array()]
    assert vals == ["mail me at <EMAIL> or call <PHONE> from <IP>", "clean text"]


def test_by_line_wide_element_width_contract(spark, sf_dir):
    """The flod wide-encoding byLine contract (range.d:367-371): the
    split unit is an element, not a byte — U+010A (low byte 0x0A) must
    survive unsplit; UTF-16 and UTF-32 blobs of the same text must
    produce identical lines; multibyte text round-trips exactly."""
    from flod_spark.catalog.surface import _WIDE_TEXTS, by_line_wide

    rows = by_line_wide(spark, sf_dir).collect()
    by_blob: dict[str, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r.blob_id, r.line_no)):
        by_blob.setdefault(r.blob_id, []).append(r.line)
    # widths agree, and lines are the exact flod byLine split (terminated
    # final line yields no trailing empty element)
    for name, txt in _WIDE_TEXTS:
        parts = txt.split("\n")
        if parts[-1] == "":
            parts = parts[:-1]
        assert by_blob[f"{name}2"] == parts
        assert by_blob[f"{name}4"] == parts
    # the 0x0A-byte trap char survived inside a line
    assert by_blob["trap2"] == ["przedĊpo", "ostatnia"]
    assert by_blob["trap4"] == ["przedĊpo", "ostatnia"]


def test_winnow_facade_appends_sketch(spark, sf_dir):
    import flod_spark as fs
    from flod_spark.io import load

    docs = load(spark, sf_dir, "documents").limit(50)
    p = fs.Pipeline(docs).winnow()
    rows = p.df.select("doc_id", "n_grams", "fp_sketch").collect()
    assert len(rows) == 50
    with_sketch = [r for r in rows if r["fp_sketch"] is not None]
    assert with_sketch, "no doc long enough to fingerprint?"
    assert all(len(r["fp_sketch"]) == 32 for r in with_sketch)
