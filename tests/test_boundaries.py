"""Boundary-length matrix — the reference's crown-jewel test pattern
(pipeline.d:1318-1319): every chain exercised at element counts
0, len/3, len-1, len, len+1 and 5*len (limit >> length,
package.d:209-228). sf-scale oracle tables can't express these
off-by-one regimes; planted inputs can, exactly.

Covers take / by_line / by_chunk / by_chunk_arrays on the Pipeline
facade and pack_sequences on a planted documents table.
"""

from __future__ import annotations

import pytest

import flod_spark as fs

L = 12
BOUNDARY_NS = sorted({0, L // 3, L - 1, L, L + 1, 5 * L})


def _elems(n: int) -> list[str]:
    return [f"e{i:02d}" for i in range(n)]


@pytest.mark.parametrize("n", BOUNDARY_NS)
def test_take_boundary_sizes(spark, n):
    """take(n) over an ordered length-L stream returns exactly the first
    min(n, L) elements in stream order — incl. n=0 and n >> L."""
    data = _elems(L)
    got = [
        r["value"]
        for r in fs.from_array(spark, data, type_hint="string").take(n).to_array()
    ]
    assert got == data[: min(n, L)]


@pytest.mark.parametrize("n", [0, 3])
def test_take_on_empty_stream(spark, n):
    got = fs.from_array(spark, [], type_hint="string").take(n).to_array()
    assert got == []


@pytest.mark.parametrize("m", BOUNDARY_NS)
@pytest.mark.parametrize("terminated", [False, True])
def test_by_line_boundary_line_counts(spark, m, terminated):
    """A value holding m lines splits into exactly m elements, in order,
    with 1-based line_no — whether or not the final line is terminated
    (range.d:407-419: unterminated tail kept, trailing terminator adds
    no empty line)."""
    lines = [f"l{i:03d}" for i in range(m)]
    text = "\n".join(lines) + ("\n" if terminated and m else "")
    p = fs.from_array(spark, [text], type_hint="string").by_line()
    rows = p.to_array()
    assert [r["value"] for r in rows] == lines
    assert [r["line_no"] for r in rows] == list(range(1, m + 1))


def test_by_line_empty_value_yields_nothing(spark):
    """'' is a zero-line stream: no content, no terminator -> 0 elements
    (the m=0 row of the matrix, pinned explicitly)."""
    assert fs.from_array(spark, [""], type_hint="string").by_line().to_array() == []


@pytest.mark.parametrize("m", [b for b in BOUNDARY_NS if b > 0])
def test_by_line_keep_terminator_roundtrip(spark, m):
    """keep_terminator re-appends the separator to every line but an
    unterminated tail — concatenating the outputs reconstructs the
    input byte-for-byte at every boundary length (range.d:445-451)."""
    lines = [f"l{i:03d}" for i in range(m)]
    for text in ("\n".join(lines), "\n".join(lines) + "\n"):
        rows = (
            fs.from_array(spark, [text], type_hint="string")
            .by_line(keep_terminator=True)
            .to_array()
        )
        assert "".join(r["value"] for r in rows) == text


@pytest.mark.parametrize("size", [b for b in BOUNDARY_NS if b > 0])
def test_by_chunk_arrays_boundary_sizes(spark, size):
    """by_chunk_arrays(size) over a length-L ordered stream: ceil(L/size)
    chunks, each chunk the contiguous slice in stream order, last chunk
    partial — for size < L, == L, == L±1 and size >> L."""
    data = _elems(L)
    rows = (
        fs.from_array(spark, data, type_hint="string")
        .by_chunk_arrays(size)
        .to_array()
    )
    expect = [data[i : i + size] for i in range(0, L, size)]
    assert [list(r["value"]) for r in rows] == expect


@pytest.mark.parametrize("size", [1, L, 5 * L])
def test_by_chunk_arrays_empty_stream(spark, size):
    assert (
        fs.from_array(spark, [], type_hint="string").by_chunk_arrays(size).to_array()
        == []
    )


@pytest.mark.parametrize("size", [b for b in BOUNDARY_NS if b > 0])
def test_by_chunk_ids_boundary_sizes(spark, size):
    """by_chunk(size) tags element i with chunk_id i div size."""
    data = _elems(L)
    rows = fs.from_array(spark, data, type_hint="string").by_chunk(size).to_array()
    assert [r["chunk_id"] for r in rows] == [i // size for i in range(L)]
    assert [r["value"] for r in rows] == data  # elements untouched


def _write_documents(spark, tmp_path, rows):
    """Plant a minimal documents table under tmp_path (io.load reads
    {dir}/documents.parquet)."""
    df = spark.createDataFrame(rows, "doc_id long, lang string, url string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _py_shard(doc_id: int) -> int:
    import hashlib

    from flod_spark.catalog.packing import NSHARDS

    h = hashlib.md5(f"k|{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) % NSHARDS


def test_pack_sequences_empty_table(spark, tmp_path):
    from flod_spark.catalog.packing import pack_sequences

    sf = _write_documents(spark, tmp_path, [])
    assert pack_sequences(spark, sf).count() == 0


def test_pack_sequences_token_budget_boundaries(spark, tmp_path):
    """Documents with token counts at 0, B/3, B-1, B, B+1, 5B (B =
    PACK_BUDGET): offsets are the exact within-shard prefix sums in
    doc_id order and pack_id = shard*1e6 + offset div B — verified
    against a pure-Python replay of the same md5 shard + cumsum."""
    from flod_spark.catalog.packing import PACK_BUDGET, pack_sequences

    counts = sorted(
        {0, PACK_BUDGET // 3, PACK_BUDGET - 1, PACK_BUDGET, PACK_BUDGET + 1, 5 * PACK_BUDGET}
    )
    rows = [
        (i, "en", f"u{i}", " ".join(["tok"] * c)) for i, c in enumerate(counts)
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in pack_sequences(spark, sf).collect()}
    assert set(got) == set(range(len(counts)))
    offsets: dict[int, int] = {}
    for doc_id, c in enumerate(counts):  # doc_id ascending = window order
        sh = _py_shard(doc_id)
        off = offsets.get(sh, 0)
        r = got[doc_id]
        assert r["shard"] == sh
        assert r["n_tokens"] == c
        assert r["tok_offset"] == off
        assert r["pack_id"] == sh * 1000000 + off // PACK_BUDGET
        offsets[sh] = off + c
