"""Property-based tests (hypothesis): operators vs plain-Python models.

The reference's closed-form-oracle style (pipeline.d:1311-1317) taken one
step further: random inputs, model computed in Python, compared exact.
Deadlines disabled: Spark actions have multi-second jitter.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import flod_spark as fs
from flod_spark.seq import with_seq

TEXT = st.text(alphabet=list("ab \t\n"), max_size=40)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(TEXT, min_size=1, max_size=5))
def test_by_line_matches_python_split(spark, texts):
    """by_line == python str.split('\\n') with the trailing-empty rule
    (terminated final line drops the empty marker; unterminated kept)."""
    p = fs.from_array(spark, texts, type_hint="string").by_line()
    got = [(r.line_no, r.value) for r in sorted(p.to_array(), key=lambda r: r.seq)]
    expect = []
    for t in texts:
        parts = t.split("\n")
        # trailing '' is the terminated-end marker, dropped — which also
        # means an empty chunk is an empty stream: zero lines (flod:
        # byLine of an empty stream emits nothing, range.d:407-419)
        if parts and parts[-1] == "":
            parts = parts[:-1]
        for i, line in enumerate(parts, 1):
            expect.append((i, line))
    assert got == expect


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(st.integers(min_value=-(2**31), max_value=2**31), min_size=0, max_size=60),
)
def test_with_seq_is_rank(spark, xs):
    """seq == rank in the total order (value, uid) for arbitrary ints
    (duplicates allowed via the uid tiebreak)."""
    rows = [(i, v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "uid long, value long") if rows else spark.createDataFrame([], "uid long, value long")
    out = with_seq(df, "value", "uid").collect()
    got = {r.uid: r.seq for r in out}
    expect = {uid: rank for rank, (v, uid) in enumerate(sorted((v, u) for u, v in rows))}
    assert got == expect


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(st.text(alphabet=list("abc xy0"), max_size=60), min_size=1, max_size=4))
def test_ngram_helper_matches_python_model(spark, texts):
    """_ngram_arr_col == the plain-Python distinct token-5-gram model
    (tokenize, window of 5, join with spaces, dedup preserving nothing)."""
    import re

    from flod_spark.catalog.dedup import DECON_NGRAM, _ngram_arr_col
    from flod_spark.catalog.text import TOKEN_RE

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    out = {
        r.id: sorted(r.g)
        for r in df.select(
            "id",
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), F.lit(0)).alias("tk"),
        ).select("id", _ngram_arr_col().alias("g")).collect()
    }
    for i, t in enumerate(texts):
        tk = re.findall("[a-z0-9]+", t.lower())
        grams = {" ".join(tk[j : j + DECON_NGRAM]) for j in range(len(tk) - DECON_NGRAM + 1)}
        assert sorted(grams) == out[i]


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.floats(min_value=-2.0, max_value=2.0, width=32), min_size=1, max_size=50))
def test_fixed_point_sum_is_order_free(vals):
    """floor(v * 2^40) summed as ints is identical under any ordering and
    equals the straight Python model — the embed_centroids exactness claim."""
    import math

    FXP = 1099511627776.0
    ints = [math.floor(float(v) * FXP) for v in vals]
    assert sum(ints) == sum(reversed(ints)) == sum(sorted(ints))
    # quantization error bound: n ulps at 2^-40
    assert abs(sum(ints) / FXP - math.fsum(float(v) for v in vals)) <= len(vals) / FXP


def _del_neighborhood(s: str, d: int = 2) -> set:
    out = {s}
    frontier = {s}
    for _ in range(d):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a=st.text(alphabet=list("abc"), max_size=8),
    b=st.text(alphabet=list("abc"), max_size=8),
)
def test_deletion_neighborhood_candidate_filter_is_lossless(a, b):
    """join_fuzzy's SymSpell lemma (dedup.py): edit distance <= 2 implies
    the <=2-deletion neighborhoods intersect — the candidate equi-join can
    over-generate (verified away by levenshtein) but NEVER under-generate.
    Tiny alphabet maximizes collision density, the adversarial case."""
    if _lev(a, b) <= 2:
        assert _del_neighborhood(a) & _del_neighborhood(b), (a, b)


def _pj_segments(v: str):
    """Pure-Python mirror of dedup.py's segment scheme: 3 segments, the
    last (len % 3) get the extra char; yields (i, seg, start_1based)."""
    l = len(v)
    q, r = divmod(l, 3)
    start = 1
    for i in range(3):
        ln = q + (1 if i >= 3 - r else 0)
        yield i, v[start - 1 : start - 1 + ln], start
        start += ln


def _pj_probe_entries(u: str):
    """Mirror of the probe generator: for each target length l0 and
    segment index, u's substrings of the scheme's segment length at the
    in-window positions."""
    out = set()
    for dl in range(-2, 3):
        l0 = len(u) + dl
        if l0 < 3:
            continue
        q, r = divmod(l0, 3)
        start = 1
        for i in range(3):
            ln = q + (1 if i >= 3 - r else 0)
            p0 = start
            start += ln
            for shift in range(-2, 3):
                p = p0 + shift
                if p >= 1 and p + ln - 1 <= len(u):
                    out.add((l0, i, u[p - 1 : p - 1 + ln]))
    return out


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a=st.text(alphabet=list("ab"), min_size=1, max_size=10),
    b=st.text(alphabet=list("ab"), min_size=1, max_size=10),
)
def test_passjoin_segment_candidates_are_lossless(a, b):
    """join_fuzzy_seg's pigeonhole scheme (dedup.py), mirrored in pure
    Python: if lev(a,b) <= 2 the pair MUST surface as a candidate —
    through a segment match in either direction, or the short x short
    branch. Binary alphabet maximizes spurious structure; lengths 1-10
    cross the segmentable threshold both ways."""
    if a == b or _lev(a, b) > 2:
        return
    short_a, short_b = len(a) < 3, len(b) < 3
    if short_a and short_b:
        return  # short x short branch pairs them unconditionally
    hit = False
    if not short_b:  # b indexable, a probes
        idx_b = {(len(b), i, seg) for i, seg, _ in _pj_segments(b)}
        hit = hit or bool(_pj_probe_entries(a) & idx_b)
    if not short_a:  # a indexable, b probes
        idx_a = {(len(a), i, seg) for i, seg, _ in _pj_segments(a)}
        hit = hit or bool(_pj_probe_entries(b) & idx_a)
    assert hit, (a, b, _lev(a, b))


@settings(max_examples=100, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    stream=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    chunk=st.integers(min_value=1, max_value=50),
)
def test_misra_gries_absorb_never_loses_a_heavy_key(stream, chunk):
    """The MG lemma _mg_absorb's batch form relies on, against a pure
    Python model: after absorbing ANY chunking of the stream, every key
    with frequency > n/_HH_C keeps a positive counter. (Pure Python —
    no Spark job — so the example budget is cheap.)"""
    from collections import Counter

    import numpy as np

    from flod_spark.catalog.analytics import _HH_C, _mg_absorb

    ks = np.empty(0, dtype="int64")
    vs = np.empty(0, dtype="int64")
    for i in range(0, len(stream), chunk):
        bk, bc = np.unique(
            np.asarray(stream[i : i + chunk], dtype="int64"), return_counts=True
        )
        ks, vs = _mg_absorb(ks, vs, bk, bc.astype("int64"))
    survivors = set(ks.tolist())
    true = Counter(stream)
    n = len(stream)
    for k, c in true.items():
        if c * _HH_C > n:
            assert k in survivors, f"heavy key {k} ({c}/{n}) evicted"


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=120,
    ),
    data=st.data(),
)
def test_qe_value_df_is_exact_order_statistic(spark, xs, data):
    """_qe_value_df == sorted(xs)[rank-1] for arbitrary floats
    (duplicates and all), with buckets=4/leaf=6 forcing the recursive
    path on most inputs."""
    import pandas as pd

    from flod_spark.catalog.relational import _qe_value_df

    rank = data.draw(st.integers(min_value=1, max_value=len(xs)))
    mn, mx = min(xs), max(xs)
    srt = sorted(xs)
    df = spark.createDataFrame(pd.DataFrame({"x": pd.Series(xs, dtype="float64")}))
    if mn == mx:
        return  # the gated query's all-equal branch, tested elsewhere
    got = _qe_value_df(df, mn, mx, rank, "v", buckets=4, leaf=6).collect()[0]["v"]
    assert got == srt[rank - 1]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    dim_keys=st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40),
    probe_keys=st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60),
)
def test_bloom_filter_has_no_false_negatives(spark, dim_keys, probe_keys):
    """Every dim key passes its own bloom filter, for arbitrary key
    sets — the correctness half of join_bloom (false positives are
    allowed; the exact join removes them)."""
    import pandas as pd

    from flod_spark.catalog.relational import _bloom_build_words, _bloom_hit

    dim = spark.createDataFrame(
        pd.DataFrame({"k": pd.Series(sorted(dim_keys), dtype="int64")})
    )
    words = _bloom_build_words(dim, "k")
    probes = sorted(probe_keys | dim_keys)
    pf = spark.createDataFrame(pd.DataFrame({"k": pd.Series(probes, dtype="int64")}))
    passed = {r["k"] for r in pf.filter(_bloom_hit(words, F.col("k"))).collect()}
    assert dim_keys <= passed  # no false negatives, ever


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pos=st.sets(st.integers(min_value=1, max_value=300), min_size=1, max_size=60),
)
def test_anchor_coverage_is_exact_interval_union(spark, pos):
    """anchor_coverage_chars == |union of [p, p+K-1]| computed by a
    plain Python set model, for arbitrary anchor position sets."""
    from flod_spark.catalog.text import _KR_K, anchor_coverage_chars

    ps = sorted(pos)
    df = spark.createDataFrame([(ps,)], "ps array<long>")
    got = df.select(anchor_coverage_chars().alias("c")).collect()[0]["c"]
    covered = set()
    for p in ps:
        covered.update(range(p, p + _KR_K))
    assert got == len(covered)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=6),
)
def test_temperature_rates_hit_the_budget_in_expectation(spark, counts):
    """sample_temperature's rate algebra on arbitrary language counts:
    every rate in (0, 1], and expected kept mass sum(r_l * n_l) <= the
    budget fraction of the corpus (equality when nothing clamps at 1;
    clamping only ever LOWERS the expectation)."""
    import pandas as pd

    from flod_spark.catalog.sampling import TEMP_BUDGET, sample_temperature

    rows = []
    doc_id = 0
    for li, n in enumerate(counts):
        for _ in range(n):
            rows.append((doc_id, f"l{li}", "x"))
            doc_id += 1
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="flod_temp_prop_")
    try:
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"]).astype(
            {"doc_id": "int64"}
        ).to_parquet(f"{d}/documents.parquet")
        got = sample_temperature(spark, d).collect()
        n_total = sum(counts)
        assert {r["lang"] for r in got} == {f"l{li}" for li in range(len(counts))}
        exp_kept = 0.0
        clamped = False
        for r in got:
            assert 0.0 < r["rate"] <= 1.0
            clamped |= r["rate"] == 1.0
            exp_kept += r["rate"] * r["n_docs"]
        if not clamped:
            assert abs(exp_kept - TEMP_BUDGET * n_total) < 1e-6 * n_total
        else:
            assert exp_kept <= TEMP_BUDGET * n_total + 1e-6 * n_total
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user
            st.integers(min_value=0, max_value=5000),   # seconds offset
            st.booleans(),                              # True = right side
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[1]),  # (user, ts) unique, like events
    ),
)
def test_asof_nearest_matches_python_model(spark, events):
    """asof_join_nearest vs a brute-force Python model: nearest |dt|
    right row per left row within the user, ties to backward, equal-t
    backward max-id / forward excluded (matched backward already)."""
    import datetime as dt

    from flod_spark.operators.asof import asof_join_nearest

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (i, u, t0 + dt.timedelta(seconds=s), is_r)
        for i, (u, s, is_r) in enumerate(events)
    ]
    lefts = [(i, u, t) for i, u, t, is_r in rows if not is_r]
    rights = [(i, u, t) for i, u, t, is_r in rows if is_r]
    if not lefts:
        return
    ldf = spark.createDataFrame(lefts, "event_id long, user_id long, ts timestamp_ntz")
    rdf = spark.createDataFrame(
        rights or [], "event_id long, user_id long, ts timestamp_ntz"
    )
    out = asof_join_nearest(
        left=ldf, right=rdf, on="user_id", left_time="ts", right_time="ts",
        left_cols={"event_id": "lid", "ts": "lts"},
        right_cols={"event_id": "rid", "ts": "rts"},
        tiebreak="event_id",
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    for lid, u, lt in lefts:
        back = [(t, i) for i, uu, t in rights if uu == u and t <= lt]
        fwd = [(t, i) for i, uu, t in rights if uu == u and t > lt]
        b = max(back, key=lambda p: (p[0], p[1])) if back else None
        f = min(fwd, key=lambda p: (p[0], p[1])) if fwd else None
        if b is None and f is None:
            want = None
        elif f is None or (b is not None and (lt - b[0]) <= (f[0] - lt)):
            want = b[1]
        else:
            want = f[1]
        assert got.get(lid) == want, f"left {lid}: got {got.get(lid)} want {want}"


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=0.015625, max_value=500, width=32),
        min_size=1,
        max_size=24,
    )
)
def test_window_ewma_matches_python_model(spark, tmp_path_factory, vals):
    """window_ewma == the plain-Python truncated adjusted EWM (integer
    2^k weights over existing lags, decimal-exact numerator) for
    arbitrary single-user series — including prefixes shorter than the
    horizon, where the denominator renormalizes."""
    import datetime as dt
    import os
    from decimal import Decimal

    import pandas as pd

    from flod_spark.catalog.relational import _EWMA_H, _EWMA_W, window_ewma

    d = str(tmp_path_factory.mktemp("sfewmaprop"))
    os.makedirs(d, exist_ok=True)
    t0 = dt.datetime(2025, 1, 1)
    pd.DataFrame(
        {
            "event_id": pd.Series(range(1, len(vals) + 1), dtype="int64"),
            "ts": pd.Series(
                [t0 + dt.timedelta(seconds=i) for i in range(len(vals))],
                dtype="datetime64[us]",
            ),
            "user_id": pd.Series([1] * len(vals), dtype="int64"),
            "event_type": ["view"] * len(vals),
            "value": vals,
            "props": ["{}"] * len(vals),
        }
    ).to_parquet(f"{d}/events.parquet")
    got = {r["event_id"]: r["ewma_8"] for r in window_ewma(spark, d).collect()}
    # model: quantize to DECIMAL(18,6) exactly as the engines do, weight
    # in exact integers, one closing float division
    q = [Decimal(str(float(v))).quantize(Decimal("0.000001")) for v in vals]
    for t in range(len(vals)):
        ks = range(min(t + 1, _EWMA_H))
        num = sum(_EWMA_W[k] * q[t - k] for k in ks)
        den = sum(_EWMA_W[k] for k in ks)
        assert got[t + 1] == float(num) / den, (t, vals)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=25
        ).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
def test_text_seg_dedup_matches_python_model(spark, tmp_path_factory, docs):
    """text_seg_dedup == the plain-Python first-occurrence segment model
    over a tiny token alphabet (dense duplicate segments, incl. within
    one doc and across docs)."""
    import os

    import pandas as pd

    from flod_spark.catalog.text import _SEG_W, text_seg_dedup

    d = str(tmp_path_factory.mktemp("sfsegprop"))
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": pd.Series(range(1, len(docs) + 1), dtype="int64"),
            "lang": ["en"] * len(docs),
            "text": docs,
        }
    ).to_parquet(f"{d}/documents.parquet")
    seen: set[str] = set()
    expect = {}
    for i, t in enumerate(docs, 1):
        toks = [w for w in t.split() if w]
        segs = [
            " ".join(toks[j : j + _SEG_W]) for j in range(0, len(toks), _SEG_W)
        ]
        dup = 0
        for s in segs:
            if s in seen:
                dup += 1
            else:
                seen.add(s)
        expect[i] = (len(segs), dup)
    got = {
        r["doc_id"]: (r["n_segs"], r["n_dup_segs"])
        for r in text_seg_dedup(spark, d).collect()
    }
    assert got == expect, docs
