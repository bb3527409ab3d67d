"""Round-10 operator tests — the bounded claim-state family
(_ttl_claim_fold + stream_ngram_novelty_bounded / stream_dedup_bounded):

- the TTL fold vs a per-event dict reference WITHOUT eviction
  (hypothesis): identical claims on arbitrary streams — the
  eviction-losslessness property, plus exact state equality vs the
  evicted reference;
- the state bound asserted on the REAL gram/event tables (sf0.01 and
  sf0.1 via duckdb, driver-side fold — no Spark session): after every
  trigger the surviving state is exactly the keys active within one
  horizon, a small fraction of the distinct-key space the unbounded
  forms carry;
- planted re-admission semantics: within-horizon duplicate suppressed,
  beyond-horizon occurrence claims again.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def _fold_batches(batches, ttl):
    """Drive _ttl_claim_fold over pre-split batches of (k, t) rows;
    returns (claims as a set of (k, t), per-trigger state snapshots)."""
    from flod_spark.catalog.streaming_live import _TTL_NONE, _ttl_claim_fold

    ks = np.empty(0, dtype="object")
    ls = np.empty(0, dtype="int64")
    mx = _TTL_NONE
    claims, snaps = [], []
    for batch in batches:
        bk = np.asarray([k for k, _ in batch], dtype="object")
        bt = np.asarray([t for _, t in batch], dtype="int64")
        o = np.lexsort((bt, bk))
        bk, bt = bk.take(o), bt.take(o)
        mask, ks, ls, mx = _ttl_claim_fold(ks, ls, mx, bk, bt, ttl)
        claims.extend(zip(bk[mask].tolist(), bt[mask].tolist()))
        snaps.append((dict(zip(ks.tolist(), ls.tolist())), mx))
    return claims, snaps


def _ttl_reference(batches, ttl):
    """Per-event dict fold WITHOUT eviction (the unbounded semantics the
    TTL fold must reproduce claim-for-claim) + the evicted state."""
    last: dict = {}
    claims = []
    mx = None
    for batch in batches:
        for k, t in sorted(batch, key=lambda e: (e[0], e[1])):
            if k not in last or t - last[k] > ttl:
                claims.append((k, t))
            last[k] = t
            mx = t if mx is None else max(mx, t)
    evicted = {k: t for k, t in last.items() if mx is not None and mx - t <= ttl}
    return claims, evicted, mx


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from("abcde"), st.integers(0, 120)),
        min_size=0,
        max_size=50,
    ),
    n_batches=st.integers(1, 5),
    ttl=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_ttl_fold_matches_unbounded_reference(rows, n_batches, ttl, seed):
    """Claims from the EVICTING fold == claims from the NEVER-evicting
    per-event reference, for any stream, horizon, and batch split in
    global time order (the replay contract) — the losslessness theorem
    stream_ngram_novelty_bounded/stream_dedup_bounded rest on. Final
    state equals the reference's survivors within one horizon."""
    rng = np.random.default_rng(seed)
    rows = sorted(rows, key=lambda e: e[1])
    cuts = sorted(rng.integers(0, len(rows) + 1, size=n_batches - 1).tolist())
    batches = [rows[a:b] for a, b in zip([0, *cuts], [*cuts, len(rows)])]
    got_claims, snaps = _fold_batches(batches, ttl)
    ref_claims, ref_state, _mx = _ttl_reference(batches, ttl)
    assert sorted(got_claims) == sorted(ref_claims)
    if rows:
        assert snaps[-1][0] == ref_state


def test_ttl_fold_plants_readmission():
    """Within-horizon duplicate suppressed; beyond-horizon occurrence
    claims again; refresh semantics (a mid-horizon duplicate extends
    the suppression window from ITS time, not the first claim's)."""
    batches = [
        [("x", 0), ("y", 0)],
        [("x", 5)],          # gap 5 <= ttl=10: suppressed, refreshes
        [("x", 14)],         # gap 9 from t=5 (refresh!): suppressed
        [("x", 30), ("y", 30)],  # gaps 16 and 30 > 10: both claim
    ]
    claims, snaps = _fold_batches(batches, 10)
    assert sorted(claims) == [("x", 0), ("x", 30), ("y", 0), ("y", 30)]
    # y idle through t=14 trigger: evicted there (14 - 0 > 10)
    assert "y" not in snaps[2][0]


def _doc_grams(sf_dir: str) -> pd.DataFrame:
    return duckdb.sql(
        "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS a "
        f"  FROM '{sf_dir}/documents.parquet') "
        "SELECT DISTINCT doc_id, md5(a[i] || ' ' || a[i+1] || ' ' || a[i+2]) AS h "
        "FROM (SELECT doc_id, a, unnest(range(1, len(a) - 1)) AS i FROM toks) "
        "WHERE len(a) >= 3 ORDER BY doc_id, h"
    ).df()


@pytest.mark.parametrize("sf_dir", [SF_DIR, "/root/testdata/sf0.1"])
def test_novelty_bounded_state_is_horizon_bounded(sf_dir):
    """The r9 verdict's ask verbatim: state bound ASSERTED on the real
    corpus — after every trigger, surviving entries are exactly the
    grams last seen within _NOV_TTL_DOCS of the trigger's max doc, and
    the peak is a small fraction of the distinct-gram space the
    unbounded stream_ngram_novelty_live carries."""
    from flod_spark.catalog.streaming_live import _NOV_TTL_DOCS

    g = _doc_grams(sf_dir)
    n_distinct = g["h"].nunique()
    docs = sorted(g["doc_id"].unique())
    quart = max(1, len(docs) // 4)
    rows = list(zip(g["h"], g["doc_id"]))
    batches = [
        [(h, int(d)) for h, d in rows if lo <= d < hi]
        for lo, hi in zip(
            [-1, docs[quart], docs[2 * quart], docs[3 * quart]],
            [docs[quart], docs[2 * quart], docs[3 * quart], 10**18],
        )
    ]
    claims, snaps = _fold_batches(batches, _NOV_TTL_DOCS)
    peak = 0
    for state, mx in snaps:
        assert all(mx - t <= _NOV_TTL_DOCS for t in state.values())
        peak = max(peak, len(state))
    # the bound with slack: grams in (horizon+1) docs, never the corpus
    per_doc = len(g) / len(docs)
    assert peak <= (_NOV_TTL_DOCS + 1) * per_doc * 3
    assert peak < 0.2 * n_distinct
    # and the claims equal the oracle's lag contract
    con = duckdb.connect()
    con.register("gdf", g)
    n_ref = con.sql(
        "WITH p AS (SELECT doc_id, h, lag(doc_id) OVER (PARTITION BY h ORDER BY doc_id) AS prev FROM gdf) "
        f"SELECT COUNT(*) FROM p WHERE prev IS NULL OR doc_id - prev > {_NOV_TTL_DOCS}"
    ).fetchone()[0]
    assert len(claims) == n_ref


def test_dedup_bounded_state_is_horizon_bounded():
    """Same assertion for the event-key TTL dedup at sf0.01: surviving
    state after each trigger is the keys active within 2 h of the
    trigger's max event time — a fraction of the distinct key space."""
    from flod_spark.catalog.streaming_live import _DEDUP_TTL_US

    ev = duckdb.sql(
        f"SELECT user_id, event_type, epoch_us(ts) AS us FROM '{SF_DIR}/events.parquet' "
        "ORDER BY us"
    ).df()
    keys = (ev["user_id"].astype(str) + "|" + ev["event_type"]).tolist()
    us = ev["us"].tolist()
    n_distinct = len(set(keys))
    rows = list(zip(keys, us))
    quart = len(rows) // 4
    batches = [rows[i * quart : (i + 1) * quart] for i in range(3)] + [rows[3 * quart :]]
    claims, snaps = _fold_batches(batches, _DEDUP_TTL_US)
    for state, mx in snaps:
        assert all(mx - t <= _DEDUP_TTL_US for t in state.values())
    peak = max(len(state) for state, _ in snaps)
    assert peak < 0.25 * n_distinct
    con = duckdb.connect()
    n_ref = con.sql(
        f"WITH p AS (SELECT ts, lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev "
        f"  FROM '{SF_DIR}/events.parquet') "
        "SELECT COUNT(*) FROM p WHERE prev IS NULL OR prev < ts - INTERVAL 2 HOURS"
    ).fetchone()[0]
    assert len(claims) == n_ref


def test_pca_power_converged_on_planted_anisotropy(spark):
    """pca_power_converged on a PLANTED anisotropic table (dominant
    direction u, spectral gap ~8x): lambda grows monotonically
    (PSD power-iteration certificate), the loop stops well before the
    round cap, the final lambda matches numpy's top eigenvalue of
    X^T X, the iterate aligns with the planted direction, and the
    fixpoint property holds: one more exact matvec returns ~lambda*v."""
    import math

    from flod_spark.catalog.similarity import _pca_matvec, pca_power_converged

    rng = np.random.default_rng(7)
    dim, n = 8, 200
    u = np.zeros(dim)
    u[2] = 0.8
    u[5] = 0.6
    x = rng.normal(0, 0.15, size=(n, dim)) + np.outer(rng.normal(0, 1.0, n), u)
    e = spark.createDataFrame(
        [(row.tolist(),) for row in x], "x array<double>"
    )
    v, lams = pca_power_converged(e, tol=1e-10, max_rounds=40)
    assert len(lams) < 40, "round cap hit on a strongly anisotropic table"
    assert all(b >= a - 1e-7 for a, b in zip(lams, lams[1:])), "lambda not monotone"
    # independent reference: dense eigendecomposition of X^T X
    evals, evecs = np.linalg.eigh(x.T @ x)
    lam_ref, v_ref = evals[-1], evecs[:, -1]
    assert abs(lams[-1] - lam_ref) <= 1e-6 * lam_ref
    assert abs(abs(np.dot(v, v_ref)) - 1.0) <= 1e-6
    # fixpoint: A v == lam v to quantization noise
    wd = _pca_matvec(e, v)
    resid = max(abs(w - lams[-1] * c) for w, c in zip(wd, v))
    assert resid <= 1e-5 * lams[-1]
    # and the convergence criterion actually fired (last two lams equal
    # to the tolerance, not just cap exhaustion)
    assert abs(lams[-1] - lams[-2]) <= 1e-10 * max(abs(lams[-1]), 1.0)
    assert math.isfinite(lams[-1])


def test_ttl_ops_under_rocksdb_state_store(spark, sf_dir):
    """The round-10 TTL claim-state ops under the production state
    backend: swapping to RocksDBStateStoreProvider changes neither
    bounded op's output (the stream_bollinger_live pin, extended to
    this round's richest custom state — sorted string-key arrays +
    last-seen longs + a max-time scalar per shard)."""
    import __spark_entry__ as entry

    key = "spark.sql.streaming.stateStore.providerClass"
    provider = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    for qk in ("stream_ngram_novelty_bounded", "stream_dedup_bounded"):
        fn = entry.queries()[qk]
        default = {tuple(r) for r in fn(spark, sf_dir).collect()}
        spark.conf.set(key, provider)
        try:
            rocks = {tuple(r) for r in fn(spark, sf_dir).collect()}
        finally:
            spark.conf.unset(key)
        assert rocks == default and rocks, qk
