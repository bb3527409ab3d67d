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
        em.groupBy("shard", "bucket").agg(F.count("*").alias("n")).collect()
    )
    assert sizes and all(r.n < len(true) for r in sizes)


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
    assert set(out["k"]) == {"hot", "late2"}
