"""Lossy counting (Manku–Motwani, VLDB'02) as a bounded-state streaming
operator — the support-floor state EVICTION the live market-basket
docstring promises: pair-support state is pruned at every bucket
boundary, so it tracks the heavy tail relative to bucket size instead
of the ever-observed pair set. With the micro-batch as the bucket the
bound is PER-BUCKET-RELATIVE (any key occurring >= 2 times inside one
bucket survives that boundary); the classic Manku–Motwani
O((1/eps)·log(eps·N)) bound additionally requires fixed-width
w = ceil(1/eps) sub-buckets, which a caller gets by sizing
micro-batches (or pre-splitting them) to w items.

Shape: items shard by key hash into a fixed number of state partitions
(the stream_heavy_hitters_live sharding lemma: every occurrence of a key
lands in ONE shard, so per-shard guarantees are global guarantees). Each
shard runs classic lossy counting with the micro-batch as the bucket:

- absorb the batch's per-key counts: existing entry -> c += batch_c;
  new entry -> c = batch_c, delta = bucket - 1 (the maximum count it
  could have accrued in the buckets before it was first tracked),
- bucket advance: evict every entry with c + delta <= bucket.

Guarantees (the pytest pins all three on a replayed basket stream):
- NO FALSE DISMISSALS above the bucket count: an evicted entry's true
  count is <= the bucket index at eviction <= B (total buckets), so any
  key with true count > B is present in the final state.
- BOUNDED UNDERCOUNT: for every surviving entry,
  c <= true count <= c + delta (delta <= B).
- BOUNDED STATE: entries with c + delta <= bucket are removed every
  bucket — state tracks the heavy tail, not the ever-seen key set.

The registered stream_market_basket_live keeps EXACT update-mode counts
(its oracle is exact); this module is the production state-bounding
handoff its Scale: note points at, for streams whose observed-pair space
outgrows the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SHARDS = 8


def _lossy_shard_fn(key, pdfs, state):
    """Per-shard lossy counter. State = parallel arrays (SORTED keys,
    counts, deltas) + the shard's bucket index; one micro-batch = one
    bucket. Emits the CURRENT surviving entries every trigger as
    (shard, k, c, d, bucket) — the final answer per key is its row at
    the maximum bucket (later emissions supersede earlier ones).

    VECTORIZED (round-10 machinery diet — this replaced a whole-state
    Python dict rebuild + a per-key pandas groupby().items() loop per
    trigger): the batch's per-key totals are one stable argsort +
    np.add.reduceat; the absorb is a searchsorted merge against the
    sorted state keys; eviction is one boolean mask. Zero per-key
    Python; the Manku–Motwani semantics are untouched
    (tests/test_round9_props.py fuzzes this fold against the textbook
    dict reference)."""
    import numpy as np
    import pandas as pd

    if state.exists:
        ks_l, cs_l, ds_l, bucket = state.get
        ks = np.asarray(ks_l, dtype="object")
        cs = np.asarray(cs_l, dtype="int64")
        ds = np.asarray(ds_l, dtype="int64")
    else:
        ks = np.empty(0, dtype="object")
        cs = np.empty(0, dtype="int64")
        ds = np.empty(0, dtype="int64")
        bucket = 0
    bucket += 1
    chunks = list(pdfs)
    if chunks:
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        raw_k = pdf["k"].to_numpy()
        raw_c = pdf["c"].to_numpy("int64")
    else:
        raw_k = np.empty(0, dtype="object")
        raw_c = np.empty(0, dtype="int64")
    if raw_k.size:
        order = np.argsort(raw_k, kind="stable")
        sk = raw_k.take(order)
        sc = raw_c.take(order)
        firsts = np.concatenate([[True], sk[1:] != sk[:-1]])
        bk = sk[firsts]
        bc = np.add.reduceat(sc, np.flatnonzero(firsts))
    else:
        bk = np.empty(0, dtype="object")
        bc = np.empty(0, dtype="int64")
    # absorb: existing entry -> c += batch_c; new entry -> c = batch_c,
    # delta = bucket - 1 (max count it could have accrued untracked)
    idx = np.searchsorted(ks, bk)
    if len(ks):
        found = ks[np.minimum(idx, len(ks) - 1)] == bk
    else:
        found = np.zeros(len(bk), dtype=bool)
    cs = cs.copy()
    cs[idx[found]] += bc[found]
    mk = np.concatenate([ks, bk[~found]])
    mc = np.concatenate([cs, bc[~found]])
    md = np.concatenate([ds, np.full(int((~found).sum()), bucket - 1, dtype="int64")])
    order2 = np.argsort(mk, kind="stable")
    mk = mk.take(order2)
    mc = mc.take(order2)
    md = md.take(order2)
    # bucket-boundary eviction: the Manku–Motwani sub-floor drop
    keep = (mc + md) > bucket
    mk, mc, md = mk[keep], mc[keep], md[keep]
    state.update((mk.tolist(), mc.tolist(), md.tolist(), bucket))
    # one k=NULL marker row per invocation carries the bucket index even
    # when eviction clears the ENTIRE state: without it a shard whose
    # final bucket empties leaves no bucket-b emission, and a downstream
    # max-bucket pick would resurrect the PREVIOUS bucket's survivors
    n_out = len(mk) + 1
    yield pd.DataFrame(
        {
            "shard": np.full(n_out, int(key[0]), dtype="int64"),
            "k": pd.Series(
                np.concatenate([np.array([None], dtype="object"), mk]), dtype="object"
            ),
            "c": np.concatenate([np.zeros(1, dtype="int64"), mc]),
            "d": np.concatenate([np.zeros(1, dtype="int64"), md]),
            "bucket": np.full(n_out, bucket, dtype="int64"),
        }
    )


def lossy_count(src: DataFrame, key_col: str = "k", shard=None) -> DataFrame:
    """Attach the sharded lossy counter to a streaming DataFrame with a
    string key column ``key_col``. Returns the update-mode emission
    stream (shard, k, c, d, bucket); the caller drains it and keeps
    each key's max-bucket row.

    ``shard`` overrides the default xxhash64 shard assignment with any
    key-deterministic long Column (every occurrence of a key must land
    in ONE shard — the sharding lemma). The oracle-gated caller passes
    an md5-derived shard both engines can compute; production keeps the
    cheaper xxhash64 default.

    Scale: state per shard is bounded by the eviction floor — every
    bucket boundary drops entries whose count + delta cannot exceed the
    bucket index, so state tracks the heavy tail relative to bucket
    size, never the ever-seen key set (with micro-batch buckets the
    bound is per-bucket-relative: a key occurring twice in one bucket
    survives it; the classic O((1/eps)·log(eps·N)) form needs
    fixed-width w = ceil(1/eps) sub-buckets). Shard count tracks
    executor count (more shards, same per-shard lemma)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = src.select(
        (
            shard if shard is not None
            else F.pmod(F.xxhash64(key_col), F.lit(N_SHARDS))
        ).alias("shard"),
        F.col(key_col).alias("k"),
        F.lit(1).cast("long").alias("c"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _lossy_shard_fn,
        outputStructType="shard long, k string, c long, d long, bucket long",
        stateStructType="ks array<string>, cs array<long>, ds array<long>, bucket long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
