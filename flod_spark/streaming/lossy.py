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
    """Per-shard lossy counter. State = parallel arrays (keys, counts,
    deltas) + the shard's bucket index; one micro-batch = one bucket.
    Emits the CURRENT surviving entries every trigger as
    (shard, k, c, d, bucket) — the final answer per key is its row at
    the maximum bucket (later emissions supersede earlier ones)."""
    import pandas as pd

    if state.exists:
        ks, cs, ds, bucket = state.get
        entries = {k: [c, d] for k, c, d in zip(ks, cs, ds)}
    else:
        entries, bucket = {}, 0
    bucket += 1
    for pdf in pdfs:
        for k, c in pdf.groupby("k")["c"].sum().items():
            e = entries.get(k)
            if e is None:
                entries[k] = [int(c), bucket - 1]
            else:
                e[0] += int(c)
    # bucket-boundary eviction: the Manku–Motwani sub-floor drop
    entries = {k: e for k, e in entries.items() if e[0] + e[1] > bucket}
    state.update((
        list(entries),
        [e[0] for e in entries.values()],
        [e[1] for e in entries.values()],
        bucket,
    ))
    # one k=NULL marker row per invocation carries the bucket index even
    # when eviction clears the ENTIRE state: without it a shard whose
    # final bucket empties leaves no bucket-b emission, and a downstream
    # max-bucket pick would resurrect the PREVIOUS bucket's survivors
    yield pd.DataFrame(
        {
            "shard": pd.Series([int(key[0])] * (len(entries) + 1), dtype="int64"),
            "k": pd.Series([None, *entries], dtype="object"),
            "c": pd.Series([0] + [e[0] for e in entries.values()], dtype="int64"),
            "d": pd.Series([0] + [e[1] for e in entries.values()], dtype="int64"),
            "bucket": pd.Series([bucket] * (len(entries) + 1), dtype="int64"),
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
