"""Packed per-key state folded at SHARD granularity (r17, guide §4).

The per-key applyInPandasWithState gates paid one Python fn invocation
+ one state round trip PER KEY per trigger (~1.5k keys at gate scale) —
the Python-call machinery, not the arithmetic, was the cost. These
helpers let a gate group by pmod(xxhash64(key), n_shards) instead and
keep EVERY key's state packed inside its shard's state row: sorted
int64 key ids plus aligned int64 value blobs (raw .tobytes()
serialization — the novelty-blob discipline), with the fold vectorized
ACROSS keys. Results are shard-count independent: a key's fold never
crosses shards, and the per-key arithmetic is preserved op for op.

Layout conventions:
- every field is int64; a field of width w > 1 is a left-aligned
  zero-padded (n_keys, w) history matrix with a separate count field;
- `_merge_packed` keeps the key array sorted so `_lookup` stays a
  searchsorted.
"""

from __future__ import annotations


def _packed_get(state, widths):
    """Unpack a shard's state blobs into int64 arrays; width > 1
    reshapes that field to (n_keys, width)."""
    import numpy as np

    if not state.exists:
        return [
            np.empty((0, w) if w > 1 else 0, dtype="int64") for w in widths
        ]
    out = []
    for blob, w in zip(state.get, widths):
        a = (
            np.frombuffer(blob, dtype="int64")
            if blob
            else np.empty(0, dtype="int64")
        )
        out.append(a.reshape(-1, w) if w > 1 else a)
    return out


def _segments(uid):
    """Per-key segments of a (key, ...)-sorted batch: (starts mask,
    seg id per row, unique keys, within-seg row index, seg lengths)."""
    import numpy as np

    n = len(uid)
    starts = np.empty(n, dtype=bool)
    if n:
        starts[0] = True
        starts[1:] = uid[1:] != uid[:-1]
    seg = np.cumsum(starts) - 1
    first = np.flatnonzero(starts)
    lens = np.diff(np.append(first, n))
    inner = np.arange(n) - (first[seg] if n else np.empty(0, dtype="int64"))
    return starts, seg, uid[starts], inner, lens


def _lookup(su, uu):
    """found mask + position into sorted state keys for each batch key
    (position valid only where found)."""
    import numpy as np

    if not len(su):
        return np.zeros(len(uu), dtype=bool), np.zeros(len(uu), dtype="int64")
    pos = np.minimum(np.searchsorted(su, uu), len(su) - 1)
    return su[pos] == uu, pos


def _gather(a, pos, found, default=0):
    """Carried per-key values for the batch's keys: a[pos] where found,
    ``default`` (scalar, or zero rows for 2-D) otherwise."""
    import numpy as np

    if a.ndim == 2:
        if not len(a):
            return np.zeros((len(pos), a.shape[1]), dtype="int64")
        return np.where(found[:, None], a[pos], 0)
    if not len(a):
        return np.full(len(pos), default, dtype="int64")
    return np.where(found, a[pos], default)


def _ragged_pos(offs, lens):
    """Concatenated positions offs[k] + (0..lens[k]-1), row-major."""
    import numpy as np

    tot = int(lens.sum())
    if not tot:
        return np.empty(0, dtype="int64")
    first = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return np.repeat(offs, lens) + (np.arange(tot) - np.repeat(first, lens))


def _hist_vals(rows, cnt):
    """First cnt[k] values of each left-aligned history row,
    concatenated row-major — the ragged view of the packed matrix."""
    import numpy as np

    return rows[np.arange(rows.shape[1]) < cnt[:, None]]


def _take_last(cat, offs, blk, width):
    """Last min(blk, width) values of each key's block in ``cat`` as a
    left-aligned zero-padded (n, width) matrix + per-key counts —
    the next trigger's carried history."""
    import numpy as np

    cnt = np.minimum(blk, width)
    vals = cat[_ragged_pos(offs + blk - cnt, cnt)]
    rows = np.zeros((len(blk), width), dtype="int64")
    tot = int(cnt.sum())
    first = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    rows[
        np.repeat(np.arange(len(blk)), cnt),
        np.arange(tot) - np.repeat(first, cnt),
    ] = vals
    return rows, cnt


def _merge_packed(su, olds, uu, found, pos, news):
    """Fold the batch keys' new values back into the packed state:
    found keys update in place, unseen keys merge key-sorted (the
    _ttl_claim_fold merge discipline). Returns [keys, *fields]."""
    import numpy as np

    upds = []
    for old, new in zip(olds, news):
        cur = old.copy()
        cur[pos[found]] = new[found]
        upds.append(np.concatenate([cur, new[~found]]))
    mu = np.concatenate([su, uu[~found]])
    order = np.argsort(mu, kind="stable")
    return [mu.take(order)] + [u.take(order, axis=0) for u in upds]
