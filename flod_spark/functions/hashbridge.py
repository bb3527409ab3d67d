"""The portable salted-md5 hex-int bridge, in ONE place.

Several operators need a deterministic integer in [0, m) from a key that
both engines compute bit-identically: Count-Min counter indexes, bloom
bit positions, pack-sequence shards. The recipe is always the same —
md5 over the salted stringified key is byte-identical in Spark and
DuckDB, the first 8 hex chars parse to the same 32-bit integer
(Spark ``conv(.., 16, 10)`` == DuckDB ``CAST('0x' || .. AS BIGINT)``),
and ``% m`` finishes it. Changing the recipe here moves every consumer
AND its oracle twin together; a second copy is how engines drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_HEXW = 8  # 32 bits of the hash — plenty for m <= 2^31 consumers


def salted_mod(col, salt: str, m: int) -> F.Column:
    """Spark side: uniform deterministic value in [0, m) from
    md5(salt || str(key))."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, _HEXW), 16, 10).cast("long") % m


def salted_mod_sql(expr: str, salt: str, m: int) -> str:
    """DuckDB side of :func:`salted_mod` (same bytes hashed, same
    integer parse, same modulus)."""
    return (
        f"CAST('0x' || substr(md5('{salt}' || CAST({expr} AS VARCHAR)), 1, {_HEXW}) "
        f"AS BIGINT) % {m}"
    )


def salted_int(col, salt: str) -> F.Column:
    """Raw 32-bit salted hash (no modulus) — the MinHash-ordering form:
    MIN over a key set of this value is a permutation-min estimator,
    and both engines parse the identical integer."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, _HEXW), 16, 10).cast("long")


def salted_int_sql(expr: str, salt: str) -> str:
    """DuckDB side of :func:`salted_int`."""
    return (
        f"CAST('0x' || substr(md5('{salt}' || CAST({expr} AS VARCHAR)), 1, {_HEXW}) "
        "AS BIGINT)"
    )
