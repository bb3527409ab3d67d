"""Parameterized SimHash signatures (production width: 64 bits).

catalog/dedup.py::dedup_simhash fixes width=16 for oracle compactness;
this operator generalizes. Each token hashes once (xxhash64 — JVM-side,
no Python); bit i of the signature is the sign of the ±1 vote sum over
tokens of bit i of the token hash. Near-identical token sets flip few
votes, so signatures agree (grouping) or sit at small Hamming distance
(pair via the pigeonhole band trick: split the signature into b bands;
any pair within Hamming distance b-1 shares at least one exact band —
the same LSH bucket machinery as MinHash).

100 TB notes: tokenize+hash is map-only; the vote aggregation is one
partial-agg-friendly groupBy(doc) with `width` inline sums (no bit
explode); signatures are 8 bytes — the only thing that ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", width: int = 64
) -> DataFrame:
    """(id, simhash: long) — sign-of-vote-sum over per-token xxhash64 bits."""
    if not 1 <= width <= 64:
        raise ValueError("width must be 1..64")
    tok = df.select(
        id_col,
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0))
            )
        ).alias("_tk"),
    )
    h = tok.withColumn("_h", F.xxhash64("_tk"))
    # one aggregate, `width` inline vote sums — no bit-position explode
    votes = h.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(
                f"_v{i}"
            )
            for i in range(width)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(width):
        sig = sig + F.when(F.col(f"_v{i}") >= 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(0)
    return votes.select(id_col, sig.alias("simhash"))


def simhash_bands(sig: DataFrame, bands: int = 4, width: int = 64) -> DataFrame:
    """Explode a signature into (id, band, band_bits) for the pigeonhole
    LSH pairing: Hamming distance < bands => some band matches exactly."""
    per = width // bands
    mask = (1 << per) - 1
    return sig.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * per).bitwiseAND(F.lit(mask)).alias("band_bits"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_e"),
    ).select(*sig.columns, F.col("_e.band"), F.col("_e.band_bits"))
