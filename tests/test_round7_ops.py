"""Tests for the round-7 additions: the ADVICE r6 rounding/packing
regressions, and the operators registered this round."""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F  # noqa: F401  (used by later test classes)


class TestUdfGroupedAggRounding:
    def test_half_cent_rounds_away_from_zero_like_decimal_cast(self, spark, tmp_path):
        """ADVICE r6 regression: pandas .round() is half-to-even, so a
        quantity of 0.125 became 12 cents while the oracle's
        CAST(.. AS DECIMAL(18,2)) makes 13 in DuckDB. The fixed
        floor(q*100+0.5) must match the DECIMAL semantics on exact .5
        cent boundaries — checked against DuckDB running the actual
        registered oracle on the same parquet."""
        import duckdb

        from flod_spark.catalog.udf import udf_grouped_agg
        from flod_spark.registry import ORACLES

        d = str(tmp_path / "sfhalf")
        os.makedirs(d, exist_ok=True)
        # 0.125 and 0.135 both sit exactly on .5 cents; 3.0 is a control
        pd.DataFrame(
            {
                "l_returnflag": ["A", "A", "B"],
                "l_quantity": [0.125, 0.135, 3.0],
            }
        ).to_parquet(f"{d}/lineitem.parquet")
        got = {
            r["l_returnflag"]: (r["n_items"], r["avg_qty"])
            for r in udf_grouped_agg(spark, d).collect()
        }
        con = duckdb.connect()
        con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{d}/lineitem.parquet'")
        want = {
            r[0]: (r[1], r[2])
            for r in con.sql(ORACLES["udf_grouped_agg"]).fetchall()
        }
        assert got == want
        # and the A group really took the away-from-zero branch:
        # (13 + 14) cents / 2 rows, not half-to-even's (12 + 14) / 2
        assert got["A"] == (2, (27 / 100.0) / 2)
