"""Capture the physical plan of the intermediate DataFrame(s) that
_pca_matvec COLLECTS during one real matvec round — evidence for the
r16 plan-shape claim (posexplode+groupBy exchange -> single map-side
aggregate) on queries whose registered final frame is a materialized
ExistingRDD scan (plans/r16 discipline).

Runs the tree's UNMODIFIED code: DataFrame.collect is wrapped to dump
the formatted plan of every frame collected inside the call.

Usage: python tools/dump_matvec_plan.py <out_file> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_file = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    # Spark 4: pyspark.sql.DataFrame is the abstract base; instances are
    # the classic subclass, whose collect() must be the patch target
    from pyspark.sql.classic.dataframe import DataFrame

    from flod_spark.catalog.similarity import _PCA_V0, DIM, _as_double, _pca_matvec
    from flod_spark.io import load
    from flod_spark.session import get_spark

    spark = get_spark("matvec-plan")
    e = load(spark, sf_dir, "embeddings").select(_as_double("embedding").alias("x"))

    plans: list[str] = []
    orig = DataFrame.collect

    def capturing(self):  # noqa: ANN001
        plans.append(
            self._jdf.queryExecution().explainString(
                self.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        return orig(self)

    DataFrame.collect = capturing
    try:
        _pca_matvec(e, [_PCA_V0] * DIM)
    finally:
        DataFrame.collect = orig

    with open(out_file, "w") as f:
        f.write(
            "\n\n".join(
                f"-- collected frame {i} inside _pca_matvec --\n{p}"
                for i, p in enumerate(plans)
            )
        )
    print(f"{len(plans)} plan(s) -> {out_file}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
