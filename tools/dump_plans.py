"""Dump .explain('formatted') for a list of registered queries into
plans/<tag>/<qkey>_<suffix>.txt — the r16 optimization-round evidence
trail (judge checks plan claims against these files).

Usage: python tools/dump_plans.py <out_dir> <suffix> [sf_dir] qkey...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.01"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from flod_spark.session import get_spark

    spark = get_spark("plan-dump")
    qs = entry.queries()
    for k in rest:
        try:
            df = qs[k](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR building {k}: {type(ex).__name__}: {ex}"
        with open(os.path.join(out_dir, f"{k}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(k, "->", f"{k}_{suffix}.txt", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
