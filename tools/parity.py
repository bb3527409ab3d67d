"""Local replica of the driver's correctness gate: run every queries()[k]
on Spark and oracle_sql()[k] on DuckDB over the same parquet, compare
row count + schema + order-insensitive values (exact for ints/strings,
bitwise for doubles — the engine is designed for bit-identical output).

Usage: python tools/parity.py [sf_dir] [qkey ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all columns."""
    df = df[sorted(df.columns)]
    # normalize temporal types for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        errs.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
        return errs
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        # Dtype-CLASS mismatch: the driver's value hash renders int 891 and
        # float 891.0 differently, so a null-free int-vs-float pair is a
        # real failure (the DuckDB HUGEINT-rendering artifact class) even
        # when every value is numerically identical. A float side that
        # contains NaN is the ordinary null-upcast — the value comparison
        # below adjudicates that case.
        ik = ("i", "u")
        if (sv.dtype.kind in ik and ov.dtype.kind == "f" and not ov.isna().any()) or (
            ov.dtype.kind in ik and sv.dtype.kind == "f" and not sv.isna().any()
        ):
            errs.append(
                f"col {c}: dtype-class mismatch spark={sv.dtype} oracle={ov.dtype} "
                "(driver hash diverges even if values agree — add a CAST)"
            )
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sa, oa = sv.astype(float).to_numpy(), ov.astype(float).to_numpy()
            both_nan = pd.isna(sa) & pd.isna(oa)
            exact = (sa == oa) | both_nan
            if not exact.all():
                bad = (~exact).nonzero()[0][:3]
                close = all(
                    math.isclose(sa[i], oa[i], rel_tol=1e-9, abs_tol=1e-12) for i in bad
                )
                errs.append(
                    f"col {c}: {int((~exact).sum())}/{len(sa)} differ "
                    f"(first: spark={sa[bad[0]]!r} oracle={oa[bad[0]]!r} "
                    f"{'~close' if close else 'FAR'})"
                )
        else:
            eq = (sv.astype(object).where(~pd.isna(sv), None) == ov.astype(object).where(~pd.isna(ov), None)) | (
                pd.isna(sv) & pd.isna(ov)
            )
            if not eq.all():
                i = (~eq).to_numpy().nonzero()[0][0]
                errs.append(
                    f"col {c} ({sv.dtype} vs {ov.dtype}): {int((~eq).sum())}/{len(sv)} differ "
                    f"(first: spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r})"
                )
    return errs


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if a != "--non-gated"]
    non_gated = "--non-gated" in argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    if non_gated:
        # the complement sweep: every registered query OUTSIDE the
        # driver's 50-entry gate window (the per-round staleness SLA in
        # COVERAGE.md's header — the driver re-proves the window, this
        # sweep re-proves the rest)
        only = set(list(e.queries())[50:])
    if os.environ.get("PARITY_BARE"):
        # exact driver replica: a vanilla session, none of our confs
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from flod_spark.session import get_spark

        spark = get_spark("parity", cpus=8, shuffle_partitions=8)
    qs, os_ = e.queries(), e.oracle_sql()
    con = duck_connect(sf_dir)

    n_pass = n_fail = n_noracle = 0
    results: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:300]}")
            results[name] = {"status": "fail", "err": f"SPARK {type(ex).__name__}: {str(ex)[:300]}"}
            n_fail += 1
            continue
        if name not in os_:
            print(f"  ok {name}: no oracle (rows={len(sdf)}) [{time.time()-t0:.1f}s]")
            results[name] = {"status": "no-oracle", "rows": len(sdf), "sec": round(time.time() - t0, 1)}
            n_noracle += 1
            continue
        try:
            odf = con.sql(os_[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: ORACLE ERROR {type(ex).__name__}: {str(ex)[:300]}")
            results[name] = {"status": "fail", "err": f"ORACLE {type(ex).__name__}: {str(ex)[:300]}"}
            n_fail += 1
            continue
        errs = compare(name, sdf, odf)
        if errs:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for e_ in errs:
                print(f"     {e_}")
            results[name] = {"status": "fail", "err": "; ".join(errs)[:500]}
            n_fail += 1
        else:
            print(f"PASS {name} (rows={len(sdf)}) [{time.time()-t0:.1f}s]")
            results[name] = {"status": "pass", "rows": len(sdf), "sec": round(time.time() - t0, 1)}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    if json_out:
        # the committed complement-sweep artifact (SWEEP_r*.json — r13
        # verdict item 2): per-key results so window ∪ sweep = the full
        # registry is auditable, not attested
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "non_gated": non_gated,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_noracle": n_noracle,
                    "results": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
            f.write("\n")
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
