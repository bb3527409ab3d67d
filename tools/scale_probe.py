"""Scale probe (r16 verdict item 2) — time the heaviest keys against a
scaled input dir (tools/make_scaled_sf.py) at two core counts and record
wall seconds AND shuffle bytes per key, so round-over-round priorities
rest on evidence instead of sf0.1 floor noise.

Measurement tooling only: bench.py and the driver contract are
untouched. The probe opens its own session with the UI REST endpoint
enabled (the only public channel to per-stage shuffle metrics in local
mode) and snapshots cumulative stage shuffle read/write around each
key's timed region (bench.py's exact region: query build + noop-sink
write).

Usage: SPARK_GRAFT_CPUS=N python tools/scale_probe.py [--runs N] <sf_dir> qkey...
Prints one JSON line per key and a trailing summary JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_totals(ui: str, app: str) -> tuple[int, int]:
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        data = json.load(r)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in data),
        sum(s.get("shuffleReadBytes", 0) for s in data),
    )


def main() -> int:
    argv = sys.argv[1:]
    runs = 1
    if argv and argv[0] == "--runs":
        runs = int(argv[1])
        argv = argv[2:]
    sf_dir, keys = argv[0], argv[1:]

    import __spark_entry__ as entry
    from flod_spark.session import get_spark

    spark = get_spark(
        "flod-scale-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    ui, app = sc.uiWebUrl, sc.applicationId
    qs = entry.queries()

    # same warmup as bench.py (JIT the scan/agg/noop paths)
    warm = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    warm.groupBy("l_returnflag").agg({"l_quantity": "count"}).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(1000).selectExpr("sum(id)").collect()

    out = []
    for name in keys:
        times, sw, sr = [], 0, 0
        for i in range(runs):
            sc.setJobDescription(f"scale-probe:{name}")
            w0, r0 = _stage_totals(ui, app)
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            w1, r1 = _stage_totals(ui, app)
            if i == 0:
                sw, sr = w1 - w0, r1 - r0
            sc.setJobDescription(None)
        rec = {
            "key": name,
            "sec": round(min(times), 3),
            "runs": [round(t, 3) for t in times],
            "shuffle_write_bytes": sw,
            "shuffle_read_bytes": sr,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"probe": out}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
