"""Deterministically scale a testdata SF dir by an integer factor — the
round-17 scale-probe input generator (r16 verdict item 2: "everything at
sf0.1 is floor-bound; optimize against evidence").

Each table is replicated K times; every replica adds ``replica_index *
base`` to each id/key column, where ``base`` is constant per KEY FAMILY
(computed once as max-over-family + 1 from the source data), so
foreign-key joins land entirely within a replica and every join/group
cardinality scales exactly linearly. Dimension tables (nation, region)
copy as-is. No randomness, no timestamps changed: a K-scaled dir is the
same workload at K times the entities, which is the axis the probe
measures (does the operator parallelize with data, or is it floor-bound).

This is measurement tooling only — bench.py and the driver contract are
untouched; the scaled dir is consumed by pointing $SPARK_GRAFT_SF_DIR
(or a tools/qtime.py positional arg) at the output.

Usage: python tools/make_scaled_sf.py <src_sf_dir> <out_dir> <K>
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key family -> (table, column) members; one offset base per family so
# FK pairs (e.g. o_orderkey / l_orderkey) shift in lockstep
FAMILIES: dict[str, list[tuple[str, str]]] = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
    "user_id": [("events", "user_id")],
    "event_id": [("events", "event_id")],
}
DIM_TABLES = ("nation", "region")


def main() -> int:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)

    tables = {}
    for name in os.listdir(src):
        if name.endswith(".parquet"):
            tables[name[: -len(".parquet")]] = pq.read_table(
                os.path.join(src, name)
            )

    base: dict[str, int] = {}
    for fam, members in FAMILIES.items():
        mx = 0
        for tbl, col in members:
            if tbl in tables and col in tables[tbl].column_names:
                mx = max(mx, pc.max(tables[tbl][col]).as_py() or 0)
        base[fam] = int(mx) + 1

    offset_cols = {
        (tbl, col): base[fam]
        for fam, members in FAMILIES.items()
        for tbl, col in members
    }

    for tbl, t in tables.items():
        dst = os.path.join(out, tbl + ".parquet")
        if tbl in DIM_TABLES:
            pq.write_table(t, dst)
            print(f"{tbl}: dim copied ({t.num_rows} rows)", flush=True)
            continue
        reps = []
        for i in range(k):
            r = t
            for ci, col in enumerate(t.column_names):
                b = offset_cols.get((tbl, col))
                if b and i:
                    shifted = pc.add(
                        r[col], pa.scalar(i * b, type=r[col].type)
                    )
                    r = r.set_column(ci, col, shifted)
            reps.append(r)
        scaled = pa.concat_tables(reps)
        pq.write_table(scaled, dst)
        print(
            f"{tbl}: {t.num_rows} -> {scaled.num_rows} rows", flush=True
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
