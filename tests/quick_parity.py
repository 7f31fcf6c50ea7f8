"""Dev helper: run a subset of registered queries against their DuckDB
oracles at a given SF without the full pytest session.

    python tests/quick_parity.py sf0.01 name1 name2 ...
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from topk_spark.io.sources import TABLES
from topk_spark.session import get_spark
from topk_spark.workload import load_all


def _normalize(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return f"{val:.10g}"
    return str(val)


def _row_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_normalize(r[i]) for i in order) for r in rows)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    sf_dir = f"/root/testdata/{sf}"
    names = sys.argv[2:]
    registry = load_all()
    if not names:
        names = list(registry)
    spark = get_spark("quick_parity", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name in names:
        q = registry[name]
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if q.oracle is None:
                print(f"{name}: rows-only, {len(srows)} rows")
                continue
            orel = con.execute(q.oracle)
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
            ok_cols = sorted(scols) == sorted(ocols)
            ok_rows = len(srows) == len(orows)
            ok_vals = _row_set(scols, srows) == _row_set(ocols, orows)
            status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
            if status == "FAIL":
                failures += 1
                print(f"{name}: {status} cols={ok_cols} rows={ok_rows} "
                      f"({len(srows)} vs {len(orows)}) vals={ok_vals}")
                if not ok_cols:
                    print(f"  spark cols: {sorted(scols)}")
                    print(f"  duck  cols: {sorted(ocols)}")
                if ok_cols and not ok_vals:
                    ss = _row_set(scols, srows)
                    oo = _row_set(ocols, orows)
                    sdiff = [r for r in ss if r not in set(map(tuple, oo))][:3]
                    odiff = [r for r in oo if r not in set(map(tuple, ss))][:3]
                    print(f"  spark-only: {sdiff}")
                    print(f"  duck-only:  {odiff}")
            else:
                print(f"{name}: OK ({len(srows)} rows)")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
