"""Stand-alone driver-style oracle comparison: run a registry query on Spark
and its DuckDB oracle side-by-side, compare row count, schema (column names),
and sorted-value hash. Used ad hoc (`python tests/driver_compare.py q1 q2 ...`
or `--all`) to pre-flight what the driver's CORRECTNESS gate will see.
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _norm(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    # DuckDB's fetch_df renders DATE as a midnight datetime64 while Spark
    # collects DateType as datetime.date — same value, different str().
    # The driver compares via Arrow where both sides are date32, so
    # canonicalize midnight datetimes to their date here too.
    if isinstance(v, datetime.datetime) and (
        v.time() == datetime.time(0) and v.tzinfo is None
    ):
        return str(v.date())
    # int-typed floats (DuckDB HUGEINT→float64) intentionally stay distinct
    # from ints: that dtype drift IS what the driver's value hash catches.
    return str(v)


def compare(spark, sf_dir: str, name: str, fn, oracle: str | None):
    sdf = fn(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sorted(sdf.columns)
    s_vals = sorted(
        tuple(_norm(r[c]) for c in spark_cols) for r in spark_rows
    )
    if oracle is None:
        return {"name": name, "rows": len(spark_rows), "status": "rows_only"}
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    odf = con.execute(oracle).fetch_df()
    o_cols = sorted(odf.columns)
    o_vals = sorted(
        tuple(_norm(v) for v in (row[c] for c in o_cols))
        for row in odf.to_dict("records")
    )
    ok_rows = len(spark_rows) == len(odf)
    ok_schema = spark_cols == o_cols
    ok_vals = s_vals == o_vals
    status = "PASS" if (ok_rows and ok_schema and ok_vals) else "FAIL"
    out = {
        "name": name,
        "rows": len(spark_rows),
        "oracle_rows": len(odf),
        "schema": (spark_cols, o_cols) if not ok_schema else "ok",
        "status": status,
    }
    if not ok_vals and ok_schema and ok_rows:
        diffs = [(a, b) for a, b in zip(s_vals, o_vals) if a != b][:3]
        out["first_diffs"] = diffs
    return out


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from topk_spark.session import get_spark
    from topk_spark.workload import load_all

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    reg = load_all()
    args = sys.argv[1:]
    names = list(reg) if args == ["--all"] else args
    spark = get_spark("driver_compare")
    failures = 0
    for name in names:
        q = reg[name]
        try:
            res = compare(spark, sf_dir, name, q.fn, q.oracle)
        except Exception as e:  # noqa: BLE001
            res = {"name": name, "status": "ERROR", "err": repr(e)[:300]}
        if res["status"] not in ("PASS", "rows_only"):
            failures += 1
        print(res, flush=True)
    print(f"failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
