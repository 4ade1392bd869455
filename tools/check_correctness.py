"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row count, column names, and an order-insensitive value hash.

``--json PATH`` additionally writes the results in the driver's
CORRECTNESS_r{N}.json record shape — the committed
CORRECTNESS_LOCAL.json covers the FULL queries() surface every round
(the driver's board pins a 50-name subset)."""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, cols):
    cols_sorted = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in cols_sorted) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(only: list[str] | None = None, json_path: str | None = None):
    import __spark_entry__ as entrymod
    from rse_spark.session import get_spark

    results: dict[str, dict] = {}
    spark = get_spark("correctness", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark: {e}",
            }
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (no oracle, rows-only)")
            results[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(srows),
                "oracle_rows": None, "err": "no_oracle",
            }
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None, "err": f"duckdb: {e}",
            }
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(c.lower() for c in scols) == sorted(ocols)
        sh = value_hash(srows, [c.lower() for c in scols])
        oh = value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        results[name] = {
            "rows_match": ok_rows, "schema_match": ok_cols,
            "hash_match": ok_hash, "spark_rows": len(srows),
            "oracle_rows": len(orows), "err": None,
        }
        print(
            f"{status} {name}: rows {len(srows)}/{len(orows)}"
            f" cols={'ok' if ok_cols else f'{scols} vs {ocols}'}"
            f" hash={'ok' if ok_hash else 'MISMATCH'}"
            f" ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_rows and ok_cols:
                # show a few differing lines for debugging
                sset = {
                    "|".join(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i].lower()))
                    for r in srows
                }
                oset = {
                    "|".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                }
                print("  spark-only:", list(sset - oset)[:3])
                print("  oracle-only:", list(oset - sset)[:3])
    print(f"\n{len(failures)} failures: {failures}")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_path} ({len(results)} queries)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    jp = None
    if "--json" in argv:
        i = argv.index("--json")
        jp = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv or None, json_path=jp))
