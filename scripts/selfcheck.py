"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() in DuckDB —
row count + column names + order-insensitive value hash."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from dxf_postgis_converter_spark.session import get_spark

SF_DIR = os.environ.get("SELFCHECK_SF_DIR", "/root/testdata/sf0.01")


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.6f}"
            elif isinstance(v, bool):
                v = str(v).lower()
            vals.append(str(v))
        lines.append("|".join(vals))
    lines.sort()
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main(only=None):
    spark = get_spark(master="local[16]", shuffle_partitions=32)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"{name:32s} SPARK-ERROR {e}")
            continue
        if name not in oracles:
            print(f"{name:32s} rows={len(rows):7d} (rows-only, no oracle) {time.time()-t0:5.1f}s")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"{name:32s} ORACLE-ERROR {e}")
            continue
        ok_cols = sorted(cols) == sorted(ocols)
        ok_count = len(rows) == len(orows)
        h1 = value_hash(rows, cols)
        h2 = value_hash(orows, ocols)
        ok_hash = h1 == h2
        status = "OK" if (ok_cols and ok_count and ok_hash) else "MISMATCH"
        print(f"{name:32s} {status} rows={len(rows)}/{len(orows)} cols={'=' if ok_cols else cols} "
              f"hash={'=' if ok_hash else h1[:8]+'!='+h2[:8]} {time.time()-t0:5.1f}s")
        if status != "OK":
            failures.append((name, f"cols {cols} vs {ocols}" if not ok_cols else "hash/count"))
            if not ok_hash and ok_cols and ok_count:
                # print a few differing rows for debug
                s1 = {tuple(str(x) for x in r) for r in rows}
                s2 = {tuple(str(x) for x in r) for r in orows}
                print("   spark-only:", list(s1 - s2)[:2])
                print("   oracle-only:", list(s2 - s1)[:2])
    print(f"\n{len(qs) - len(failures)}/{len(qs)} OK")
    for n, e in failures:
        print("FAIL:", n, e[:300])
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:]) or None))
