"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() in DuckDB —
row count + column names + order-insensitive value hash.

Round-2 hardening: both sides are canonicalized through pandas (Spark
.toPandas(), DuckDB .df()) with dtype-sensitive rendering. This is the
lossy path the driver evidently uses — r1 proved it: DuckDB HUGEINT
aggregates come back as float64 ("6.0") while Spark bigint renders "6",
and the driver flagged exactly those queries while the old fetchall()-
based selfcheck (which got plain ints from HUGEINT) said OK. Any dtype
drift between engines now fails locally too.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from dxf_postgis_converter_spark.session import get_spark

SF_DIR = os.environ.get("SELFCHECK_SF_DIR", "/root/testdata/sf0.01")


def _canon(v) -> str:
    """Dtype-sensitive canonical rendering of one cell (post-pandas)."""
    if v is None:
        return "None"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "None"
        return f"{float(v):.6f}"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    lines = []
    for row in pdf[cols].itertuples(index=False, name=None):
        lines.append("|".join(_canon(v) for v in row))
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
            spdf = df.toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"{name:32s} SPARK-ERROR {e}")
            continue
        if name not in oracles:
            print(f"{name:32s} rows={len(spdf):7d} (rows-only, no oracle) {time.time()-t0:5.1f}s")
            failures.append((name, "NO ORACLE (driver will record err=no_oracle)"))
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"{name:32s} ORACLE-ERROR {e}")
            continue
        ok_cols = sorted(spdf.columns) == sorted(odf.columns)
        ok_count = len(spdf) == len(odf)
        h1 = value_hash(spdf)
        h2 = value_hash(odf)
        ok_hash = h1 == h2
        status = "OK" if (ok_cols and ok_count and ok_hash) else "MISMATCH"
        print(f"{name:32s} {status} rows={len(spdf)}/{len(odf)} "
              f"cols={'=' if ok_cols else list(spdf.columns)} "
              f"hash={'=' if ok_hash else h1[:8]+'!='+h2[:8]} {time.time()-t0:5.1f}s")
        if status != "OK":
            failures.append((name, f"cols {list(spdf.columns)} vs {list(odf.columns)}"
                             if not ok_cols else "hash/count"))
            if not ok_hash and ok_cols and ok_count:
                cols = sorted(spdf.columns)
                s1 = {tuple(_canon(v) for v in r)
                      for r in spdf[cols].itertuples(index=False, name=None)}
                s2 = {tuple(_canon(v) for v in r)
                      for r in odf[cols].itertuples(index=False, name=None)}
                print("   spark-only:", list(s1 - s2)[:2])
                print("   oracle-only:", list(s2 - s1)[:2])
    print(f"\n{len([n for n in qs if not only or n in only]) - len(failures)}"
          f"/{len([n for n in qs if not only or n in only])} OK")
    for n, e in failures:
        print("FAIL:", n, e[:300])
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:]) or None))
