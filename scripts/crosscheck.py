"""Value-level Spark <-> DuckDB oracle cross-check.

Mimics the round driver: runs every queries() entry and its oracle_sql()
side-by-side at sf0.01 (or $CROSSCHECK_SF_DIR), compares row count, column
names, and an order-insensitive value hash (floats rounded to 6 dp).
Exits nonzero on any mismatch. Queries without an oracle get a rows-only
check (count > 0 unless whitelisted empty-ok).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CROSSCHECK_SF_DIR", "/root/testdata/sf0.01")
ONLY = set(sys.argv[1:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_rows(rows, ndigits=6):
    out = []
    for r in rows:
        out.append(
            tuple(
                round(v, ndigits) if isinstance(v, float) else v
                for v in r
            )
        )
    out.sort(key=repr)
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from ocr_dataset_builder_spark.session import get_spark

    spark = get_spark("crosscheck", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = norm_rows(
                [tuple(r[c] for c in scols) for r in sdf.collect()]
            )
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            status = "rows-only"
            ok = len(srows) > 0
            if not ok:
                failures.append((name, "rows-only check returned 0 rows"))
            print(
                f"{'OK  ' if ok else 'FAIL'} {name}: {len(srows)} rows [{status}]"
                f" ({time.time()-t0:.1f}s)"
            )
            continue
        try:
            rel = con.sql(oracles[name])
            dcols_raw = list(rel.columns)
            drows_raw = rel.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        dorder = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
        dcols = [dcols_raw[i] for i in dorder]
        drows = norm_rows([tuple(r[i] for i in dorder) for r in drows_raw])
        if scols != dcols:
            failures.append((name, f"columns differ: spark={scols} duck={dcols}"))
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount spark={len(srows)} duck={len(drows)}"))
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            continue
        bad = None
        for a, b in zip(srows, drows):
            if a != b:
                bad = (a, b)
                break
        if bad:
            failures.append((name, f"value mismatch: {bad[0]!r} vs {bad[1]!r}"))
            print(f"FAIL {name}: first mismatch:\n  spark={bad[0]!r}\n  duck ={bad[1]!r}")
        else:
            print(f"OK   {name}: {len(srows)} rows, cols={dcols} ({time.time()-t0:.1f}s)")

    print(f"\n{len(queries) - len(failures)}/{len(queries)} queries OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
