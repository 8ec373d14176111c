"""Local mirror of the driver's correctness gate.

Runs entry(spark) as a smoke check, then each queries()[name] at sf0.01
against oracle_sql()[name] via DuckDB: row count + schema + order-
insensitive value hash.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CK_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf) -> str:
    """Order-insensitive: sort columns by name, round-trip through stable
    string formatting, hash the sorted multiset of row strings."""
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for tup in pdf.itertuples(index=False):
        parts = []
        for v in tup:
            if isinstance(v, float):
                parts.append(f"{v:.9g}")
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def main() -> int:
    import __spark_entry__ as entrymod
    from ck_spark.session import get_spark

    spark = get_spark("check-contract", cores=8)

    t0 = time.time()
    smoke = entrymod.entry(spark)
    n = smoke.count()
    print(f"entry(): {n} rows in {time.time() - t0:.1f}s schema={smoke.schema.simpleString()}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if len(sys.argv) > 1:  # optional name filter: check only these queries
        qs = {n: f for n, f in qs.items() if n in sys.argv[1:]}
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(got)} ({time.time()-t0:.1f}s)")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = value_hash(got) == value_hash(exp) if ok_rows and ok_cols else False
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status} {name}: rows {len(got)}/{len(exp)} cols={ok_cols} "
            f"hash={ok_hash} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL" and ok_cols:
            merged = got.merge(exp, on=sorted(
                [c for c in got.columns if got[c].dtype == object or "id" in c]
            ) or list(got.columns), how="outer", indicator=True, suffixes=("_got", "_exp"))
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(10).to_string())
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
