"""Driver-style correctness self-check: run every `queries()` entry in Spark
and its `oracle_sql()` twin in DuckDB at the given sf dir, then compare
row count, column names, and (order-insensitively) values.

The driver's hash compare is PANDAS-DTYPE-SENSITIVE (DuckDB HUGEINT arrives
as float64 and hashes differently from Spark's int64 even when the values
are numerically equal — VERDICT r1 "What's wrong" #2), so this check
additionally fetches both sides as pandas frames and flags dtype drift.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from corpusama_spark.session import get_spark  # noqa: E402

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [c for _, c in sorted(zip(cols, cols))], out


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
            drows = [tuple(r) for r in ddf.itertuples(index=False)]
            dcols = list(ddf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        sp = sdf.toPandas()
        sdt = {c: str(sp[c].dtype) for c in sp.columns}
        ddt = {c: str(ddf[c].dtype) for c in ddf.columns}
        dtype_drift = {
            c: (sdt[c], ddt[c]) for c in sdt if c in ddt and sdt[c] != ddt[c]
        }
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            failures += 1
            continue
        _, sn = norm_rows(scols, [tuple(r) for r in srows])
        _, dn = norm_rows(dcols, drows)
        n_exact = n_close = n_diff = 0
        example = None
        for a, b in zip(sn, dn):
            if a == b:
                n_exact += 1
            elif len(a) == len(b) and all(close(x, y) for x, y in zip(a, b)):
                n_close += 1
                if example is None:
                    example = (a, b)
            else:
                n_diff += 1
                if example is None:
                    example = (a, b)
        if n_diff:
            print(f"FAIL {name}: {n_diff} mismatched rows of {len(sn)}")
            print(f"     spark={example[0]}\n     duck ={example[1]}")
            failures += 1
        elif n_close:
            print(f"WARN {name}: {n_close} rows float-close but not exact")
            print(f"     spark={example[0]}\n     duck ={example[1]}")
        elif dtype_drift:
            print(f"FAIL {name}: values exact but pandas dtypes drift: {dtype_drift}")
            failures += 1
        else:
            print(f"ok   {name}: {len(sn)} rows exact, dtypes aligned")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
