"""Local replica of the driver's DuckDB-oracle correctness gate.

For every query in the workload registry: run the Spark plan and the
oracle SQL at the given sf, compare row count, column-name set, and an
order-insensitive value hash.  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    """Type-faithful cell rendering.

    The driver's comparator hashes the *typed* value, not ``str(value)``:
    in round 1 it failed three queries where DuckDB ``SUM(<integer>)``
    returned HUGEINT (int128) while Spark returned BIGINT, even though
    the numbers were equal.  The most plausible mechanism (confirmed by
    which queries failed) is that the oracle side goes through Arrow,
    where HUGEINT surfaces as ``decimal.Decimal`` while Spark's BIGINT
    collects as ``int``.  We replicate that by fetching the DuckDB
    result via Arrow (see ``main``) and tagging each cell with its
    Python value class, so int vs Decimal vs float never collide.
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "b:" + str(v).lower()
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, decimal.Decimal):
        return "d:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return "f:" + repr(v)
    if isinstance(v, datetime.datetime):
        return "t:" + v.isoformat()
    if isinstance(v, datetime.date):
        return "D:" + v.isoformat()
    if isinstance(v, bytes):
        return "x:" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}={norm_cell(v[k])}" for k in sorted(v)
        ) + "}"
    return "s:" + str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\x1e".join(lines).encode()).hexdigest()


def main() -> int:
    args = sys.argv[1:]
    # --plain: use a bare SparkSession (as the external driver does)
    # instead of omim_spark.session defaults — catches queries that
    # silently depend on our session confs.  --first-N: only the first
    # N registry entries in insertion order (the driver's gate window).
    plain = "--plain" in args
    args = [a for a in args if a != "--plain"]
    first_n = None
    for a in list(args):
        if a.startswith("--first-"):
            first_n = int(a.split("-")[-1])
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from omim_spark.workload import QUERIES

    if plain:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from omim_spark.session import get_spark

        spark = get_spark("oracle-check")
    if first_n is not None:
        window = set(list(QUERIES)[:first_n])
        only = (only & window) if only else window
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_skip = 0
    for name, qd in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if qd.oracle is None:
            print(f"SKIP {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            n_skip += 1
            continue
        try:
            res = con.sql(qd.oracle)
            d_cols = [c.lower() for c in res.columns]
            d_types = [str(t).upper() for t in res.types]
            # Fetch via Arrow, matching the driver: HUGEINT comes back as
            # decimal128(38,0) -> decimal.Decimal, not Python int.
            tbl = res.fetch_arrow_table()
            d_rows = [
                tuple(col[i] for col in cols_py)
                for cols_py in [[c.to_pylist() for c in tbl.columns]]
                for i in range(tbl.num_rows)
            ]
        except Exception as e:
            print(f"FAIL {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        hugeints = [c for c, t in zip(d_cols, d_types) if "HUGEINT" in t]
        if hugeints:
            print(f"LINT {name}: oracle column(s) {hugeints} are HUGEINT — "
                  "CAST(SUM(...) AS BIGINT)")
        s_cols_l = [c.lower() for c in s_cols]
        problems = []
        if sorted(s_cols_l) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols_l)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            h_s = frame_hash(s_cols_l, s_rows)
            h_d = frame_hash(d_cols, d_rows)
            if h_s != h_d:
                problems.append("value-hash mismatch")
                order_s = sorted(range(len(s_cols_l)), key=lambda i: s_cols_l[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                lines_s = sorted(
                    "\x1f".join(norm_cell(r[i]) for i in order_s) for r in s_rows
                )
                lines_d = sorted(
                    "\x1f".join(norm_cell(r[i]) for i in order_d) for r in d_rows
                )
                for ls, ld in zip(lines_s, lines_d):
                    if ls != ld:
                        problems.append(f"  spark: {ls[:200]}")
                        problems.append(f"  duck : {ld[:200]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
