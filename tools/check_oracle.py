"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given SF, then compares row count, column-name sets, and the
order-insensitive multiset of row values (exact equality after canonical
normalization). Usage:

    python tools/check_oracle.py [--json PATH] [sf_dir] [query ...]

``--json PATH`` additionally writes per-query results in the driver's
CORRECTNESS_r{N}.json shape (rows/schema/hash match flags), so a round
can ship a full-surface local artifact even when the driver's own file
is stale or truncated.
"""

from __future__ import annotations

import json
import math
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as se  # noqa: E402
from quty_server_spark.session import get_spark  # noqa: E402
from quty_server_spark.sources.tables import TABLES  # noqa: E402


# DuckDB type names (appearing anywhere in a column type, including inside
# LIST/STRUCT) that Spark cannot emit. The driver's comparator is
# representation-sensitive, so an oracle column of one of these types can
# hash-mismatch even when the VALUES are identical — the round-3 failure
# mode: DuckDB promotes SUM(BIGINT) and list_aggregate(..., 'sum') to
# HUGEINT (int128) while Spark emits int64. Every oracle must cast such
# columns (CAST(... AS BIGINT) / DOUBLE) so both engines agree on the
# representation, not just the value.
NON_SPARK_TYPES = (
    "HUGEINT",  # also matches UHUGEINT
    "UBIGINT",
    "UINTEGER",
    "USMALLINT",
    "UTINYINT",
    "INTERVAL",
    "UUID",
    "BIT",
    "TIME WITH TIME ZONE",
)


# pandas timestamp[ns] representable range. The driver's comparator runs
# Spark's toPandas() (Arrow timestamp[us] -> timestamp[ns]) and DuckDB's
# fetchdf — a datetime OUTSIDE this range on either side raises
# ArrowInvalid in the comparator even though both engines agree on the
# value (round-4 failure: SCD2's 9999-12-31 open-row sentinel). Same
# representation-sensitivity class as HUGEINT, in the value domain.
# Date-granular bounds, shrunk one day on the hot end: pandas' true max
# is 2262-04-11 23:47:16.854775807, so a date-level check admitting
# 04-11 would pass TIMESTAMP '2262-04-11 23:59:59' and still blow up the
# comparator — exactly the failure class this lint exists to kill. Every
# time-of-day on 04-10 (and on 1677-09-22) is safely inside the range.
PANDAS_NS_MIN = datetime(1677, 9, 22)
PANDAS_NS_MAX = datetime(2262, 4, 10)


def lint_ns_range(cols, rows) -> list[str]:
    """Return ``["col: value", ...]`` for datetime/date cells outside the
    pandas-ns representable range. Scans all rows — gate-time only."""
    bad: dict[str, str] = {}
    lo, hi = PANDAS_NS_MIN.date(), PANDAS_NS_MAX.date()
    for r in rows:
        for i, v in enumerate(r):
            d = None
            if isinstance(v, datetime):
                d = v.date()
            elif isinstance(v, date):
                d = v
            elif hasattr(v, "to_pydatetime"):
                d = v.to_pydatetime().date()
            if d is not None and not (lo <= d <= hi):
                bad.setdefault(cols[i], str(v))
    return [f"{c}: {v}" for c, v in bad.items()]


# Complex (nested) output types. The driver's comparator canonicalizes
# via pandas sort_values/factorize, which raises "unhashable type:
# numpy.ndarray" on any array/map/struct cell (round-6 failure:
# embed_quantize_int8, text_winnow_fingerprint). Complex values are fine
# INSIDE a query; the OUTPUT must stringify them (concat_ws /
# array_to_string) or explode to scalar grain.
COMPLEX_TYPE_MARKERS = ("[]", "STRUCT(", "MAP(", "UNION(", "LIST(")


def lint_oracle_types(con, sql: str) -> list[str]:
    """Return ``["col: TYPE", ...]`` for oracle output columns whose DuckDB
    type Spark cannot emit OR the driver comparator cannot canonicalize
    (nested list/struct/map). Binds the query lazily (schema only — no
    rows are materialized)."""
    rel = con.sql(sql)
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(marker in t for marker in NON_SPARK_TYPES):
            bad.append(f"{col}: {t}")
        elif any(marker in t for marker in COMPLEX_TYPE_MARKERS):
            bad.append(f"{col}: {t} (complex output — driver comparator "
                       f"cannot canonicalize; stringify or explode)")
    return bad


def lint_spark_complex(schema) -> list[str]:
    """Return ``["col: type", ...]`` for Spark output columns with nested
    types (array/map/struct) — the driver comparator errs on these."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (datetime, date)):
        return str(v)
    if hasattr(v, "to_pydatetime"):
        return str(v.to_pydatetime())
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    if isinstance(v, (bool, int, str, bytes)):
        return v
    return str(v)


def df_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return [cols[i] for i in order], out


def main():
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: check_oracle.py [--json PATH] [sf_dir] [query ...]")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = se.queries(), se.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None, "oracle_rows": None,
                "err": f"spark: {type(e).__name__}: {e}"[:200],
            }
            continue
        bad_complex = lint_spark_complex(sdf.schema)
        if bad_complex:
            print(f"FAIL  {name}: spark complex-type lint: {', '.join(bad_complex)}")
            n_fail += 1
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None,
                "err": f"spark complex-type lint: {', '.join(bad_complex)}"[:200],
            }
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rowsonly += 1
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": "no_oracle",
            }
            continue
        bad_types = lint_oracle_types(con, oracles[name])
        if bad_types:
            print(f"FAIL  {name}: oracle type-lint: {', '.join(bad_types)}")
            n_fail += 1
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None,
                "err": f"oracle type-lint: {', '.join(bad_types)}"[:200],
            }
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None,
                "err": f"duckdb: {type(e).__name__}: {e}"[:200],
            }
            continue
        bad_range = lint_ns_range(scols, srows) or lint_ns_range(ocols, orows)
        if bad_range:
            print(
                f"FAIL  {name}: timestamp outside pandas-ns range "
                f"(driver comparator would raise ArrowInvalid): "
                + ", ".join(bad_range)
            )
            n_fail += 1
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": len(orows),
                "err": f"ns-range lint: {', '.join(bad_range)}"[:200],
            }
            continue
        ok = True
        msgs = []
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duckdb={sorted(ocols)}")
        if ok:
            _, sm = df_to_multiset(scols, srows)
            _, om = df_to_multiset(ocols, orows)
            if sm != om:
                ok = False
                extra_s = [k for k in sm if sm[k] != om.get(k, 0)][:3]
                extra_o = [k for k in om if om[k] != sm.get(k, 0)][:3]
                msgs.append(f"values differ; spark-side sample={extra_s} duckdb-side sample={extra_o}")
        if ok:
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + " | ".join(msgs))
            n_fail += 1
        results[name] = {
            "rows_match": len(srows) == len(orows),
            "schema_match": sorted(scols) == sorted(ocols),
            "hash_match": ok,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": None,
        }
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_path} ({len(results)} queries)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
