"""Mirror of the driver's correctness harness: run every __spark_entry__
query in Spark AND its oracle SQL in DuckDB on the same parquet tables;
compare row count, column names, and order-insensitive values.

Usable as a script (`python tests/preflight_entry.py [sf_dir]`) and from
pytest (test_entry_contract.py).
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact: engines must agree bitwise on derived floats
        return repr(float(v))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# ---------------------------------------------------------------------------
# Oracle dtype preflight.
#
# DuckDB's Python `fetchall()` returns arbitrary-precision ints, which hides
# a whole class of driver reds: the driver materializes the oracle through
# pandas (`res.df()`), where an un-cast SUM(BIGINT) comes back as HUGEINT ->
# float64 and hashes differently from the engine's bigint even when every
# value is numerically identical (rounds 2-4 each lost a row to this).  The
# gate therefore checks each oracle column's PLANNED DuckDB logical type
# (`con.sql(sql).types` — planning only, the query is never re-executed,
# and unlike pandas dtypes the result cannot be skewed by NULL-driven
# int->float promotion in whatever rows this sf happens to produce)
# against the Spark schema's canonical kind.

_SPARK_KIND = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "long": "int", "float": "float", "double": "float", "string": "str",
    "boolean": "bool", "binary": "bytes", "date": "time",
}


def _spark_kind(dtype: str) -> str:
    if dtype.startswith("decimal"):
        return "float"
    if dtype.startswith("timestamp"):
        return "time"
    return _SPARK_KIND.get(dtype, "other")


_DUCK_KIND = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    "UBIGINT": "int",
    # HUGEINT/DECIMAL are exact in DuckDB but materialize as float64
    # through the driver's pandas fetch — that mismatch IS the bug class
    "HUGEINT": "float", "UHUGEINT": "float",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "BLOB": "bytes",
    "DATE": "time", "TIME": "time", "INTERVAL": "time",
}


def _duck_kind(t: str) -> str:
    if t.startswith("DECIMAL"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "time"
    return _DUCK_KIND.get(t, "other")


_STRICT_KINDS = {"int", "float", "str", "bool", "bytes"}


def oracle_dtype_mismatches(con, sql: str, spark_dtypes) -> list[str]:
    """Return ['col: spark=int oracle=float', ...] for every column whose
    planned oracle type conflicts with the Spark schema kind.  Kinds
    outside _STRICT_KINDS (arrays, structs, ...) are not comparable
    through this lens and never flagged."""
    rel = con.sql(sql)
    skinds = {name: _spark_kind(dt) for name, dt in spark_dtypes}
    out = []
    for col, t in zip(rel.columns, rel.types):
        sk = skinds.get(col)
        ok = _duck_kind(str(t))
        if sk in _STRICT_KINDS and ok in _STRICT_KINDS and sk != ok:
            out.append(f"{col}: spark={sk} oracle={ok}")
    return out


def compare_query(spark, sf_dir: str, name: str, qfn, sql: str | None):
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        return {"name": name, "rows": len(srows), "oracle": None, "match": None}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    report = {
        "name": name,
        "rows": len(srows),
        "oracle_rows": len(orows),
        "cols": sorted(scols),
        "oracle_cols": sorted(ocols),
    }
    report["cols_match"] = sorted(scols) == sorted(ocols)
    report["count_match"] = len(srows) == len(orows)
    s_can = _canon(srows, scols)
    o_can = _canon(orows, ocols)
    report["values_match"] = s_can == o_can
    if not report["values_match"]:
        diff_s = [r for r in s_can if r not in set(o_can)][:3]
        diff_o = [r for r in o_can if r not in set(s_can)][:3]
        report["spark_only"] = diff_s
        report["oracle_only"] = diff_o
    report["dtype_mismatches"] = oracle_dtype_mismatches(con, sql, sdf.dtypes)
    report["dtypes_match"] = not report["dtype_mismatches"]
    report["match"] = (
        report["cols_match"]
        and report["count_match"]
        and report["values_match"]
        and report["dtypes_match"]
    )
    return report


def run_all(spark, sf_dir: str, only: list[str] | None = None):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            results.append(compare_query(spark, sf_dir, name, fn, oracles.get(name)))
        except Exception as e:  # noqa: BLE001
            results.append({"name": name, "error": f"{type(e).__name__}: {e}"[:500]})
    return results


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = eng.get_spark("local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for rep in run_all(spark, sf_dir, only):
        status = (
            "ERROR" if "error" in rep
            else "OK" if rep["match"]
            else "ROWS-ONLY" if rep["match"] is None
            else "MISMATCH"
        )
        if status in ("ERROR", "MISMATCH"):
            bad += 1
        line = f"{status:10} {rep['name']:24} rows={rep.get('rows')}"
        if status == "MISMATCH":
            line += (
                f" oracle_rows={rep.get('oracle_rows')}"
                f" cols={rep.get('cols_match')} cnt={rep.get('count_match')}"
                f" vals={rep.get('values_match')}"
                f" dtypes={rep.get('dtype_mismatches')}"
                f" s_only={rep.get('spark_only')} o_only={rep.get('oracle_only')}"
            )
        if status == "ERROR":
            line += " " + rep["error"][:300]
        print(line, flush=True)
    sys.exit(1 if bad else 0)
