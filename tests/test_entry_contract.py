"""Driver-contract preflight: every queries() entry runs, and every
oracle_sql() entry matches DuckDB bit-for-bit at sf0.001 (the driver's own
gate runs the same comparison at sf0.01 — see tests/preflight_entry.py)."""

import sys

sys.path.insert(0, "/root/repo")

from tests.preflight_entry import run_all  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert df.columns == ["pattern", "size", "wpi"]
    assert len(rows) >= 0


def test_dtype_gate_catches_hugeint(spark):
    """Negative control for the oracle-dtype preflight: an un-cast
    SUM(BIGINT) materializes as HUGEINT->float64 through pandas (the
    driver's fetch path) and must be flagged against an engine bigint —
    the exact bug class that went red in rounds 2, 3 and 4."""
    import duckdb

    from tests.preflight_entry import oracle_dtype_mismatches

    con = duckdb.connect()
    sdf = spark.range(2).selectExpr("CAST(id AS BIGINT) AS s")
    bad = oracle_dtype_mismatches(
        con, "SELECT SUM(x) AS s FROM (VALUES (1),(2)) t(x)", sdf.dtypes
    )
    assert bad == ["s: spark=int oracle=float"]
    good = oracle_dtype_mismatches(
        con, "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1),(2)) t(x)",
        sdf.dtypes,
    )
    assert good == []


def test_oracle_entries_fit_driver_cap_and_come_first():
    """r05 verdict #7: the driver's artifact caps at 50 entries, taken in
    dict order — every oracle-bearing entry must sit inside the first 50
    so a sample cut can never silently drop a hash-checked row."""
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= set(names), sorted(oracles - set(names))
    with_oracle = [n for n in names if n in oracles]
    assert len(with_oracle) <= 50, "oracle-bearing entries exceed driver cap"
    assert names[: len(with_oracle)] == with_oracle, (
        "rows-only entries interleave oracle-bearing ones"
    )


def test_all_queries_match_oracles(spark):
    reports = run_all(spark, SF_DIR)
    errors = [r for r in reports if "error" in r]
    assert not errors, errors
    mismatches = [r for r in reports if r["match"] is False]
    assert not mismatches, mismatches
    oracled = [r for r in reports if r["match"] is True]
    assert len(oracled) >= 50  # keep the oracle coverage from regressing
