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


def test_all_queries_match_oracles(spark):
    reports = run_all(spark, SF_DIR)
    errors = [r for r in reports if "error" in r]
    assert not errors, errors
    mismatches = [r for r in reports if r["match"] is False]
    assert not mismatches, mismatches
    oracled = [r for r in reports if r["match"] is True]
    assert len(oracled) >= 39  # keep the oracle coverage from regressing
