"""DBSCAN: brute-force parity, determinism, and edge cases."""

from __future__ import annotations

import math

import pytest

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.cluster import (
    dbscan,
)


def _brute_dbscan(rows, eps, min_pts):
    """Reference DBSCAN with the operator's deterministic tie-breaks:
    cluster label = min core id in the density-connected component,
    border points take the min label among adjacent clusters."""
    ids = [r[1] for r in rows]
    pos = {r[1]: (r[2], r[3]) for r in rows}

    def neighbors(i):
        xi, yi = pos[i]
        return [
            j
            for j in ids
            if j != i
            and math.sqrt((xi - pos[j][0]) ** 2 + (yi - pos[j][1]) ** 2) <= eps
        ]

    nbrs = {i: neighbors(i) for i in ids}
    core = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    # connected components over core-core edges
    label = {}
    for i in sorted(core):
        if i in label:
            continue
        stack, comp = [i], []
        seen = {i}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbrs[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        lab = min(comp)
        for u in comp:
            label[u] = lab
    out = {}
    for i in ids:
        if i in core:
            out[i] = (label[i], "core")
        else:
            cands = sorted(label[j] for j in nbrs[i] if j in core)
            out[i] = (cands[0], "border") if cands else (None, "noise")
    return out


@pytest.fixture(scope="module")
def grid80(spark):
    rows = [
        (f"F{i % 4}", f"p{i:03d}", float((i * 37) % 60), float((i * 61) % 60))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "feature string, id string, x double, y double")
    return rows, df


@pytest.mark.parametrize("eps,min_pts", [(8.0, 3), (8.0, 5), (4.0, 2), (15.0, 4)])
@pytest.mark.parametrize("finish", [500_000, 0])  # driver union-find vs fully distributed
def test_dbscan_matches_bruteforce(spark, grid80, eps, min_pts, finish):
    rows, df = grid80
    got = {
        r.id: (r.cluster, r.role)
        for r in dbscan(df, eps, min_pts, driver_finish_edges=finish).collect()
    }
    assert got == _brute_dbscan(rows, eps, min_pts)


def test_dbscan_all_noise_and_all_core(spark):
    df = spark.createDataFrame(
        [("A", "a", 0.0, 0.0), ("B", "b", 100.0, 0.0), ("C", "c", 0.0, 100.0)],
        "feature string, id string, x double, y double",
    )
    out = {r.id: (r.cluster, r.role) for r in dbscan(df, 1.0, 2).collect()}
    assert out == {"a": (None, "noise"), "b": (None, "noise"), "c": (None, "noise")}
    # min_pts=1: every point is a core singleton cluster
    out1 = {r.id: (r.cluster, r.role) for r in dbscan(df, 1.0, 1).collect()}
    assert out1 == {"a": ("a", "core"), "b": ("b", "core"), "c": ("c", "core")}


def test_dbscan_long_chain_converges(spark):
    # a 120-point path: worst case for naive label propagation (O(n)
    # rounds); star contraction must close it in O(log n)
    rows = [("A", f"c{i:03d}", float(i), 0.0) for i in range(120)]
    df = spark.createDataFrame(rows, "feature string, id string, x double, y double")
    out = dbscan(df, 1.0, 2, driver_finish_edges=0).collect()
    assert {r.cluster for r in out} == {"c000"}
    assert all(r.role == "core" for r in out)


def test_dbscan_min_pts_validation(spark):
    df = spark.createDataFrame(
        [("A", "a", 0.0, 0.0)], "feature string, id string, x double, y double"
    )
    with pytest.raises(ValueError):
        dbscan(df, 1.0, 0)


def test_dbscan_empty_and_single(spark):
    empty = spark.createDataFrame(
        [], "feature string, id string, x double, y double"
    )
    assert dbscan(empty, 1.0, 2).count() == 0
    one = spark.createDataFrame(
        [("A", "only", 0.0, 0.0)], "feature string, id string, x double, y double"
    )
    out = dbscan(one, 1.0, 2).collect()
    assert [(r.id, r.cluster, r.role) for r in out] == [("only", None, "noise")]


def test_dbscan_releases_contraction_checkpoints(spark):
    # the per-round contraction checkpoints must be freed eagerly (not at
    # some future ContextCleaner GC): after a fully-distributed dbscan
    # (driver_finish_edges=0 forces real contraction rounds) only the
    # result-backing `labeled` checkpoint may remain pinned
    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    rows = [("A", f"p{i:03d}", float(i % 25), float(i // 25)) for i in range(100)]
    df = spark.createDataFrame(rows, "feature string, id string, x double, y double")
    before = n_persistent()
    out = dbscan(df, 1.2, 3, driver_finish_edges=0)
    got = out.count()
    assert got == 100
    # tolerance 1: the eager `labeled` checkpoint backing the returned plan
    assert n_persistent() - before <= 1
