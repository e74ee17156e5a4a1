"""Point-in-polygon + spatial kNN operators."""

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
    knn,
    point_in_polygon,
    synth_polygons,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id string, x double, y double")


def test_point_in_polygon_hand_cases(spark):
    polys = spark.createDataFrame(
        [
            (0, [0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 10.0, 10.0]),  # unit-ish square
            (1, [20.0, 30.0, 25.0], [0.0, 0.0, 10.0]),  # triangle
        ],
        "poly_id int, xs array<double>, ys array<double>",
    )
    pts = _pts(
        spark,
        [
            ("in_sq", 5.0, 5.0),
            ("out_sq", 15.0, 5.0),
            ("in_tri", 25.0, 3.0),
            ("out_tri", 21.0, 9.0),
            ("far", 100.0, 100.0),
        ],
    )
    got = {(r.id, r.poly_id) for r in point_in_polygon(pts, polys).collect()}
    assert got == {("in_sq", 0), ("in_tri", 1)}


def test_point_in_polygon_blocked_equals_unblocked(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    pts = _pts(
        spark,
        [(f"p{i}", float(rng.uniform(0, 1000)), float(rng.uniform(0, 1000))) for i in range(300)],
    )
    polys = synth_polygons(spark)
    a = {tuple(r) for r in point_in_polygon(pts, polys, blocked=True).collect()}
    b = {tuple(r) for r in point_in_polygon(pts, polys, blocked=False).collect()}
    assert a == b


def test_point_in_polygon_matches_numpy_oracle(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(f"p{i}", float(rng.uniform(0, 100)), float(rng.uniform(0, 100))) for i in range(200)]
    polys = spark.createDataFrame(
        [(0, [10.0, 60.0, 60.0, 10.0], [10.0, 10.0, 60.0, 60.0]),
         (1, [50.0, 90.0, 70.0], [50.0, 50.0, 95.0])],
        "poly_id int, xs array<double>, ys array<double>",
    )

    def inside(px, py, xs, ys):
        c = False
        n = len(xs)
        for i in range(n):
            j = (i - 1) % n
            if (ys[i] > py) != (ys[j] > py) and px < (xs[j] - xs[i]) * (py - ys[i]) / (ys[j] - ys[i]) + xs[i]:
                c = not c
        return c

    expected = set()
    for pid, xs, ys in [(0, [10, 60, 60, 10], [10, 10, 60, 60]), (1, [50, 90, 70], [50, 50, 95])]:
        for iid, px, py in rows:
            if inside(px, py, xs, ys):
                expected.add((iid, pid))
    got = {tuple(r) for r in point_in_polygon(_pts(spark, rows), polys).collect()}
    assert got == expected


def test_knn_exact(spark):
    inst = spark.createDataFrame(
        [("A", "A1", 0.0, 0.0), ("B", "B1", 1.0, 0.0), ("C", "C1", 0.0, 2.0),
         ("A", "A2", 3.0, 0.0), ("B", "B2", 0.0, 4.0)],
        "feature string, id string, x double, y double",
    )
    q = spark.createDataFrame([("q0", 0.0, 0.0)], "qid string, x double, y double")
    got = [(r.id, r.rank) for r in knn(inst, q, k=3).orderBy("rank").collect()]
    assert got == [("A1", 1), ("B1", 2), ("C1", 3)]


def test_knn_tie_break_by_id(spark):
    inst = spark.createDataFrame(
        [("A", "A1", 1.0, 0.0), ("B", "B1", 0.0, 1.0), ("C", "C1", -1.0, 0.0)],
        "feature string, id string, x double, y double",
    )
    q = spark.createDataFrame([("q0", 0.0, 0.0)], "qid string, x double, y double")
    got = [r.id for r in knn(inst, q, k=3).orderBy("rank").collect()]
    assert got == ["A1", "B1", "C1"]  # equal distances -> id order


def test_knn_exclude_self(spark):
    inst = spark.createDataFrame(
        [("A", "A1", 0.0, 0.0), ("B", "B1", 1.0, 0.0)],
        "feature string, id string, x double, y double",
    )
    q = spark.createDataFrame([("A1", 0.0, 0.0)], "qid string, x double, y double")
    got = [r.id for r in knn(inst, q, k=2, exclude_self=True).collect()]
    assert got == ["B1"]


def test_pip_blocked_equals_exact_and_hash_join(spark):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
        point_in_polygon,
        synth_polygons,
    )

    pts = spark.createDataFrame(
        [(f"p{i}", float((i * 131) % 997), float((i * 577) % 991)) for i in range(400)],
        "id string, x double, y double",
    )
    polys = synth_polygons(spark, 25)
    exact = {(r.id, r.poly_id) for r in point_in_polygon(pts, polys, blocked=False).collect()}
    binned = {(r.id, r.poly_id) for r in point_in_polygon(pts, polys, blocked=True).collect()}
    fine = {(r.id, r.poly_id) for r in point_in_polygon(pts, polys, cell_size=17.0).collect()}
    assert binned == exact == fine
    plan = (
        point_in_polygon(pts, polys, blocked=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pip_multiresolution_handles_giant_polygon(spark):
    """A polygon 1000x larger than the mean must bin at a coarse resolution
    (bounded covering-cell rows), not explode the grid join."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
        point_in_polygon,
        synth_polygons,
    )

    pts = spark.createDataFrame(
        [(f"p{i}", float((i * 131) % 997), float((i * 577) % 991)) for i in range(300)],
        "id string, x double, y double",
    )
    small = synth_polygons(spark, 10)
    # a diamond covering nearly the whole plane
    giant = spark.createDataFrame(
        [(999, [-500.0, 500.0, 1500.0, 500.0], [500.0, -500.0, 500.0, 1500.0])],
        "poly_id int, xs array<double>, ys array<double>",
    )
    polys = small.unionByName(giant)
    exact = {(r.id, r.poly_id) for r in point_in_polygon(pts, polys, blocked=False).collect()}
    binned = {(r.id, r.poly_id) for r in point_in_polygon(pts, polys, blocked=True).collect()}
    assert binned == exact
    # every point lies inside the giant diamond
    assert sum(1 for (_, pid) in exact if pid == 999) == 300
    # empty polygon set -> empty result, correct schema, no error
    empty = polys.limit(0)
    assert point_in_polygon(pts, empty, blocked=True).count() == 0


def test_knn_join_matches_bruteforce(spark):
    import math

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
        knn_join,
    )

    rows = [
        (f"F{i%3}", f"p{i}", float((i * 37) % 50), float((i * 61) % 50))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "feature string, id string, x double, y double")
    out = {(r.qid, r.id, r.rank) for r in knn_join(df, k=3, radius=12.0).collect()}
    # brute force
    expect = set()
    for f, i, x, y in rows:
        cand = [
            (math.sqrt((x - x2) ** 2 + (y - y2) ** 2), j)
            for (_, j, x2, y2) in rows
            if j != i and math.sqrt((x - x2) ** 2 + (y - y2) ** 2) <= 12.0
        ]
        for rank, (_, j) in enumerate(sorted(cand), 1):
            if rank <= 3:
                expect.add((i, j, rank))
    assert out == expect


def test_knn_join_straggler_fallback(spark):
    import math

    from pyspark.sql import functions as F

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
        knn_join,
    )

    # dense blob + one outlier with ZERO in-radius neighbors + one corner
    # point with exactly one (fewer than k) in-radius neighbor
    rows = [("F0", f"p{i:02d}", float(i % 7), float(i // 7)) for i in range(20)]
    rows.append(("F1", "far", 500.0, 500.0))
    rows.append(("F0", "edge1", 40.0, 0.0))
    rows.append(("F0", "edge2", 43.0, 0.0))
    df = spark.createDataFrame(rows, "feature string, id string, x double, y double")

    def brute_global(k):
        expect = set()
        for _, i, x, y in rows:
            cand = sorted(
                (math.sqrt((x - x2) ** 2 + (y - y2) ** 2), j)
                for (_, j, x2, y2) in rows
                if j != i
            )
            for rank, (_, j) in enumerate(cand[:k], 1):
                expect.add((i, j, rank))
        return expect

    out = {(r.qid, r.id, r.rank) for r in knn_join(df, k=3, radius=5.0).collect()}
    # every straggler (far: 0 in-radius; edge1/edge2: 1) got its exact
    # global top-3; non-stragglers keep the single-pass result — and the
    # in-radius top-k IS the global top-k, so the whole output is global
    assert out == brute_global(3)
    # widen path (forced by broadcast_threshold=0) is output-invariant
    widen = {
        (r.qid, r.id, r.rank)
        for r in knn_join(df, k=3, radius=5.0, broadcast_threshold=0).collect()
    }
    assert widen == out
    # fallback=False restores the radius-bounded short-list contract
    short = knn_join(df, k=3, radius=5.0, fallback=False)
    assert short.filter(F.col("qid") == "far").count() == 0
    assert short.filter(F.col("qid") == "edge1").count() == 1


def test_distance_join_matches_bruteforce(spark):
    import math

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
        distance_join,
    )

    lrows = [(f"l{i}", float((i * 37) % 50), float((i * 61) % 50)) for i in range(40)]
    rrows = [(f"r{i}", float((i * 17) % 50 + 0.5), float((i * 29) % 50)) for i in range(35)]
    left = _pts(spark, lrows)
    right = _pts(spark, rrows)
    for d, cs in [(9.0, None), (9.0, 3.0), (2.0, None)]:
        got = {(r.a_id, r.b_id) for r in distance_join(left, right, d, cell_size=cs).collect()}
        expect = {
            (li, ri)
            for li, lx, ly in lrows
            for ri, rx, ry in rrows
            if math.sqrt((lx - rx) ** 2 + (ly - ry) ** 2) <= d
        }
        assert got == expect, (d, cs)
    # asymmetric: left/right are NOT interchangeable in the output shape
    one = distance_join(left, right, 9.0).collect()[0]
    assert one.a_id.startswith("l") and one.b_id.startswith("r")


def test_distance_join_dual_hot_salting_invariant(spark):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
        distance_join,
    )

    # one cell dominates BOTH sides (30 left + 25 right points in [0,1)^2)
    # plus scattered cold-cell points
    lrows = [(f"l{i}", 0.1 + (i % 6) * 0.15, 0.1 + (i // 6) * 0.15) for i in range(30)]
    lrows += [(f"lc{i}", 20.0 + i * 3.0, 25.0) for i in range(5)]
    rrows = [(f"r{i}", 0.05 + (i % 5) * 0.18, 0.05 + (i // 5) * 0.18) for i in range(25)]
    rrows += [(f"rc{i}", 21.0 + i * 3.0, 25.5) for i in range(5)]
    left = _pts(spark, lrows)
    right = _pts(spark, rrows)
    base = {
        (r.a_id, r.b_id)
        for r in distance_join(left, right, 2.0, salt_threshold=None).collect()
    }
    # force salting on (threshold 2 makes the dense cell dual-hot)
    salted = {
        (r.a_id, r.b_id)
        for r in distance_join(
            left, right, 2.0, salt_threshold=2, salt_buckets=4
        ).collect()
    }
    assert salted == base
    assert len(base) > 0
    # one-side-hot only (right side below threshold): still invariant
    one_side = {
        (r.a_id, r.b_id)
        for r in distance_join(
            left, right, 2.0, salt_threshold=27, salt_buckets=4
        ).collect()
    }
    assert one_side == base


def test_distance_join_validates_cell_size(spark):
    import pytest

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
        distance_join,
    )

    df = _pts(spark, [("a", 0.0, 0.0)])
    with pytest.raises(ValueError):
        distance_join(df, df, 5.0, cell_size=6.0)


def test_zonal_stats(spark):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
        zonal_stats,
    )

    polys = spark.createDataFrame(
        [
            (0, [0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 10.0, 10.0]),
            (1, [20.0, 30.0, 30.0, 20.0], [0.0, 0.0, 10.0, 10.0]),
            (2, [50.0, 60.0, 60.0, 50.0], [50.0, 50.0, 60.0, 60.0]),  # empty
        ],
        "poly_id int, xs array<double>, ys array<double>",
    )
    pts = spark.createDataFrame(
        [
            ("A", "a1", 2.0, 2.0),
            ("A", "a2", 8.0, 3.0),
            ("B", "b1", 5.0, 5.0),
            ("B", "b2", 25.0, 5.0),
            ("C", "c1", 100.0, 100.0),
        ],
        "feature string, id string, x double, y double",
    )
    got = {r.poly_id: r for r in zonal_stats(pts, polys).collect()}
    assert set(got) == {0, 1}  # empty polygon emits no row
    assert (got[0].n, got[0].n_features) == (3, 2)
    assert (got[0].min_x, got[0].max_x, got[0].min_y, got[0].max_y) == (2.0, 8.0, 2.0, 5.0)
    assert (got[1].n, got[1].n_features) == (1, 1)


def test_distance_join_plan_has_no_nested_loop(spark):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
        distance_join,
    )

    left = _pts(spark, [(f"l{i}", float(i), 0.0) for i in range(50)])
    right = _pts(spark, [(f"r{i}", float(i), 1.0) for i in range(50)])
    plan = distance_join(left, right, 3.0)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_distance_join_empty_sides(spark):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
        distance_join,
    )

    pts = _pts(spark, [("a", 0.0, 0.0)])
    empty = pts.limit(0)
    assert distance_join(pts, empty, 5.0).count() == 0
    assert distance_join(empty, pts, 5.0).count() == 0


def test_zonal_stats_no_points_inside(spark):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
        synth_polygons,
        zonal_stats,
    )

    far = spark.createDataFrame(
        [("A", "a", 1e6, 1e6)], "feature string, id string, x double, y double"
    )
    assert zonal_stats(far, synth_polygons(spark)).count() == 0
