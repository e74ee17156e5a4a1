"""Unit tests for the WPI measure family against the paper's worked example
(FIXTURES.md §4.4) and the three measured delta values (FIXTURES.md §4)."""

import math

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions import (
    measures,
)

# Paper §3 Example 4: pattern {A, D}, num(A)=8, num(D)=2, delta of the Fig. 1
# dataset (feature histogram A:8 B:3 C:6 D:2 -> delta = 2.4167) gives
# RI(A,{A,D}) ~= 0.46, w ~= 2.17, PR(A) = 3/8 -> WPR(A) ~= 0.81.


def _delta_fig1():
    return measures.delta({"A": 8, "B": 3, "C": 6, "D": 2})


def test_paper_example4_rare_intensity():
    d = _delta_fig1()
    assert abs(d - 2.41667) < 1e-4
    ri_a = measures.rare_intensity(8, 2, d)
    assert abs(ri_a - 0.46) < 0.005, ri_a
    assert measures.rare_intensity(2, 2, d) == 1.0  # f_min always RI=1


def test_paper_example4_wpr():
    d = _delta_fig1()
    w = measures.wpi(("D", "A"), {"A": 3, "D": 2}, {"A": 8, "D": 2}, d)
    # WPR(A) = 0.375 * 1/0.46 ~= 0.81 (paper rounds to 0.814); WPR(D) = 1.0
    assert abs(w - 0.814) < 0.01, w


def test_delta_sample_data():
    assert abs(measures.delta({"A": 5, "B": 4, "C": 4, "D": 3}) - 1.30556) < 1e-4


def test_delta_lasvegas():
    counts = dict(
        A=4534, B=2875, C=2070, D=1898, E=1560, F=1669, G=1365, H=935, I=924,
        J=885, K=914, L=739, M=713, N=601, O=349, P=389, Q=304,
    )
    assert abs(measures.delta(counts) - 2.90462) < 1e-4


def test_rank_order_count_then_name():
    ranked = measures.rank_features({"A": 5, "B": 4, "C": 4, "D": 3})
    assert ranked == ["D", "B", "C", "A"]


def test_weight_zero_when_ri_underflows():
    assert measures.weight(2, 2, 1.0) == 1.0
    # enormous deviation -> RI <= epsilon -> weight 0 (reference
    # src/miner.cpp:400-408), which makes WPR = 0 and disqualifies the
    # pattern; the old clamp-to-1e9 behaviour declared it prevalent.
    assert measures.weight(10**6, 1, 0.1) == 0.0
    # just over the epsilon boundary stays on the 1/RI path
    ri = measures.rare_intensity(10, 2, 1.0)
    assert measures.weight(10, 2, 1.0) == 1.0 / ri


def test_skewed_counts_never_prevalent():
    """A feature ~100x more common than f_min has RI ~ 0 -> weight 0 ->
    WPI 0, even with perfect participation (ADVICE r1 regression)."""
    counts = {"rare": 10, "common": 1000}
    d = measures.delta(counts)  # = 100.0 for two features
    # deviation v = 100 -> (v-1)^2/(2 d^2) = 9801/20000 -> RI ~ 0.6: fine.
    # Make it extreme: delta small because of a third balancing feature.
    counts3 = {"rare": 10, "mid": 11, "common": 1000}
    d3 = measures.delta(counts3)
    ri_common = measures.rare_intensity(1000, 10, d3)
    if ri_common <= measures.RI_EPSILON:
        w = measures.wpi(
            ("rare", "mid", "common"),
            {"rare": 10, "mid": 11, "common": 1000},
            counts3,
            d3,
        )
        assert w == 0.0
    # Direct underflow case regardless of dataset shape:
    w0 = measures.wpi(
        ("rare", "common"),
        {"rare": 10, "common": 1000},
        {"rare": 10, "common": 1000},
        0.5,
    )
    assert w0 == 0.0  # RI(common) = exp(-99^2/0.5) == 0 -> weight 0


def test_delta_degenerate():
    assert measures.delta({"A": 7}) == 0.0
    assert measures.delta({}) == 0.0
    # delta <= epsilon -> RI = 0 for every feature (reference
    # src/utils.cpp:205 returns 0 outright, even at v == 1)
    assert measures.rare_intensity(3, 3, 0.0) == 0.0
    assert measures.rare_intensity(5, 3, 0.0) == 0.0
    assert measures.rare_intensity(3, 0, 1.0) == 0.0  # minCount guard
