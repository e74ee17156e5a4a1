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


def test_weight_is_inverse_ri_clamped():
    assert measures.weight(2, 2, 1.0) == 1.0
    # enormous deviation -> RI underflows -> clamped by epsilon
    assert measures.weight(10**6, 1, 0.1) == 1.0 / measures.RI_EPSILON


def test_delta_degenerate():
    assert measures.delta({"A": 7}) == 0.0
    assert measures.delta({}) == 0.0
    # delta=0 two-feature edge: equal counts -> RI=1, unequal -> RI=0
    assert measures.rare_intensity(3, 3, 0.0) == 1.0
    assert measures.rare_intensity(5, 3, 0.0) == 0.0
