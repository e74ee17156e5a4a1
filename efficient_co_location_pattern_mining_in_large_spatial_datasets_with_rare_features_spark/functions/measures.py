"""Interest-measure math for rare-feature co-location mining (driver-side).

Implements the WPI measure family of Yang et al., KAIS 63:1365-1395 (2021):
degree of dispersion delta (Def. 1), deviation (Def. 2), rare intensity
(Def. 3), weighted participation ratio (Def. 4) and WPI (Def. 5).

These are pure scalar functions over the (tiny, broadcastable) per-feature
instance histogram; the expensive part of the measure — the distinct
participating-instance counts — is computed on the cluster (see
plans/miner.py) and only the final min/weighting happens here.

Reference parity: src/utils.cpp:93-143 (delta), :198-245 (RI),
:147-193 (PR), src/miner.cpp:382-430 (WPR / WPI selection).
"""

from __future__ import annotations

import math
from collections.abc import Mapping, Sequence

#: Guard against division by ~0 rare-intensity (reference include/constants.h:13).
RI_EPSILON = 1e-9


def rank_features(counts: Mapping[str, int]) -> list[str]:
    """Global canonical feature order: ascending (instance count, name).

    Every ordering in the engine (candidate canonical form, star orientation,
    pattern rendering) derives from this single order.
    Reference: src/utils.cpp:64-87.
    """
    return sorted(counts, key=lambda f: (counts[f], f))


def delta(counts: Mapping[str, int]) -> float:
    """Degree of dispersion: ``2/(m(m-1)) * sum_{i<j} cnt_j / cnt_i`` with
    counts rank-sorted ascending (so every ratio >= 1 up to name ties).

    Reference: src/utils.cpp:93-143; paper Def. 1 eq. 2.
    """
    ordered = [counts[f] for f in rank_features(counts)]
    m = len(ordered)
    if m < 2:
        return 0.0
    total = 0.0
    for i in range(m):
        for j in range(i + 1, m):
            total += ordered[j] / ordered[i]
    return 2.0 * total / (m * (m - 1))


def deviation(num_f: int, num_fmin: int) -> float:
    """v(f, C) = num(f) / num(f_min).  Reference: src/utils.cpp:237."""
    return num_f / num_fmin


def rare_intensity(num_f: int, num_fmin: int, delta_value: float) -> float:
    """RI(f, C) = exp(-(v-1)^2 / (2 delta^2)) — Gaussian kernel of deviation.

    Equals 1 for the rarest feature of C and decays toward 0 as f becomes
    relatively common.  Degenerate guards match the reference exactly:
    delta <= EPSILON_DELTA or num_fmin <= 0 yield RI = 0 (so weight = 0 and
    the pattern can never be prevalent).  Reference: src/utils.cpp:198-245
    (delta guard at :205, minCount guard at :229); paper Def. 3 eq. 5.
    """
    if delta_value <= RI_EPSILON or num_fmin <= 0:
        return 0.0
    v = deviation(num_f, num_fmin)
    return math.exp(-((v - 1.0) ** 2) / (2.0 * delta_value * delta_value))


def weight(num_f: int, num_fmin: int, delta_value: float) -> float:
    """w(f, C) = 1 / RI(f, C), or 0 when RI <= RI_EPSILON.

    The zero branch matters: WPR = PR * 0 = 0, so a feature whose deviation
    is extreme enough to underflow RI *disqualifies* the whole pattern
    (the reference never declares such patterns prevalent).
    Reference: src/miner.cpp:397-410; paper Def. 4 eq. 6.
    """
    ri = rare_intensity(num_f, num_fmin, delta_value)
    if ri <= RI_EPSILON:
        return 0.0
    return 1.0 / ri


def wpi(
    pattern: Sequence[str],
    participating: Mapping[str, int],
    counts: Mapping[str, int],
    delta_value: float,
) -> float:
    """WPI(C) = min over f in C of PR(f,C) * w(f,C).

    ``participating[f]`` is the number of *distinct* instances of feature f
    appearing in the table instance T(C) (cluster-side countDistinct).
    Reference: src/miner.cpp:382-421; paper Def. 5 eq. 7.
    """
    num_fmin = min(counts[f] for f in pattern)
    best = math.inf
    for f in pattern:
        pr = participating.get(f, 0) / counts[f]
        wpr = pr * weight(counts[f], num_fmin, delta_value)
        best = min(best, wpr)
    return best


def pi(
    pattern: Sequence[str],
    participating: Mapping[str, int],
    counts: Mapping[str, int],
) -> float:
    """Plain participation index: min over f of PR(f, C).

    Used by the Lemma-3 upper-bound prune.  Reference: src/utils.cpp:249-274.
    """
    return min(participating.get(f, 0) / counts[f] for f in pattern)
