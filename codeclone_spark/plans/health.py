"""Table health score: one 0-100 scalar + letter grade per run.

Analog of the reference's repo health metric (``metrics/health.py:95-162``:
a piecewise clone-density curve folded with coverage/debt signals into a
0-100 score and an A-F grade).  Here the density is violations-per-mille
over the validated rows, with undecodable rows weighted heaviest (a clip
that cannot be decoded is strictly worse than a metadata violation).

Pure driver-side arithmetic over already-aggregated totals — the inputs are
the mergeable ledger partials, so the score costs zero extra Spark jobs and
is resume-stable.
"""

from __future__ import annotations

# (violation permille, score) knots of the piecewise-linear curve; permille
# is interpolated log-linearly between knots like the reference's density
# bands (health.py: density -> deduction bands).
_KNOTS = [
    (0.0, 100.0),
    (0.1, 97.0),
    (1.0, 90.0),
    (10.0, 70.0),
    (100.0, 40.0),
    (1000.0, 0.0),
]

_GRADES = [(90.0, "A"), (80.0, "B"), (70.0, "C"), (60.0, "D")]

# an undecodable row counts this many times a plain violation in density
UNDECODABLE_WEIGHT = 5.0


def _curve(permille: float) -> float:
    if permille <= _KNOTS[0][0]:
        return _KNOTS[0][1]
    for (x0, y0), (x1, y1) in zip(_KNOTS, _KNOTS[1:]):
        if permille <= x1:
            # log-linear between knots (x0 may be 0 only at the first knot,
            # handled above); linear in log10(permille)
            import math

            if x0 == 0.0:
                return y0 + (y1 - y0) * (permille / x1)
            f = (math.log10(permille) - math.log10(x0)) / (
                math.log10(x1) - math.log10(x0)
            )
            return y0 + (y1 - y0) * f
    return 0.0


def grade(score: float) -> str:
    for cut, g in _GRADES:
        if score >= cut:
            return g
    return "F"


def health_score(
    rows: int, violations: int, undecodable: int = 0
) -> dict[str, float | str]:
    """0-100 health + A-F grade from run totals.

    ``violations`` is the TRUE total (pre-exemplar-cap); ``undecodable``
    rows (already counted inside violations) are re-weighted by
    UNDECODABLE_WEIGHT - 1 extra."""
    rows = max(int(rows), 1)
    weighted = float(violations) + (UNDECODABLE_WEIGHT - 1.0) * float(undecodable)
    permille = 1000.0 * weighted / rows
    score = round(max(0.0, min(100.0, _curve(permille))), 2)
    return {
        "score": score,
        "grade": grade(score),
        "violation_permille": round(permille, 4),
    }
