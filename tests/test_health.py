"""Health score curve (driver-side arithmetic, no Spark)."""

from codeclone_spark.plans import health


def test_perfect_table():
    h = health.health_score(rows=1_000_000, violations=0)
    assert h == {"score": 100.0, "grade": "A", "violation_permille": 0.0}


def test_monotone_in_density():
    scores = [
        health.health_score(rows=1_000_000, violations=v)["score"]
        for v in (0, 10, 100, 1_000, 10_000, 100_000, 1_000_000)
    ]
    assert scores == sorted(scores, reverse=True)
    assert scores[-1] == 0.0


def test_grades():
    assert health.health_score(1000, 0)["grade"] == "A"
    assert health.health_score(1000, 1)["grade"] == "A"      # 1 permille -> 90
    assert health.health_score(1000, 2)["grade"] == "B"      # 2 permille ~ 84
    assert health.health_score(1000, 10)["grade"] == "C"     # 10 permille -> 70
    assert health.health_score(1000, 18)["grade"] == "D"     # 18 permille ~ 62
    assert health.health_score(1000, 200)["grade"] == "F"


def test_undecodable_weighs_heavier():
    plain = health.health_score(10_000, violations=10, undecodable=0)
    undec = health.health_score(10_000, violations=10, undecodable=10)
    assert undec["score"] < plain["score"]


def test_zero_rows_guard():
    h = health.health_score(rows=0, violations=0)
    assert h["score"] == 100.0
