"""Daily resample with gap fill + forward fill: hand goldens and the
q63 oracle."""

import pytest
from pyspark.sql import functions as F

from pvt_spark.operators.temporal import resample_daily


def test_resample_hand_golden(spark):
    rows = [
        (0, "2024-01-01 10:00:00", "a", 1.5),
        (1, "2024-01-01 11:00:00", "a", 2.5),   # day1 a: n=2, s=4000
        (2, "2024-01-04 09:00:00", "a", 1.0),   # days 2-3 gap, carry 4000
        (3, "2024-01-02 09:00:00", "b", 3.0),   # b starts day2: day1 -> 0
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts string, k string, value double")
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r.key, str(r.day)): (r.n_events, r.sum_value_milli, r.filled_sum_milli)
        for r in resample_daily(ev, "k", "ts", "value").collect()
    }
    # full 4-day grid for both keys
    assert len(out) == 8
    assert out[("a", "2024-01-01")] == (2, 4000, 4000)
    assert out[("a", "2024-01-02")] == (0, 0, 4000)      # gap carries
    assert out[("a", "2024-01-03")] == (0, 0, 4000)
    assert out[("a", "2024-01-04")] == (1, 1000, 1000)   # new observation
    assert out[("b", "2024-01-01")] == (0, 0, 0)         # before first obs
    assert out[("b", "2024-01-02")] == (1, 3000, 3000)
    assert out[("b", "2024-01-03")] == (0, 0, 3000)
    assert out[("b", "2024-01-04")] == (0, 0, 3000)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q63_oracle(spark, sf_dir):
    from pvt_spark.queries import compare_against_oracle

    res = compare_against_oracle(spark, sf_dir, names={"q63_daily_resample"})
    assert res["q63_daily_resample"].get("match") is True, res
