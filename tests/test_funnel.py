"""Strict-order funnel: hand goldens for ordering/strictness and the
q64 oracle."""

import pytest
from pyspark.sql import functions as F

from pvt_spark.operators.temporal import funnel_steps


def test_funnel_hand_golden(spark):
    rows = [
        # user 1: click BEFORE the first view must not count; the chain
        # is view@10 -> click@20 -> purchase@30
        (1, 5, "click"), (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: view only
        (2, 10, "view"),
        # user 3: no view at all -> not in the output
        (3, 10, "click"), (3, 20, "purchase"),
        # user 4: purchases exist but none AFTER the click -> step 3 NULL
        (4, 10, "view"), (4, 15, "purchase"), (4, 18, "purchase"), (4, 20, "click"),
        # user 5: equal timestamp is NOT strictly after -> step 2 NULL
        (5, 10, "view"), (5, 10, "click"),
    ]
    ev = spark.createDataFrame(
        [(u, f"2024-01-01 00:00:{s:02d}", t) for u, s, t in rows],
        "user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r.key: (r.step_1_us, r.step_2_us, r.step_3_us)
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    base = out[1][0]
    assert set(out) == {1, 2, 4, 5}
    assert out[1] == (base, base + 10_000_000, base + 20_000_000)
    assert out[2] == (base, None, None)
    assert out[4] == (base, base + 10_000_000, None)
    assert out[5] == (base, None, None)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q64_oracle(spark, sf_dir):
    from pvt_spark.queries import compare_against_oracle

    res = compare_against_oracle(spark, sf_dir, names={"q64_funnel"})
    assert res["q64_funnel"].get("match") is True, res
