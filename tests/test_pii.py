"""PII detection + redaction (functions/pii.py) — unit + oracle
certification.

The standard pre-training scrub pass (C4 / RefinedWeb / Dolma): mask
e-mails, IPv4s, and NANP phone numbers. No counterpart in the reference
repo (no text surface there); part of the web-corpus operator family.
"""

import pytest
from pyspark.sql import functions as F

from pvt_spark.functions.pii import (
    pii_email_count,
    pii_ipv4_count,
    pii_phone_count,
    redact_pii,
)

CASES = [
    # (raw, n_email, n_ipv4, n_phone, redacted)
    (
        "mail bob.smith+x@sub.example.co.uk today",
        1, 0, 0,
        "mail <EMAIL> today",
    ),
    (
        "from 192.168.0.1 and 10.0.0.255 end",
        0, 2, 0,
        "from <IP> and <IP> end",
    ),
    (
        "call 555-123-4567 now",
        0, 0, 1,
        "call <PHONE> now",
    ),
    (
        "a@b.io at 1.2.3.4 ring 555-000-0001",
        1, 1, 1,
        "<EMAIL> at <IP> ring <PHONE>",
    ),
    # word boundaries: digits glued to letters do not make a phone;
    # a five-part dotted run still exposes a quad window (documented
    # in IPV4_RE — the oracle shares the pattern, not perfection)
    ("x555-123-4567 and 1.2.3.4.5", 0, 1, 0, "x555-123-4567 and <IP>.5"),
    ("no pii here, just 3.14 and v2.0", 0, 0, 0, "no pii here, just 3.14 and v2.0"),
]


def test_pii_cases(spark):
    df = spark.createDataFrame([(r,) for r, *_ in CASES], ["t"])
    out = df.select(
        pii_email_count(F.col("t")).alias("e"),
        pii_ipv4_count(F.col("t")).alias("i"),
        pii_phone_count(F.col("t")).alias("p"),
        redact_pii(F.col("t")).alias("r"),
    ).collect()
    for (raw, e, i, p, red), row in zip(CASES, out):
        assert (row.e, row.i, row.p, row.r) == (e, i, p, red), raw


def test_redact_idempotent(spark):
    reds = [red for *_, red in CASES]
    df = spark.createDataFrame([(r,) for r in reds], ["t"])
    out = [r.r for r in df.select(redact_pii(F.col("t")).alias("r")).collect()]
    assert out == reds


def test_q49_native_plan(spark):
    """The whole query must stay JVM-side: no Python eval nodes."""
    from pvt_spark.queries import q49_pii_redaction

    plan = q49_pii_redaction(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_q49_matches_duckdb_oracle(spark, sf_dir):
    from pvt_spark.queries import compare_against_oracle

    res = compare_against_oracle(spark, sf_dir, names={"q49_pii_redaction"})
    assert res["q49_pii_redaction"].get("match") is True, res
