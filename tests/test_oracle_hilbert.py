"""Guard for the q26-q28 oracles: the DuckDB unrolled 32-step Hilbert
CTE must stay bit-identical to the engine's numpy kernel. No Spark —
pure duckdb vs pvt_spark.hilbert."""

import duckdb
import numpy as np
import pandas as pd

from pvt_spark import hilbert as hb
from pvt_spark.queries import _BIAS_HUGE, _duck_hilbert_ctes


def _duck_h(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    con = duckdb.connect()
    df = pd.DataFrame(
        {
            "feature_id": np.arange(len(xs)),
            "x": xs.astype(np.int64),
            "y": ys.astype(np.int64),
        }
    )
    con.register("src", df)
    ctes, last = _duck_hilbert_ctes("SELECT feature_id, x, y FROM src")
    got = con.execute(
        f"WITH {ctes} SELECT feature_id, "
        f"CAST(d - {_BIAS_HUGE} AS BIGINT) AS h FROM {last} ORDER BY feature_id"
    ).df()
    return got["h"].to_numpy()


def test_duckdb_hilbert_matches_numpy_kernel():
    rng = np.random.RandomState(7)
    xs = np.concatenate(
        [
            rng.randint(0, 2**32, 3000).astype(np.uint64),
            np.array([0, 2**32 - 1, 1, 2**31, 2**31 - 1, 2**16], np.uint64),
        ]
    )
    ys = np.concatenate(
        [
            rng.randint(0, 2**32, 3000).astype(np.uint64),
            np.array([0, 0, 2**32 - 1, 2**31 - 1, 2**31, 2**16 - 1], np.uint64),
        ]
    )
    want = hb.h_to_signed(hb.xy2h(xs, ys, 32))
    got = _duck_h(xs, ys)
    assert (got == want).all()


def test_duckdb_hilbert_reference_goldens():
    """Reference-asserted constants (src/location.rs:237-284) through the
    SQL path: Cavallero xy and the curve corners."""
    xs = np.array([691633204, 0, 4294967295], np.uint64)
    ys = np.array([1670996018, 0, 0], np.uint64)
    got = _duck_h(xs, ys)
    want = np.array(
        [
            hb.h_to_signed(np.array([3660422102463285814], np.uint64))[0],
            -(1 << 63),  # h=0 biased
            (1 << 63) - 1,  # u64::MAX biased
        ],
        np.int64,
    )
    assert (got == want).all()


def test_q30_oracle_matches_engine_sf0001(spark):
    """q30's mixed way-compose path must hash-match its generated oracle
    (unrolled-Hilbert node h + SQL way-h ladder + kernel-pinned ring
    interior points) — the driver's q28-shaped value check for ways."""
    from pvt_spark.queries import compare_against_oracle

    res = compare_against_oracle(
        spark, "/root/testdata/sf0.001", names={"q30_way_tiles"}
    )["q30_way_tiles"]
    assert res.get("match") is True, res
