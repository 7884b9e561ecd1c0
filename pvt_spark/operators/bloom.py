"""Broadcast Bloom filter for per-batch dedup against a huge resident
corpus — the streaming-ingest primitive exact anti-joins can't give you
at 100 TB.

An exact `left_anti` against the resident key set re-scans the resident
table EVERY batch. A Bloom filter built ONCE over the resident keys
(one scan, then reused across every subsequent micro-batch) turns the
steady-state per-batch cost into a map-side bitmap probe:

- ``bloom_build``: one ``mapInPandas`` pass emits a partial bitmap per
  partition; past 32 input partitions the partials merge EXECUTOR-SIDE
  through a depth-2 tree (fan-in 32, then 1) so exactly one bitmap ever
  reaches the driver — the treeAggregate shape Scala's
  ``DataFrameStatFunctions.bloomFilter`` uses. No shuffle of the key
  rows at all; only bitmap-sized partials move.
- ``bloom_might_contain``: batch rows probe the broadcast bitmap in a
  vectorized pandas UDF — ZERO resident I/O.
- ``bloom_new_rows``: the dedup split. ``exact=False`` (steady-state
  streaming): rows whose key might be resident are dropped — bounded
  over-drop at the filter's false-positive rate, never an under-drop
  (no false negatives). ``exact=True``: might-contain candidates (an
  fpp-sized sliver of the batch) are confirmed with a real anti-join —
  byte-equal to the exact anti-join, but the resident scan is fronted
  by a candidate set ~fpp*|batch| instead of |batch|.

Hashing: key -> ``xxhash64(key)`` and ``xxhash64(key, seed=1)`` happen
JVM-side in whole-stage codegen; the k probe positions derive by
Kirsch-Mitzenmacher double hashing (h1 + i*h2 mod m) in uint64 numpy —
the Python side never touches the key bytes, only two int64 columns.

NULL keys follow SQL anti-join semantics: a NULL key never equals
anything, so NULL-keyed batch rows are always NEW and NULL-keyed
resident rows never poison the filter.

Broadcast ceiling and sharding: a single bitmap must fit the driver +
every executor once (practically a few GB; 10^9 keys at 1% fpp is
~1.2 GB). Beyond that, build a hash-prefix FAMILY with this same API:
shard s holds ``bloom_build(resident.where(pmod(xxhash64(key, 2), S)
== s), ...)`` and batch rows probe the shard ``pmod(xxhash64(key, 2),
S)`` selects. Seed 2 matters: the router must be independent of the
probe hashes — routing by seed-0 bits correlates shard membership with
probe positions and inflates fpp ~S-fold. Each shard build scans only
its slice, each broadcast stays under the ceiling, and correctness is
per-shard exactness (``test_bloom.py::test_sharded_family``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

_H1 = "__bloom_h1"
_H2 = "__bloom_h2"


@dataclass
class BloomFilter:
    """m-bit bitmap (uint64 words) + k double-hash probes. ``n_bits``
    is forced to a multiple of 64; sizing from (expected, fpp) uses the
    standard m = -n ln(p)/ln(2)^2, k = (m/n) ln 2."""

    bitmap: np.ndarray  # uint64[n_bits / 64]
    n_bits: int
    n_hashes: int

    def to_bytes(self) -> bytes:
        head = np.array([self.n_bits, self.n_hashes], dtype=np.uint64)
        return head.tobytes() + self.bitmap.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "BloomFilter":
        head = np.frombuffer(raw[:16], dtype=np.uint64)
        return cls(
            bitmap=np.frombuffer(raw[16:], dtype=np.uint64).copy(),
            n_bits=int(head[0]),
            n_hashes=int(head[1]),
        )

    @property
    def fill_ratio(self) -> float:
        return float(
            np.unpackbits(self.bitmap.view(np.uint8)).sum() / self.n_bits
        )


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(rows, k) probe positions via double hashing, all uint64."""
    i = np.arange(k, dtype=np.uint64)
    return (
        h1.astype(np.uint64)[:, None] + i[None, :] * h2.astype(np.uint64)[:, None]
    ) % np.uint64(m)


def _with_hashes(df: DataFrame, key: Column) -> DataFrame:
    return df.withColumns(
        {_H1: F.xxhash64(key), _H2: F.xxhash64(key, F.lit(1))}
    )


def bloom_build(
    resident: DataFrame,
    key: Column | str,
    expected: int | None = None,
    fpp: float = 0.01,
    n_bits: int | None = None,
    n_hashes: int | None = None,
) -> BloomFilter:
    """One scan of the resident table -> a BloomFilter over ``key``.
    Pass ``expected`` (approximate resident cardinality — an estimate
    is fine, fpp degrades gracefully) or explicit ``n_bits``/
    ``n_hashes``. NULL keys are skipped (SQL anti-join semantics)."""
    if n_bits is None:
        if expected is None:
            raise ValueError("bloom_build needs expected=N or n_bits")
        n_bits = int(-expected * math.log(fpp) / (math.log(2) ** 2))
    n_bits = max(64, (n_bits + 63) // 64 * 64)
    if n_hashes is None:
        if expected:
            k = max(1, round(n_bits / expected * math.log(2)))
        else:
            # explicit n_bits with unknown cardinality: a sane fixed
            # probe count (the ~1% operating point) instead of deriving
            # k from expected=1, which pinned it at the 16 cap and
            # inflated fpp for every legal (n_bits-only) call
            k = 7
        n_hashes = min(16, k)
    key_col = F.col(key) if isinstance(key, str) else key
    hashed = _with_hashes(
        resident.where(key_col.isNotNull()), key_col
    ).select(_H1, _H2)

    m, k = n_bits, n_hashes
    n_words = m // 64

    def partial(batches):
        bitmap = np.zeros(n_words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            pos = _positions(
                pdf[_H1].to_numpy(), pdf[_H2].to_numpy(), k, m
            ).ravel()
            np.bitwise_or.at(
                bitmap, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        if seen:
            yield pd.DataFrame({"bm": [bitmap.tobytes()]})

    def or_partials(batches):
        acc = None
        for pdf in batches:
            for raw in pdf["bm"]:
                arr = np.frombuffer(raw, dtype=np.uint64)
                acc = arr.copy() if acc is None else (acc | arr)
        if acc is not None:
            yield pd.DataFrame({"bm": [acc.tobytes()]})

    parts = hashed.mapInPandas(partial, "bm binary")
    n_input_parts = hashed.rdd.getNumPartitions()
    if n_input_parts > 32:
        # EXECUTOR-SIDE tree merge (depth 2): wide inputs yield one
        # full-size bitmap row per partition, and collecting thousands
        # of them OR'd at the driver is an OOM at resident sets of
        # 10^9+ keys (1-18 GB bitmaps). Fan the partials into <=32
        # groups, OR within each, then OR the group results in one
        # final task — the driver receives exactly ONE bitmap, same
        # shape as Scala bloomFilter's treeAggregate.
        parts = (
            parts.repartition(32)
            .mapInPandas(or_partials, "bm binary")
            .repartition(1)
            .mapInPandas(or_partials, "bm binary")
        )
    rows = parts.collect()
    bitmap = np.zeros(n_words, dtype=np.uint64)
    for r in rows:
        bitmap |= np.frombuffer(r.bm, dtype=np.uint64)
    return BloomFilter(bitmap=bitmap, n_bits=m, n_hashes=k)


def bloom_might_contain(
    df: DataFrame, key: Column | str, bloom: BloomFilter, out_col: str
) -> DataFrame:
    """Append ``out_col boolean``: key might be resident (false =
    DEFINITELY new). NULL keys probe false. Map-side only: the bitmap
    rides a broadcast, the probe is vectorized numpy per Arrow batch."""
    key_col = F.col(key) if isinstance(key, str) else key
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom.to_bytes())
    k, m = bloom.n_hashes, bloom.n_bits

    @F.pandas_udf(BooleanType())
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bf = np.frombuffer(bc.value[16:], dtype=np.uint64)
        if not len(h1):
            return pd.Series([], dtype=bool)
        pos = _positions(h1.to_numpy(), h2.to_numpy(), k, m)
        bits = (
            bf[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return pd.Series(bits.all(axis=1))

    hashed = _with_hashes(df, key_col)
    return (
        hashed.withColumn(
            out_col,
            F.when(key_col.isNull(), F.lit(False)).otherwise(
                probe(F.col(_H1), F.col(_H2))
            ),
        )
        .drop(_H1, _H2)
    )


def bloom_new_rows(
    batch: DataFrame,
    resident: DataFrame,
    key: Column | str,
    bloom: BloomFilter | None = None,
    exact: bool = True,
    expected: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Batch rows whose key is NOT in the resident corpus.

    ``exact=True``: equals ``batch LEFT ANTI JOIN resident ON key`` —
    the definitely-new majority never enters the join; only the
    might-contain sliver (true dups + ~fpp of the batch) is confirmed
    against the resident keys. ``exact=False``: drops every
    might-contain row map-side with NO resident access — the
    steady-state streaming mode, over-dropping at most ~fpp of the
    batch and never emitting a true duplicate as new.

    Pass a pre-built ``bloom`` to amortize the resident scan across
    batches (the intended streaming usage); otherwise one is built
    here (``expected`` defaults to a resident count)."""
    key_col = F.col(key) if isinstance(key, str) else key
    if bloom is None:
        if expected is None:
            expected = resident.where(key_col.isNotNull()).count()
        bloom = bloom_build(resident, key_col, expected=max(1, expected), fpp=fpp)
    flagged = bloom_might_contain(batch, key_col, bloom, "__might")
    definite_new = flagged.where(~F.col("__might")).drop("__might")
    if not exact:
        return definite_new
    res_keys = resident.select(key_col.alias("__rk")).where(
        F.col("__rk").isNotNull()
    )
    confirmed = (
        flagged.where(F.col("__might"))
        .drop("__might")
        .join(res_keys, on=key_col == F.col("__rk"), how="left_anti")
    )
    return definite_new.unionByName(confirmed)
