"""Geo-parse extracted page text into point features (S3/O3 analog).

Finds ``geo:<lat>,<lon>`` mentions (7-decimal fixed-point degrees) in
the extracted text and emits one point row per mention with exact dm7
integer coordinates plus the zoom-32 Hilbert key.

All parsing is vectorized: pandas ``str.extractall`` (C regex engine)
inside ``mapInPandas``; Hilbert encode is the numpy kernel. The output
carries provenance (url, mention_idx) per the lineage requirement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import hilbert as hb

GEO_RE = r"geo:(-?\d+\.\d{7}),(-?\d+\.\d{7})"

POINTS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("mention_idx", IntegerType(), False),
        StructField("lon_dm7", IntegerType(), False),
        StructField("lat_dm7", IntegerType(), False),
        StructField("h", LongType(), False),
    ]
)


def _geotag_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    hits = pdf["text"].str.extractall(GEO_RE)
    if hits.empty:
        return pd.DataFrame(
            {
                "url": pd.Series(dtype="object"),
                "mention_idx": pd.Series(dtype="int32"),
                "lon_dm7": pd.Series(dtype="int32"),
                "lat_dm7": pd.Series(dtype="int32"),
                "h": pd.Series(dtype="int64"),
            }
        )
    row_idx = hits.index.get_level_values(0)
    mention_idx = hits.index.get_level_values(1).to_numpy(dtype=np.int32)
    # %.7f decimals -> exact dm7 ints via round (values are 7-decimal exact)
    lat_dm7 = np.round(hits[0].to_numpy(dtype=np.float64) * 1e7).astype(np.int64)
    lon_dm7 = np.round(hits[1].to_numpy(dtype=np.float64) * 1e7).astype(np.int64)
    h = hb.lonlat_to_signed_h(lon_dm7, lat_dm7)
    return pd.DataFrame(
        {
            "url": pdf["url"].to_numpy()[row_idx],
            "mention_idx": mention_idx,
            "lon_dm7": lon_dm7.astype(np.int32),
            "lat_dm7": lat_dm7.astype(np.int32),
            "h": h,
        }
    )


def pages_to_points(pages: DataFrame) -> DataFrame:
    """FUSED extract + geotag: html -> text -> mentions -> dm7 -> h in ONE
    Python pass.

    Chaining extract_pages() and geotag() as separate nodes ships the
    full html/text payload Python->JVM->Python through Arrow twice; in
    local mode it also doubles the Python worker count per task. The
    fused kernel reads (url, html), runs the SAME versioned extractor
    (byte-identity tested separately), and emits only the small point
    rows. Column pruning reaches the scan: only url+html are read.
    """
    from .extract import extract_text

    slim = pages.select("url", "html")

    def run(batches):
        for pdf in batches:
            text = pdf["html"].map(extract_text)
            yield _geotag_batch(pd.DataFrame({"url": pdf["url"], "text": text}))

    return slim.mapInPandas(run, POINTS_SCHEMA)


def geotag(pages_with_text: DataFrame, text_col: str = "extracted_text") -> DataFrame:
    """(url, <text_col>) -> points(url, mention_idx, lon_dm7, lat_dm7, h).

    Column-pruned input (url + text only) so the parquet scan never
    reads html binary for this stage.
    """
    slim = pages_with_text.select(F.col("url"), F.col(text_col).alias("text"))

    def run(batches):
        for pdf in batches:
            yield _geotag_batch(pdf)

    return slim.mapInPandas(run, POINTS_SCHEMA)
