"""Versioned, byte-deterministic HTML -> text extraction.

Per-row invariant (BASELINE.json input_hint): the extracted text for a
given url must be byte-identical across runs and cluster sizes. The
extractor is therefore a single pure function, versioned, with no
locale/environment dependence, applied via an Arrow-batched pandas UDF
(never per-row Python in the Spark plan).

Extraction semantics (EXTRACTOR_VERSION 1):
  1. UTF-8 decode (errors=replace)
  2. drop <script>...</script> and <style>...</style> blocks
  3. every remaining tag becomes a newline
  4. HTML entities unescaped
  5. lines stripped; empty lines dropped; joined with "\n"
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

EXTRACTOR_VERSION = 1

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1>")
_TAG_RE = re.compile(r"<[^>]*>")


def extract_text(html: bytes | str) -> str:
    """Pure extraction function — THE invariant. Do not change without
    bumping EXTRACTOR_VERSION."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = _SCRIPT_RE.sub("\n", s)
    s = _TAG_RE.sub("\n", s)
    s = _htmllib.unescape(s)
    lines = [ln.strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


@F.pandas_udf(StringType())
def _extract_udf(html: pd.Series) -> pd.Series:
    # pandas .map over a batch: the regexes run in C; the Python glue is
    # per-batch, amortized by Arrow transfer. Heavy lifting is re/str.
    return html.map(extract_text)


def extract_text_col(html: Column) -> Column:
    return _extract_udf(html)


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> + extracted_text + extractor_version."""
    return pages.withColumn("extracted_text", extract_text_col(F.col("html"))).withColumn(
        "extractor_version", F.lit(EXTRACTOR_VERSION)
    )


def verify_extraction(pages: DataFrame) -> DataFrame:
    """Rows where extraction does NOT byte-match the recorded text column
    (must be empty on the synthetic fixture — tested)."""
    out = extract_pages(pages)
    return out.where(F.col("extracted_text") != F.col("text"))
