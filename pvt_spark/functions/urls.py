"""URL canonicalization for web-corpus dedup (pure native SQL).

The classic precursor to content dedup on Common-Crawl-style corpora:
the same page is crawled as ``HTTPS://WWW.Site.COM:443/p/?utm_source=x``
and ``https://site.com/p`` — canonicalizing before the URL-level
groupBy collapses those variants without touching page bytes. Entirely
``regexp_replace``/``lower``/``substring`` composition: whole-stage
codegen, no Python in the hot path, trivially scale-safe (per-row map).

Rules applied (order matters):
1. strip the fragment (``#...``)
2. lowercase scheme + authority (path/query case is significant)
3. drop a ``www.`` host prefix
4. drop explicit default ports ``:80`` / ``:443``
5. drop ``utm_*`` tracking parameters (and their separators) —
   anchored to a ``?``/``&`` parameter boundary so a ``utm_``
   substring mid-path or inside another parameter's name/value is
   never touched (``?xutm_a=1&b=2`` keeps both params)
6. strip a trailing ``?`` or ``/``

Certified value-exact against a DuckDB oracle running the same
expression chain (q38; regexps stay in the common Java-regex/RE2
subset, no backreferences — DuckDB's replacement dialect differs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://authority (everything before the first / or ?)
_HEAD_RE = "^([A-Za-z]+://[^/?]*)"


def canonical_url(url: Column) -> Column:
    u1 = F.regexp_replace(url, "#.*", "")
    head = F.lower(F.regexp_extract(u1, _HEAD_RE, 1))
    # rest = everything after the head, sliced by the head's length
    # (same construction the oracle uses; one regex dialect surface)
    rest = u1.substr(
        F.length(F.regexp_extract(u1, _HEAD_RE, 1)) + F.lit(1),
        F.length(u1),
    )
    head = F.regexp_replace(head, "://www\\.", "://")
    head = F.regexp_replace(head, ":(80|443)$", "")
    # boundary-anchored; (utm_[^&]*&)+ eats runs of consecutive utm
    # params in one match (the consumed '&' would otherwise hide the
    # boundary of the next one from a single-param pattern)
    rest = F.regexp_replace(rest, "([?&])(utm_[^&]*&)+", "$1")
    rest = F.regexp_replace(rest, "[?&]utm_[^&]*$", "")
    rest = F.regexp_replace(rest, "\\?&", "?")
    rest = F.regexp_replace(rest, "[?/]+$", "")
    return F.concat(head, rest)
