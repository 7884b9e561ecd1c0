"""PII detection + redaction for web-corpus curation (pure native SQL).

The standard pre-training scrub step (C4, RefinedWeb §2.4, Dolma): find
and mask e-mail addresses, IPv4 addresses, and NANP-style phone numbers
before a corpus ships. Both the per-document counts and the redacted
text are plain ``regexp_extract_all`` / ``regexp_replace`` column
expressions — whole-stage codegen, no Python in the hot path, per-row
map with zero shuffle: the 100 TB shape is "free" (it rides whatever
scan already touches the text column).

The three patterns stay inside the common Java-regex/RE2 subset (ASCII
character classes, bounded quantifiers, ``\\b`` word boundaries; no
lookaround, no backreferences) so the identical pattern strings run in
DuckDB for the q49 value oracle.

Redaction order is part of the contract: e-mail first (its local part
may contain digits/dots an IP or phone pattern could nibble), then
IPv4, then phone. The oracle mirrors the same order.

No counterpart in the reference repo (it has no text-curation surface);
this is part of the web-corpus operator family layered on the engine
(cf. ``functions/urls.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# user@host.tld — local part per RFC-ish practical subset
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# dotted quad; \b keeps it off longer digit runs (1.2.3.4.5 still
# matches a window — mirrored verbatim in the oracle, so exactness
# is shared, not pattern perfection)
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# NANP 555-123-4567 shape
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_email_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))).cast("long")


def pii_ipv4_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), F.lit(0))).cast("long")


def pii_phone_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), F.lit(0))).cast("long")


def redact_pii(text: Column) -> Column:
    """Mask all three PII classes (e-mail -> IPv4 -> phone, in that
    order — the order is observable when patterns overlap and the
    oracle replays it exactly)."""
    r = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    r = F.regexp_replace(r, IPV4_RE, IPV4_TOKEN)
    return F.regexp_replace(r, PHONE_RE, PHONE_TOKEN)
