"""PII detection, scrubbing and filtering for training-corpus hygiene.

Every training-data pipeline needs a pass that (a) measures how much
personally-identifiable information each document leaks, (b) redacts it
with typed placeholders, and (c) drops documents too PII-dense to
salvage. The reference has no such surface (it is a plan-interchange
library); this module is part of the beyond-reference pipeline layer,
same family as text.py / contamination.py.

Everything here is pattern-based and stays inside whole-stage codegen:
``regexp_count`` / chained ``regexp_replace`` — no UDFs, no shuffles, a
narrow map over the text column. The patterns are deliberately written
in the common subset of Java regex (Spark) and RE2 (DuckDB) — no
lookaround, no backreferences — so a DuckDB oracle replays detection
and scrubbing exactly (pinned in tests/test_pii.py).

Pattern-based PII detection is a floor, not a ceiling: it catches the
mechanically-formatted classes (emails, phone numbers, IPs, SSN-shaped
and card-shaped numbers) and deliberately does NOT guess at names or
addresses — that needs an NER model, which drops in downstream of the
same columns. False-positive direction is documented per pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered (category, pattern, placeholder). ORDER MATTERS for scrubbing:
# card-shaped numbers are matched before SSN/phone (a 16-digit card
# would otherwise be half-eaten by the phone pattern), and emails first
# (an email's local part may contain digit runs). The same order is the
# oracle's order, so the chains cannot drift.
#
# Dialect notes: non-capturing groups, \d, \b and {m,n} bounds behave
# identically in Java regex and RE2; no lookaround/backreferences.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # local@domain.tld — conservative: requires a dotted TLD of letters
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    # 4x4 digit groups, optionally space/dash separated (card-shaped;
    # no Luhn check — false-positive direction is redaction, the safe way)
    ("credit_card", r"\b(?:\d{4}[ -]?){3}\d{4}\b", "<CARD>"),
    # US SSN shape ddd-dd-dddd
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # phone: 3-3/4-4 digit groups with ., - or space separators,
    # optional +d{1,2} country prefix and (ddd) area form
    ("phone",
     r"(?:\+\d{1,2}[ .-]?)?(?:\(\d{3}\)[ .-]?|\b\d{3}[ .-])\d{3,4}[ .-]\d{4}\b",
     "<PHONE>"),
    # dotted-quad IPv4 (no range check per octet — redaction-safe)
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def _count(col: Column, pattern: str) -> Column:
    return F.regexp_count(col, F.lit(pattern)).cast("int")


def detect_pii(df: DataFrame, text_col: str = "text",
               key_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts, one ``n_<category>`` column per
    pattern plus ``n_pii`` total. Counts are over the ORIGINAL text per
    category (independent, unordered), so a string matched by two
    patterns counts in both — detection reports exposure, scrubbing
    resolves overlap by order. Narrow map, codegen, no shuffle."""
    counts = [_count(F.col(text_col), pat).alias(f"n_{name}")
              for name, pat, _ in PII_PATTERNS]
    out = df.select(F.col(key_col), *counts)
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("int"))


def scrub_pii(df: DataFrame, text_col: str = "text",
              key_col: str = "doc_id") -> DataFrame:
    """Redact PII in place: chained ``regexp_replace`` in PII_PATTERNS
    order, emitting ``(key, scrubbed text)``. Placeholders are chosen so
    no pattern matches them (idempotence: scrub(scrub(x)) == scrub(x),
    pinned in tests). Narrow map, codegen, no shuffle; at 100 TB this is
    a pure map stage with zero data movement."""
    col = F.col(text_col)
    for _, pat, placeholder in PII_PATTERNS:
        col = F.regexp_replace(col, pat, placeholder)
    return df.select(F.col(key_col), col.alias(text_col))


def filter_pii_heavy(df: DataFrame, max_hits: int = 5,
                     text_col: str = "text",
                     key_col: str = "doc_id") -> DataFrame:
    """Drop documents whose total PII count exceeds ``max_hits`` — the
    standard triage before scrubbing (a contact-list page is garbage
    even redacted). Keeps the full input row for survivors; the filter
    composes with the scan (predicate stays in the same stage as the
    read — no extra pass)."""
    total = None
    for _, pat, _ in PII_PATTERNS:
        c = _count(F.col(text_col), pat)
        total = c if total is None else total + c
    return df.filter(total <= int(max_hits))


# --- URL hygiene (same regex-battery family) --------------------------------

# common-subset URL pattern (no lookaround): scheme + non-space/quote run
URL_PATTERN = r"""https?://[^\s<>"']+"""
# capture group 1 = the host: everything after :// up to /, :, ?, or #
DOMAIN_PATTERN = r"""https?://([^/:?#\s<>"']+)"""


def url_features(df: DataFrame, text_col: str = "text",
                 key_col: str = "doc_id") -> DataFrame:
    """Per-document URL exposure: ``n_urls`` (total matches) and
    ``domains`` (sorted distinct lowercased hosts). The companion to
    :func:`detect_pii` for link-spam triage and blocklist joins. Narrow
    map, codegen, no shuffle; same Java-regex ∩ RE2 dialect subset, so
    the DuckDB replay in tests/test_pii.py is exact."""
    # r17 (guide §4 — the staging pattern): the URL scan is materialized
    # once per row in its own Project. The single-select spelling ran the
    # full-document regexp_extract_all twice per row — once (codegen) for
    # n_urls and once inside the interpreted transform island, which
    # codegen subexpression elimination cannot reach. Identical
    # arithmetic → bit-identical output (the DuckDB replay in
    # tests/test_pii.py re-pins it).
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
    staged = df.select(F.col(key_col), urls.alias("__urls"))
    domains = F.array_sort(F.array_distinct(F.transform(
        F.col("__urls"),
        lambda u: F.lower(F.regexp_extract(u, DOMAIN_PATTERN, 1)))))
    return staged.select(
        F.col(key_col),
        F.size("__urls").cast("int").alias("n_urls"),
        domains.alias("domains"),
    )


def filter_blocked_domains(df: DataFrame, blocked: list[str],
                           text_col: str = "text",
                           key_col: str = "doc_id") -> DataFrame:
    """Drop documents containing a URL whose host is a blocked domain or
    any subdomain of one (``evil.com`` blocks ``evil.com`` AND
    ``cdn.evil.com``). The blocklist ships as a plan literal (small by
    contract — thousands of entries; for a multi-million-entry blocklist
    use the bloom/broadcast-join shape of contamination.py instead).
    Keeps the full input row for survivors; pure filter, composes with
    the scan."""
    if not blocked:
        return df
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
    domains = F.transform(
        urls, lambda u: F.lower(F.regexp_extract(u, DOMAIN_PATTERN, 1)))
    blocked_arr = F.array(*[F.lit(b.lower()) for b in blocked])
    hit = F.exists(domains, lambda d: F.exists(
        blocked_arr,
        lambda b: (d == b) | d.endswith(F.concat(F.lit("."), b))))
    return df.filter(~F.coalesce(hit, F.lit(False)))
