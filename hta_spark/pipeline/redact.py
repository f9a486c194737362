"""PII redaction — the C4-style scrubbing pass (emails / IPv4 / long
digit runs) every public-corpus build runs before training.

Map-only ``regexp_extract_all`` counts + sequential ``regexp_replace``
scrubs: zero shuffles, scan-bound at any corpus size (same 100 TB shape
as :mod:`.rules`).  Patterns use only literal character classes and
bounded quantifiers so Java regex (Spark) and RE2 (the DuckDB oracle)
agree match-for-match; replacement ORDER is part of the contract
(email -> IPv4 -> digit-run, applied to the running text in both
engines: a digit-run pattern applied first would eat IPv4 octets).

Counts are per-pattern matches over the ORIGINAL text (reporting), while
scrubbing is sequential (hygiene) — both deterministic, oracle-gated via
an md5 of the scrubbed text (``text_pii_scrub``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["PII_EMAIL", "PII_IPV4", "PII_DIGITS", "PII_ORDER", "pii_scrub"]

PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"     # rules.EMAIL_RE shape
PII_IPV4 = ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}")
PII_DIGITS = "[0-9]{7,}"                           # phone/account-ish runs

#: (pattern, replacement) in the order the scrub applies them
PII_ORDER = [(PII_EMAIL, "<EMAIL>"), (PII_IPV4, "<IP>"),
             (PII_DIGITS, "<ID>")]


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per document: match counts per PII class (over the original text)
    and the scrubbed text — one map-only projection."""
    t = F.col(text_col)

    def n(pattern: str):
        return F.size(F.regexp_extract_all(t, F.lit(pattern), F.lit(0)))\
            .cast("long")

    scrubbed = t
    for pattern, token in PII_ORDER:
        scrubbed = F.regexp_replace(scrubbed, pattern, token)
    return docs.select(
        F.col(id_col),
        n(PII_EMAIL).alias("n_emails"),
        n(PII_IPV4).alias("n_ipv4"),
        n(PII_DIGITS).alias("n_digit_runs"),
        scrubbed.alias("text_scrubbed"))
