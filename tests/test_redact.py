"""PII redaction (pipeline/redact.py): planted PII must be counted and
scrubbed exactly, replacement order must protect IPv4 from the digit-run
pattern, and the pass must stay map-only.
"""

from __future__ import annotations

import re

from hta_spark.pipeline.redact import pii_scrub


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_planted_pii_counts_and_scrub(spark):
    docs = spark.createDataFrame(
        [(1, "mail me at jane.doe+spam@example.org or visit 10.0.0.1"),
         (2, "account 12345678 and phone 5551234567 end"),
         (3, "octets 192.168.001.200 then digits 99999999"),
         (4, "clean text with short 123 numbers only")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    r1 = got[1]
    assert (r1["n_emails"], r1["n_ipv4"], r1["n_digit_runs"]) == (1, 1, 0)
    assert r1["text_scrubbed"] == "mail me at <EMAIL> or visit <IP>"
    r2 = got[2]
    assert (r2["n_emails"], r2["n_ipv4"], r2["n_digit_runs"]) == (0, 0, 2)
    assert r2["text_scrubbed"] == "account <ID> and phone <ID> end"
    # replacement ORDER: the IPv4 (all-digit octet runs >= 7 chars with
    # dots) must become <IP>, not be chewed into <ID> fragments
    r3 = got[3]
    assert r3["n_ipv4"] == 1
    assert r3["text_scrubbed"] == "octets <IP> then digits <ID>"
    r4 = got[4]
    assert (r4["n_emails"], r4["n_ipv4"], r4["n_digit_runs"]) == (0, 0, 0)
    assert r4["text_scrubbed"] == docs.filter("doc_id = 4") \
        .collect()[0]["text"]


def test_pii_scrub_map_only(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = _plan(pii_scrub(docs))
    assert not re.search(r"\bExchange\b", plan), plan[:2000]
