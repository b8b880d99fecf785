"""Unit tests for operators/redact.py: known-answer PII fixtures, count
semantics (original text), sequential redaction order (most-specific wins),
and replacement-token inertness."""

from __future__ import annotations

from java9_gc_log_parser_spark.operators.redact import PII_PATTERNS, redact

SCHEMA = "doc_id long, text string"


def _one(spark, text):
    [row] = redact(spark.createDataFrame([(0, text)], SCHEMA)).collect()
    return row


def test_email_count_and_redaction(spark):
    r = _one(spark, "mail alice@example.com or bob.smith+x@sub.domain.org now")
    assert r.n_email == 2
    assert r.redacted_text == "mail <EMAIL> or <EMAIL> now"


def test_ssn_redacted_before_phone_can_match(spark):
    # an SSN is also a phone-shaped digit run; counts see the original text
    # for BOTH patterns, but redaction order makes <SSN> win the rewrite
    r = _one(spark, "ssn 123-45-6789 end")
    assert r.n_ssn == 1
    assert r.n_phone == 1  # counted on the original text
    assert r.redacted_text == "ssn <SSN> end"


def test_ipv4_and_phone(spark):
    r = _one(spark, "host 192.168.0.1 call +1 (555) 123-4567 done")
    assert r.n_ipv4 == 1
    assert r.n_phone == 1
    assert r.redacted_text == "host <IPV4> call <PHONE> done"


def test_clean_text_untouched(spark):
    text = "the fast key order sort table scan merge"
    r = _one(spark, text)
    assert (r.n_email, r.n_ssn, r.n_ipv4, r.n_phone) == (0, 0, 0, 0)
    assert r.redacted_text == text


def test_replacement_tokens_are_inert(spark):
    # no pattern may match any replacement token, or redaction would cascade
    tokens = " ".join(f"<{name.upper()}>" for name, _ in PII_PATTERNS)
    r = _one(spark, tokens)
    assert r.redacted_text == tokens


def test_custom_deny_pattern(spark):
    pats = PII_PATTERNS + (("deny", r"\bcustomer\b"),)
    df = spark.createDataFrame([(1, "a customer record")], SCHEMA)
    [r] = redact(df, pats).collect()
    assert r.n_deny == 1
    assert r.redacted_text == "a <DENY> record"
