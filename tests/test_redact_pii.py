"""PII redaction: rewrite + counts vs an independent Python-re oracle,
pattern precision probes (things that must NOT match), passthrough
columns, and unknown-kind rejection.
"""

import re

import pytest

from nexlt_spark.ops.ingest import PII_PATTERNS, redact_pii

CASES = [
    (0, "contact me at jane.doe+spam@example.co.uk for details", "en"),
    (1, "server at 10.0.0.1 and 192.168.255.3 responded", "en"),
    (2, "call +1 (555) 123-4567 or +44 20 7946 0958 now", "en"),
    (3, "mixed: bob@corp.io from 8.8.8.8 dialed +33612345678", "en"),
    (4, "no pii here, just text about spark joins", "en"),
    (5, None, "de"),
    # precision probes — none of these may be redacted:
    (6, "version 1.2.3.4000 released; pi is 3.14159; x@ alone", "en"),
    (7, "totals were 12345678901 units in 2024", "en"),  # bare digits ≠ phone
    # overlap discriminator: the email consumes the leading '+', so the
    # phone pattern must see the already-scrubbed text and count 0 —
    # counts always equal emitted placeholders (sequential semantics)
    (8, "reach +12345678901@relay.sms.com today", "en"),
]


def _oracle(text):
    if text is None:
        # NULL text stays NULL (zero counts) — redaction must not turn
        # missing text into empty text
        return None, {f"n_{k}": 0 for k in ("email", "ipv4", "phone")}
    out = text
    counts = {}
    for k in ("email", "ipv4", "phone"):
        pat = PII_PATTERNS[k]
        counts[f"n_{k}"] = len(re.findall(pat, out))
        out = re.sub(pat, f"<{k.upper()}>", out)
    return out, counts


def test_redaction_matches_re_oracle(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert len(got) == len(CASES)
    for doc_id, text, lang in CASES:
        want_text, want_counts = _oracle(text)
        r = got[doc_id]
        assert r["text"] == want_text, (doc_id, r["text"])
        for k, v in want_counts.items():
            assert r[k] == v, (doc_id, k)
        assert r["lang"] == lang  # non-text columns pass through


def test_specific_redactions(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[0]["text"] == "contact me at <EMAIL> for details"
    assert got[0]["n_email"] == 1
    assert got[1]["text"] == "server at <IPV4> and <IPV4> responded"
    assert got[2]["n_phone"] == 2
    assert {"n_email": 1, "n_ipv4": 1, "n_phone": 1}.items() <= got[3].asDict().items()
    # precision probes: untouched
    assert got[6]["text"] == CASES[6][1]
    assert got[7]["text"] == CASES[7][1]
    assert got[5]["text"] is None  # null text stays null, zero counts
    assert got[5]["n_email"] == 0
    # the swallowed phone is counted as the email that consumed it
    assert got[8]["text"] == "reach <EMAIL> today"
    assert got[8]["n_email"] == 1 and got[8]["n_phone"] == 0


def test_kind_subset_and_unknown(spark):
    df = spark.createDataFrame(CASES[:1], "doc_id long, text string, lang string")
    out = redact_pii(df, kinds=("email",))
    assert set(out.columns) == {"doc_id", "lang", "text", "n_email"}
    with pytest.raises(ValueError):
        redact_pii(df, kinds=("email", "ssn"))
