"""PII detection/redaction (operators/pii.py): per-kind fixtures, a DuckDB
twin (Java-regex ∩ RE2 pattern dialect must count and rewrite identically),
and the no-Exchange plan pin."""

import duckdb
import pandas as pd
import pytest

from llmxmapreduce_spark.operators import pii

DOCS = [
    (0, "Contact jane.doe+x@example.co.uk or bob@test.org for details."),
    (1, "Call (555) 123-4567 or +1 555.987.6543 tomorrow morning."),
    (2, "Server at 192.168.1.100 and 10.0.0.1 went down."),
    (3, "SSN 123-45-6789 leaked with card 4111 1111-1111 1111."),
    (4, "Totally clean text with numbers 12345 and a date 2024-01-01."),
    (5, "mixed: a@b.io, 127.0.0.1, 987-65-4321, 555-111-2222."),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_signals_per_kind(docs_df):
    rows = {r["doc_id"]: r for r in pii.pii_signals(docs_df).collect()}
    assert rows[0]["n_email"] == 2 and rows[0]["n_pii_total"] == 2
    assert rows[1]["n_phone"] == 2
    assert rows[2]["n_ipv4"] == 2
    assert rows[3]["n_ssn"] == 1 and rows[3]["n_credit_card"] == 1
    assert rows[4]["n_pii_total"] == 0
    assert rows[5]["n_email"] == 1 and rows[5]["n_ipv4"] == 1
    assert rows[5]["n_ssn"] == 1 and rows[5]["n_phone"] >= 1


def test_redaction_replaces_with_typed_tokens(docs_df):
    out = {r["doc_id"]: r["text"] for r in pii.redact_pii(docs_df).collect()}
    assert out[0] == "Contact <email> or <email> for details."
    assert "<phone>" in out[1] and "555" not in out[1]
    assert out[2].count("<ipv4>") == 2
    assert "<ssn>" in out[3] and "<credit_card>" in out[3]
    assert out[4] == DOCS[4][1]                      # untouched
    # out_col keeps the original
    kept = pii.redact_pii(docs_df, out_col="clean").collect()[0]
    assert kept["text"] != kept["clean"] or kept["doc_id"] == 4


def test_duckdb_twin(docs_df):
    sig = pii.pii_signals(docs_df)
    red = pii.redact_pii(sig, out_col="redacted").orderBy("doc_id").collect()

    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text"])  # noqa: F841
    count_sql = ", ".join(
        f"len(regexp_extract_all(text, '{p}')) AS n_{k}"
        for k, p in pii.PII_PATTERNS.items())
    redact_expr = "text"
    for k, p in pii.PII_PATTERNS.items():
        redact_expr = (f"regexp_replace({redact_expr}, '{p}', "
                       f"'<{k}>', 'g')")
    duck = duckdb.sql(
        f"SELECT doc_id, {count_sql}, {redact_expr} AS redacted "
        f"FROM pdf ORDER BY doc_id").df()
    for i, srow in enumerate(red):
        for k in pii.PII_PATTERNS:
            assert srow[f"n_{k}"] == duck[f"n_{k}"][i], (srow["doc_id"], k)
        assert srow["redacted"] == duck["redacted"][i], srow["doc_id"]


def test_plan_is_shuffle_free(docs_df):
    out = pii.redact_pii(pii.pii_signals(docs_df))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
