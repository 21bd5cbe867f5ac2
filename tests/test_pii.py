"""PII detection / scrubbing / filtering (operators/pii.py): planted
ground truth, DuckDB full-replay oracles for detect AND scrub (the
patterns live in the Java-regex ∩ RE2 dialect subset — the replay test
is what keeps them there), idempotence, and plan-shape gates."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_substrait_spark.operators import pii


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, "contact alice@example.com or bob.smith+tag@sub.domain.org now"),
        (2, "call 555-867-5309 or +1 (415) 555-0133 after hours"),
        (3, "server at 192.168.1.254 and 10.0.0.1 responded"),
        (4, "ssn 123-45-6789 leaked with card 4111 1111 1111 1111"),
        (5, "clean document with no identifiers at all"),
        (6, "card 4111-1111-1111-1111 and bare 4111111111111111 too"),
        (7, ""),
        (8, "v1.2.3.4 is a version but 1.2.3.4 looks dotted-quad"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_detect_planted_counts(planted):
    got = {r.doc_id: r.asDict() for r in pii.detect_pii(planted).collect()}
    assert got[1]["n_email"] == 2 and got[1]["n_pii"] == 2
    assert got[2]["n_phone"] == 2 and got[2]["n_pii"] == 2
    assert got[3]["n_ipv4"] == 2 and got[3]["n_pii"] == 2
    assert got[4]["n_ssn"] == 1 and got[4]["n_credit_card"] == 1
    assert got[5]["n_pii"] == 0
    assert got[6]["n_credit_card"] == 2
    assert got[7]["n_pii"] == 0
    # "v1.2.3.4" has no word boundary before the 1 (v and 1 are both
    # word chars) so only the bare "1.2.3.4" matches
    assert got[8]["n_ipv4"] == 1


def test_scrub_planted(planted):
    got = {r.doc_id: r.text for r in pii.scrub_pii(planted).collect()}
    assert got[1] == "contact <EMAIL> or <EMAIL> now"
    assert got[2] == "call <PHONE> or <PHONE> after hours"
    assert got[3] == "server at <IP> and <IP> responded"
    assert got[4] == "ssn <SSN> leaked with card <CARD>"
    assert got[5] == "clean document with no identifiers at all"
    assert got[6] == "card <CARD> and bare <CARD> too"
    assert got[7] == ""


def test_scrub_is_idempotent(planted):
    once = pii.scrub_pii(planted)
    twice = pii.scrub_pii(once)
    a = sorted((r.doc_id, r.text) for r in once.collect())
    b = sorted((r.doc_id, r.text) for r in twice.collect())
    assert a == b


def test_filter_pii_heavy(planted):
    kept = {r.doc_id for r in pii.filter_pii_heavy(planted, max_hits=1).collect()}
    # docs with >1 hit drop: 1 (2 emails), 2, 3, 4 (ssn+card), 6; doc 8
    # has exactly one IP hit and stays
    assert kept == {5, 7, 8}
    kept0 = {r.doc_id for r in pii.filter_pii_heavy(planted, max_hits=0).collect()}
    assert kept0 == {5, 7}


def test_detect_and_scrub_match_duckdb_replay(spark, tables):
    """Full-corpus DuckDB replay of BOTH operators over the documents
    table — the dialect-subset guarantee, enforced."""
    from tests.conftest import SF_DIR

    docs = tables["documents"].select("doc_id", "text")
    docs_pq = os.path.join(SF_DIR, "documents.parquet")

    got_detect = {r.doc_id: (r.n_email, r.n_credit_card, r.n_ssn,
                             r.n_phone, r.n_ipv4, r.n_pii)
                  for r in pii.detect_pii(docs).collect()}
    count_sql = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INT) AS n_{name}"
        for name, pat, _ in pii.PII_PATTERNS)
    rows = duckdb.sql(f"""
        SELECT doc_id, {count_sql}
        FROM '{docs_pq}'
    """).fetchall()
    expect = {r[0]: (*r[1:], sum(r[1:])) for r in rows}
    assert got_detect == expect and len(expect) > 0

    got_scrub = {r.doc_id: r.text for r in pii.scrub_pii(docs).collect()}
    scrub_expr = "text"
    for _, pat, repl in pii.PII_PATTERNS:
        scrub_expr = f"regexp_replace({scrub_expr}, '{pat}', '{repl}', 'g')"
    rows = duckdb.sql(
        f"SELECT doc_id, {scrub_expr} AS t FROM '{docs_pq}'").fetchall()
    assert got_scrub == {r[0]: r[1] for r in rows}


def test_pii_plan_is_narrow(planted):
    """No shuffle, no Python: detection and scrubbing are pure map
    stages (at 100 TB these run at scan speed)."""
    for df in (pii.detect_pii(planted), pii.scrub_pii(planted),
               pii.filter_pii_heavy(planted)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:400]
        assert "Python" not in plan, plan[:400]


# --- URL hygiene --------------------------------------------------------------

@pytest.fixture(scope="module")
def url_docs(spark):
    rows = [
        (1, "see https://evil.com/page and http://cdn.evil.com:8080/x?q=1"),
        (2, 'links: https://good.org/a "https://Good.ORG/b" end'),
        (3, "no links here"),
        (4, "sneaky https://notevil.com/ok and https://evil.community/x"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_url_features_planted(url_docs):
    got = {r.doc_id: (r.n_urls, list(r.domains))
           for r in pii.url_features(url_docs).collect()}
    assert got[1] == (2, ["cdn.evil.com", "evil.com"])
    assert got[2] == (2, ["good.org"])   # case-folded, distinct
    assert got[3] == (0, [])
    assert got[4] == (2, ["evil.community", "notevil.com"])
    assert got[5] == (0, [])


def test_filter_blocked_domains(url_docs):
    kept = {r.doc_id for r in pii.filter_blocked_domains(
        url_docs, ["evil.com"]).collect()}
    # evil.com and its subdomain cdn.evil.com block doc 1; notevil.com
    # and evil.community must NOT match (suffix-with-dot semantics)
    assert kept == {2, 3, 4, 5}
    kept2 = {r.doc_id for r in pii.filter_blocked_domains(
        url_docs, ["good.org", "evil.community"]).collect()}
    assert kept2 == {1, 3, 5}
    # empty blocklist is a no-op
    assert pii.filter_blocked_domains(url_docs, []).count() == 5


def test_url_features_matches_duckdb_replay(spark, tables):
    import os

    from tests.conftest import SF_DIR

    docs = tables["documents"].select("doc_id", "text")
    got = {r.doc_id: (r.n_urls, list(r.domains))
           for r in pii.url_features(docs).collect()}
    docs_pq = os.path.join(SF_DIR, "documents.parquet")
    url_sql = pii.URL_PATTERN.replace("'", "''")
    dom_sql = pii.DOMAIN_PATTERN.replace("'", "''")
    rows = duckdb.sql(f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{url_sql}')) AS INT)
                   AS n_urls,
               list_sort(list_distinct(list_transform(
                   regexp_extract_all(text, '{url_sql}'),
                   u -> lower(regexp_extract(u, '{dom_sql}', 1)))))
                   AS domains
        FROM '{docs_pq}'
    """).fetchall()
    expect = {r[0]: (r[1], list(r[2])) for r in rows}
    assert got == expect and len(expect) > 0
