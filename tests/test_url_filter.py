"""URL/domain filtering (operators/url_filter.py): host/suffix parsing,
subdomain blocklisting, canonical-URL dedup, badword page gate — with an
exact DuckDB twin for the canonicalization and plan pins."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators import url_filter as uf


def test_host_and_suffixes(spark):
    df = spark.createDataFrame(
        [(1, "https://News.Example.COM/a/b?q=1"),
         (2, "http://user:pw@sub.site.org:8080/x"),
         (3, "not a url"),
         (4, None)],
        "doc_id bigint, url string")
    got = {r["doc_id"]: (r["h"], r["s"]) for r in df.select(
        "doc_id", uf.url_host(F.col("url")).alias("h"),
        uf.domain_suffixes(uf.url_host(F.col("url"))).alias("s")).collect()}
    assert got[1] == ("news.example.com",
                      ["news.example.com", "example.com", "com"])
    assert got[2] == ("sub.site.org", ["sub.site.org", "site.org", "org"])
    assert got[3] == ("", [])
    assert got[4][0] is None or got[4][0] == ""


def test_filter_blocked_domains(spark):
    df = spark.createDataFrame(
        [(1, "https://spam.example.com/page"),       # subdomain of blocked
         (2, "https://example.com/else"),            # exactly blocked
         (3, "https://fine.org/x"),
         (4, "https://notexample.com/x"),            # NOT a suffix match
         (5, "garbage")],                            # unparseable: kept
        "doc_id bigint, url string")
    blocked = spark.createDataFrame([("example.com",), ("bad.net",)],
                                    "domain string")
    kept = sorted(r["doc_id"] for r in
                  uf.filter_blocked_domains(df, blocked).collect())
    assert kept == [3, 4, 5]
    plan = uf.filter_blocked_domains(df, blocked) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan


def test_canonical_url_and_dedup(spark):
    rows = [
        (1, "HTTPS://Example.com:443/Path/?utm_source=x&id=3#frag"),
        (2, "https://example.com/Path/?id=3"),          # same canonical
        (3, "https://example.com/Path/?id=4"),          # different query
        (4, "http://example.com:80/"),
        (5, "http://example.com"),                      # same as 4
        (6, "http://example.com:8080/"),                # nonstandard port
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    canon = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", uf.canonical_url(F.col("url")).alias("c")).collect()}
    assert canon[1] == canon[2] == "https://example.com/Path?id=3"
    assert canon[4] == canon[5] == "http://example.com"
    assert canon[6] == "http://example.com:8080"
    kept = sorted(r["doc_id"] for r in uf.dedup_urls(df).collect())
    assert kept == [1, 3, 4, 6]


_TWIN = r"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  regexp_replace(
    lower(regexp_extract(regexp_replace(url, '#.*$', ''),
                         '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)) ||
    regexp_replace(regexp_replace(url, '#.*$', ''),
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
    '^(https://[^/:?#]+):443$', '\1'),
    '^(https://[^/:?#]+):443([/?#])', '\1\2'),
    '^(http://[^/:?#]+):80$', '\1'),
    '^(http://[^/:?#]+):80([/?#])', '\1\2'),
    '&(utm_[a-z]+|gclid|fbclid)=[^&#]*', ''),
    '\?(utm_[a-z]+|gclid|fbclid)=[^&#]*&', '?'),
    '\?(utm_[a-z]+|gclid|fbclid)=[^&#]*$', ''),
    '/+\?', '?'),
    '/+$', '') AS canon
FROM urls_pdf ORDER BY doc_id
"""


def test_canonical_url_duckdb_twin(spark):
    rows = [
        (1, "HTTPS://Example.com:443/Path/?utm_source=x&id=3#frag"),
        (2, "https://example.com/Path/?id=3"),
        (3, "http://A.B.c:80/q?gclid=z&utm_campaign=w&keep=1"),
        (4, "https://x.org:8443/p/"),
        (5, "ftp://Files.example.net/dir/"),
        (6, "https://example.com/?fbclid=abc"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", uf.canonical_url(F.col("url")).alias("c")).collect()}
    urls_pdf = pd.DataFrame(rows, columns=["doc_id", "url"])  # noqa: F841
    duck = dict(duckdb.sql(_TWIN).fetchall())
    assert got == duck


def test_blocklist_bypass_repros(spark):
    """Review repros: (a) an '@' in a path-less URL's query must not
    hijack the host; (b) a host with more labels than max_labels must
    still match its registrable suffix (first-labels truncation let
    subdomain-stuffing evade any blocklist)."""
    df = spark.createDataFrame(
        [(1, "https://ads.spam.org?contact=admin@friendly.org"),
         (2, "https://a.b.c.d.e.f.g.h.i.j.k.blocked.net/x"),
         (3, "https://friendly.org/mail?to=x@spam.org")],
        "doc_id bigint, url string")
    hosts = {r["doc_id"]: r["h"] for r in
             df.select("doc_id", uf.url_host(F.col("url")).alias("h"))
             .collect()}
    assert hosts[1] == "ads.spam.org"
    assert hosts[3] == "friendly.org"
    blocked = spark.createDataFrame([("spam.org",), ("blocked.net",)],
                                    "domain string")
    kept = sorted(r["doc_id"] for r in
                  uf.filter_blocked_domains(df, blocked).collect())
    assert kept == [3]


def test_canonical_url_path_ampersand(spark):
    """Review repro: '&ref=' inside a PATH segment (legal per RFC 3986)
    must survive canonicalization — only query params are tracking."""
    df = spark.createDataFrame(
        [(1, "https://x.com/a&ref=1"), (2, "https://x.com/a"),
         (3, "https://x.com/a?b=2&ref=1")],
        "doc_id bigint, url string")
    canon = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", uf.canonical_url(F.col("url")).alias("c")).collect()}
    assert canon[1] == "https://x.com/a&ref=1"
    assert canon[1] != canon[2]
    # `ref` is semantic by default (GitHub ?ref=<branch>) — NOT stripped
    assert canon[3] == "https://x.com/a?b=2&ref=1"


def test_canonical_url_ref_opt_in(spark):
    """`ref` is kept by default (semantic on many sites) but strippable
    via tracking_re=TRACKING_WITH_REF for corpora where it IS tracking."""
    df = spark.createDataFrame(
        [(1, "https://g.com/repo?ref=main"),
         (2, "https://g.com/repo?ref=dev"),
         (3, "https://news.site/x?utm_source=tw&ref=newsletter")],
        "doc_id bigint, url string")
    default = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", uf.canonical_url(F.col("url")).alias("c")).collect()}
    assert default[1] == "https://g.com/repo?ref=main"
    assert default[1] != default[2]          # distinct branches survive
    assert default[3] == "https://news.site/x?ref=newsletter"
    opted = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", uf.canonical_url(
            F.col("url"), tracking_re=uf.TRACKING_WITH_REF).alias("c"))
        .collect()}
    assert opted[1] == opted[2] == "https://g.com/repo"
    assert opted[3] == "https://news.site/x"
    # and dedup under the default keeps both branch pages
    assert sorted(r["doc_id"] for r in uf.dedup_urls(df).collect()) \
        == [1, 2, 3]
    assert sorted(r["doc_id"] for r in uf.dedup_urls(
        df, tracking_re=uf.TRACKING_WITH_REF).collect()) == [1, 3]


def test_dedup_urls_null_exempt(spark):
    """Review repro: null/unparseable-to-null URLs all shared the null
    partition key — every null-URL doc collapsed to one survivor.  Nulls
    must be exempt from URL dedup (each keeps its own row)."""
    df = spark.createDataFrame(
        [(1, "https://x.com/a"), (2, "https://x.com/a"),
         (3, None), (4, None), (5, ""), (6, None)],
        "doc_id bigint, url string")
    kept = sorted(r["doc_id"] for r in uf.dedup_urls(df).collect())
    assert kept == [1, 3, 4, 5, 6]


def test_badwords_filter(spark):
    df = spark.createDataFrame(
        [(1, "a perfectly Clean page about rivers"),
         (2, "contains the badword Heck in running text"),
         (3, "has the exact phrase darn it somewhere"),
         (4, "darn alone is fine (only the phrase is listed)"),
         (5, "heckler is NOT a whole-token match at all"),
         (6, None),
         (7, "a darn iteration counter"),      # NOT the phrase 'darn it'
         (8, "ends with darn\tit happened")],  # tab-separated phrase IS
        "doc_id bigint, text string")
    bad = spark.createDataFrame([("heck",), ("darn it",)], "word string")
    kept = sorted(r["doc_id"] for r in
                  uf.badwords_filter(df, bad).collect())
    assert kept == [1, 4, 5, 6, 7]
    plan = uf.badwords_filter(df, bad) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
