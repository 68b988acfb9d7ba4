"""Connector adapters (sources/connectors.py) with canned transports —
construction, parameter spelling, payload parsing, env dispatch.  No
network; the live urllib transport is never invoked here."""

import pytest

from llmxmapreduce_spark.sources import connectors as cx


def test_serpapi_param_spellings_per_engine():
    calls = []

    def canned(url, params, headers):
        calls.append((url, params))
        return {"organic_results": [
            {"link": "https://a.example/x", "title": "A", "snippet": "sa"},
            {"link": "https://b.example/y", "title": "B"},
        ]}

    s = cx.SerpApiSearch(api_key="k", engine="google",
                         each_query_result=7, filter_date="01/01/2024",
                         transport=canned)
    out = s('"quoted query"')
    assert out == [
        {"url": "https://a.example/x", "title": "A", "snippet": "sa"},
        {"url": "https://b.example/y", "title": "B", "snippet": ""},
    ]
    url, params = calls[0]
    assert url == cx.SerpApiSearch.ENDPOINT
    assert params["q"] == "quoted query"          # quotes stripped
    assert params["num"] == 7 and params["google_domain"] == "google.com"
    assert params["tbs"] == "cdr:1,cd_min:01/01/2024"

    # baidu spells the count 'rn' and the date filter 'gpc'
    cx.SerpApiSearch(api_key="k", engine="baidu", each_query_result=3,
                     filter_date="d", transport=canned)("q")
    assert calls[-1][1]["rn"] == 3
    assert calls[-1][1]["gpc"] == "cdr:1,cd_min:d"
    # bing-via-serpapi spells them 'count' / 'filters'
    cx.SerpApiSearch(api_key="k", engine="bing", each_query_result=5,
                     filter_date="d", transport=canned)("q")
    assert calls[-1][1]["count"] == 5
    assert calls[-1][1]["filters"] == "cdr:1,cd_min:d"


def test_serpapi_no_results_raises_with_date_hint():
    s = cx.SerpApiSearch(api_key="k", transport=lambda u, p, h: {})
    with pytest.raises(RuntimeError, match="less restrictive"):
        s("nothing")
    s2 = cx.SerpApiSearch(api_key="k", filter_date="01/01/2024",
                          transport=lambda u, p, h: {})
    with pytest.raises(RuntimeError, match="date=01/01/2024"):
        s2("nothing")


def test_serpapi_rejects_unknown_engine_and_missing_key(monkeypatch):
    monkeypatch.delenv("SERP_API_KEY", raising=False)
    with pytest.raises(ValueError, match="SERP_API_KEY"):
        cx.SerpApiSearch(api_key=None)
    with pytest.raises(ValueError, match="unsupported engine"):
        cx.SerpApiSearch(api_key="k", engine="altavista")


def test_bing_v7_header_params_and_parse():
    calls = []

    def canned(url, params, headers):
        calls.append((url, params, headers))
        return {"webPages": {"value": [
            {"name": "Page", "url": "https://p.example", "snippet": "s"},
        ]}}

    b = cx.BingV7Search(subscription_key="sk", each_query_result=4,
                        transport=canned)
    out = b('"hello"')
    assert out == [{"url": "https://p.example", "title": "Page",
                    "snippet": "s"}]
    url, params, headers = calls[0]
    assert url.endswith("/v7.0/search")
    assert params == {"q": "hello", "mkt": "zh-CN", "count": 4}
    assert headers == {"Ocp-Apim-Subscription-Key": "sk"}

    empty = cx.BingV7Search(subscription_key="sk",
                            transport=lambda u, p, h: {"webPages": {}})
    with pytest.raises(RuntimeError, match="No results"):
        empty("q")


def test_http_fetch_size_guard():
    f = cx.HttpFetch(max_bytes=10, transport=lambda u, p, h: "x" * 11)
    with pytest.raises(ValueError, match="max_bytes"):
        f("https://big.example")
    ok = cx.HttpFetch(max_bytes=10, transport=lambda u, p, h: "tiny")
    assert ok("https://small.example") == "tiny"


def test_search_from_env_dispatch(monkeypatch):
    monkeypatch.delenv("SERP_API_KEY", raising=False)
    monkeypatch.delenv("BING_SEARCH_V7_SUBSCRIPTION_KEY", raising=False)
    with pytest.raises(ValueError, match="No valid search engine key"):
        cx.search_from_env()
    monkeypatch.setenv("BING_SEARCH_V7_SUBSCRIPTION_KEY", "bk")
    assert isinstance(cx.search_from_env(), cx.BingV7Search)
    monkeypatch.setenv("SERP_API_KEY", "sk")     # SerpAPI takes precedence
    assert isinstance(cx.search_from_env(), cx.SerpApiSearch)


def test_adapters_satisfy_the_searchfn_seam_shape():
    """The crawl source consumes list[{url,title,snippet}] — pin the
    adapter output to that contract (sources/crawl.py SEARCH_RESULT)."""
    s = cx.SerpApiSearch(api_key="k", transport=lambda u, p, h: {
        "organic_results": [{"link": "u", "title": "t", "snippet": "s"}]})
    (hit,) = s("q")
    assert set(hit) == {"url", "title", "snippet"}
