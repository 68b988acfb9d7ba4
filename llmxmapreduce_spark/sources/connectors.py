"""Optional REAL-WORLD connector adapters for the SearchFn/FetchFn seams.

The engine's search/crawl sources (sources/crawl.py) take *injected*
callables — ``SearchFn: query -> [{url, title, snippet}]`` and
``FetchFn: url -> text`` — because this environment has no network and a
deterministic engine must not silently depend on one.  This module
supplies thin adapters that implement those seams against the services
the reference uses, for users who deploy with real credentials:

- :class:`SerpApiSearch` — mirrors the reference's SerpAPI client
  (``LLMxMapReduce_V2/src/LLM_search.py:210-304``): same engine-specific
  parameter construction (google ``num``/``tbs``, baidu ``rn``/``gpc``,
  bing ``count``/``filters``), same ``organic_results`` parse, same
  quote-stripping and no-result errors.
- :class:`BingV7Search` — mirrors ``LLM_search.py:164-207``: endpoint +
  subscription-key header, ``webPages.value`` → name/url/snippet.
- :class:`HttpFetch` — a plain-HTTP page fetcher for the FetchFn seam
  (the reference wraps crawl4ai, ``async_crawl.py:283-331``; this is the
  dependency-free fallback).  Exceptions propagate — the crawl source
  converts them to ``error=True`` rows (S4 error-sentinel flow).
- :func:`search_from_env` — the reference's key-precedence dispatch
  (``LLM_search.py:73-82,153-162``): SerpAPI if ``SERP_API_KEY`` is set,
  else Bing if ``BING_SEARCH_V7_SUBSCRIPTION_KEY``, else ``ValueError``.

Every adapter takes an injectable ``transport(url, params, headers) ->
dict`` so unit tests run with canned payloads; the default transport is
stdlib ``urllib`` built LAZILY on first call — importing this module
performs no network access and needs no third-party packages.  CI
exercises construction + parsing only (tests/test_connectors.py); the
live transport is exercised only by a deployment with credentials.

Scale note: a SearchFn/FetchFn instance is built once per *partition*
inside ``mapInPandas`` (sources/crawl.py) — adapters hold no global
state, so 1000 executors fan out independently; rate limiting belongs at
the account level or via a bounded ``top_n`` (T7 over-fetch), the same
place the reference throttles its greenlet pools.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

__all__ = [
    "SerpApiSearch",
    "BingV7Search",
    "HttpFetch",
    "search_from_env",
    "urllib_transport",
]

Transport = Callable[[str, dict, dict], dict]


def urllib_transport(url: str, params: dict, headers: dict) -> dict:
    """Default transport: stdlib GET returning parsed JSON.  Built here
    (not at import) so offline environments import this module freely."""
    import urllib.parse
    import urllib.request

    full = url + ("?" + urllib.parse.urlencode(params) if params else "")
    req = urllib.request.Request(full, headers=headers or {})
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


def _text_transport(url: str, params: dict, headers: dict) -> str:
    import urllib.parse
    import urllib.request

    full = url + ("?" + urllib.parse.urlencode(params) if params else "")
    req = urllib.request.Request(full, headers=headers or {})
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        charset = resp.headers.get_content_charset() or "utf-8"
        return resp.read().decode(charset, errors="replace")


class SerpApiSearch:
    """SearchFn over serpapi.com (LLM_search.py:210-304)."""

    ENDPOINT = "https://serpapi.com/search.json"

    def __init__(
        self,
        api_key: str | None = None,
        engine: str = "google",
        each_query_result: int = 10,
        filter_date: str | None = None,
        transport: Transport | None = None,
    ) -> None:
        self.api_key = api_key or os.getenv("SERP_API_KEY")
        if not self.api_key:
            raise ValueError("SerpApiSearch needs api_key or SERP_API_KEY")
        if engine not in ("google", "baidu", "bing"):
            raise ValueError(f"unsupported engine {engine!r}")
        self.engine = engine
        self.each_query_result = each_query_result
        self.filter_date = filter_date
        self.transport = transport or urllib_transport

    def _params(self, query: str) -> dict[str, Any]:
        # LLM_search.py:236-256 — per-engine parameter spellings
        params: dict[str, Any] = {
            "engine": self.engine,
            "q": query.lstrip('"').rstrip('"'),
            "api_key": self.api_key,
        }
        if self.engine == "google":
            params["google_domain"] = "google.com"
            params["num"] = self.each_query_result
            if self.filter_date is not None:
                params["tbs"] = f"cdr:1,cd_min:{self.filter_date}"
        elif self.engine == "baidu":
            params["rn"] = self.each_query_result
            if self.filter_date is not None:
                params["gpc"] = f"cdr:1,cd_min:{self.filter_date}"
        else:  # bing
            params["count"] = self.each_query_result
            if self.filter_date is not None:
                params["filters"] = f"cdr:1,cd_min:{self.filter_date}"
        return params

    def __call__(self, query: str) -> list[dict]:
        results = self.transport(self.ENDPOINT, self._params(query), {})
        organic = results.get("organic_results")
        if organic is None:
            # LLM_search.py:262-271 — explicit no-result errors
            suffix = (f" with filtering on date={self.filter_date}. Use a "
                      "less restrictive query or do not filter on year."
                      if self.filter_date is not None
                      else ". Use a less restrictive query.")
            raise RuntimeError(f"No results found for query: {query!r}{suffix}")
        return [
            {"url": page.get("link"), "title": page.get("title", ""),
             "snippet": page.get("snippet", "")}
            for page in organic
        ]


class BingV7Search:
    """SearchFn over the Bing Web Search v7 API (LLM_search.py:164-207)."""

    def __init__(
        self,
        subscription_key: str | None = None,
        endpoint: str | None = None,
        each_query_result: int = 10,
        mkt: str = "zh-CN",
        transport: Transport | None = None,
    ) -> None:
        self.subscription_key = subscription_key or os.getenv(
            "BING_SEARCH_V7_SUBSCRIPTION_KEY")
        if not self.subscription_key:
            raise ValueError("BingV7Search needs subscription_key or "
                             "BING_SEARCH_V7_SUBSCRIPTION_KEY")
        self.endpoint = endpoint or os.getenv(
            "BING_SEARCH_V7_ENDPOINT",
            "https://api.bing.microsoft.com/v7.0/search")
        self.each_query_result = each_query_result
        self.mkt = mkt                      # the reference pins zh-CN
        self.transport = transport or urllib_transport

    def __call__(self, query: str) -> list[dict]:
        results = self.transport(
            self.endpoint,
            {"q": query.lstrip('"').rstrip('"'), "mkt": self.mkt,
             "count": self.each_query_result},
            {"Ocp-Apim-Subscription-Key": self.subscription_key},
        )
        pages = (results.get("webPages") or {}).get("value")
        if not pages:
            raise RuntimeError(f"No results found for query: {query!r}")
        return [
            {"url": p.get("url", ""), "title": p.get("name", ""),
             "snippet": p.get("snippet", "")}
            for p in pages
        ]


class HttpFetch:
    """FetchFn: GET the url, return decoded text.  ``max_bytes`` guards a
    runaway page; raising propagates to the crawl source's error-sentinel
    row (async_crawl.py:302-310), never crashes the stage."""

    def __init__(
        self,
        max_bytes: int = 4_000_000,
        user_agent: str = "llmxmapreduce-spark/1.0",
        transport: Callable[[str, dict, dict], str] | None = None,
    ) -> None:
        self.max_bytes = max_bytes
        self.user_agent = user_agent
        self.transport = transport or _text_transport

    def __call__(self, url: str) -> str:
        text = self.transport(url, {}, {"User-Agent": self.user_agent})
        if len(text.encode("utf-8", errors="ignore")) > self.max_bytes:
            raise ValueError(f"page exceeds max_bytes: {url}")
        return text


def search_from_env(**kwargs) -> Callable[[str], list[dict]]:
    """The reference's engine dispatch (LLM_search.py:153-162): SerpAPI
    key wins, then Bing, else the same ValueError it raises."""
    if os.getenv("SERP_API_KEY"):
        return SerpApiSearch(**kwargs)
    if os.getenv("BING_SEARCH_V7_SUBSCRIPTION_KEY"):
        allowed = {"each_query_result", "transport"}
        return BingV7Search(
            **{k: v for k, v in kwargs.items() if k in allowed})
    raise ValueError(
        "No valid search engine key provided, please check your "
        "environment variables, SERP_API_KEY or "
        "BING_SEARCH_V7_SUBSCRIPTION_KEY.")
