"""Proxy-pool connector seam (S6) — the engine twin of the reference's
proxy manager (``src/scrapers/network/proxy_manager.py:11-86``): fetch
a proxy list page, parse the table into an https-capable pool, health-
check candidates against a probe URL, track failures, and refresh the
pool once every candidate has failed.

Design mirrors the engine's other network seams (``http_fetcher``, the
LLM backend): ALL I/O goes through an injected transport callable, so
unit tests are hermetic and a deployment swaps in a real HTTP client
without touching the pool logic. Parsing is a lenient regex scan of
the first HTML table (the reference uses BeautifulSoup; the column
contract — ip, port, …, https-flag in cell 7 — is the same).

Spark placement: the pool is DRIVER-side connector state. Tasks never
refresh it — the driver resolves a healthy proxy set, and per-page
fetch tasks receive concrete proxy URLs through the fetcher closure
(exactly how ``http_fetcher`` ships its UA pool). That keeps executor
tasks deterministic and retry-safe; rotating on failure happens across
micro-batches, not inside a task.
"""

from __future__ import annotations

import random
import re
from collections.abc import Callable

Transport = Callable[[str, str | None], str]
"""Injected I/O: ``transport(url, proxy) -> body`` raising on any
failure. ``proxy`` is ``None`` for a direct fetch, else an
``http://ip:port`` URL the request MUST be routed through (a real
client maps it to e.g. ``requests.get(url, proxies={...})``). Passing
the proxy explicitly — rather than smuggling it in the URL — is what
lets a deployment swap in a real HTTP client without touching pool
logic: the health probe below only means anything if the probe request
actually traverses the candidate proxy."""

_ROW_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.IGNORECASE | re.DOTALL)
_CELL_RE = re.compile(r"<td[^>]*>(.*?)</td>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def parse_proxy_table(html: str, *, max_proxies: int = 50) -> list[str]:
    """Extract ``http://ip:port`` entries from the first HTML table:
    rows with ≥7 cells whose 7th cell (https flag) is ``yes`` —
    the reference's exact filter (``proxy_manager.py:35-45``)."""
    out: list[str] = []
    for row in _ROW_RE.findall(html):
        cells = [_TAG_RE.sub("", c).strip() for c in _CELL_RE.findall(row)]
        if len(cells) < 7:
            continue
        ip, port, https = cells[0], cells[1], cells[6].lower()
        if https == "yes" and ip and port:
            out.append(f"http://{ip}:{port}")
            if len(out) >= max_proxies:
                break
    return out


class ProxyPool:
    """Failure-tracking proxy pool behind an injected transport.

    ``list_url`` serves the proxy table; ``probe_url`` is the health-
    check target (the reference probes an IP-echo endpoint and treats
    any non-exception 200 as healthy — here the transport contract is
    'returns body or raises', which collapses that to raise/no-raise).
    """

    def __init__(
        self,
        transport: Transport,
        *,
        list_url: str = "https://example.invalid/proxy-list",
        probe_url: str = "https://example.invalid/ip-echo",
        max_proxies: int = 50,
        rng: random.Random | None = None,
    ) -> None:
        self._transport = transport
        self._list_url = list_url
        self._probe_url = probe_url
        self._max = max_proxies
        self._rng = rng or random.Random()
        self.proxies: list[str] = []
        self.failed: set[str] = set()

    def fetch_proxies(self) -> int:
        """(Re)load the pool from the list page; clears failure state
        like the reference's refresh. Returns the pool size (0 if the
        list fetch itself failed — callers degrade to direct fetch)."""
        try:
            html = self._transport(self._list_url, None)
        except Exception:
            return 0
        self.proxies = parse_proxy_table(html, max_proxies=self._max)
        self.failed.clear()
        return len(self.proxies)

    def is_proxy_working(self, proxy: str) -> bool:
        """Probe ``probe_url`` THROUGH ``proxy``: healthy iff the
        transport returns without raising. The proxy is a first-class
        transport argument so a real client routes the probe through
        the candidate (the reference's ``is_proxy_working``,
        ``proxy_manager.py:48-61``, does the same via ``proxies=``)."""
        try:
            self._transport(self._probe_url, proxy)
            return True
        except Exception:
            return False

    def mark_failed(self, proxy: str) -> None:
        self.failed.add(proxy)

    def get_proxy(self) -> str | None:
        """A healthy proxy, or None when none can be found.

        Candidate order is shuffled (injectable RNG => deterministic
        tests); failures are recorded; when every proxy has failed the
        pool refreshes ONCE and retries the fresh list — the
        reference's full cycle (``proxy_manager.py:64-86``)."""
        if not self.proxies:
            self.fetch_proxies()
        for _refresh in range(2):
            candidates = [p for p in self.proxies if p not in self.failed]
            self._rng.shuffle(candidates)
            for proxy in candidates:
                if self.is_proxy_working(proxy):
                    return proxy
                self.mark_failed(proxy)
            if _refresh == 0:
                if not self.fetch_proxies():
                    return None
        return None


def proxied_fetcher(
    fetch: Callable[[int, str | None], str],
    pool: ProxyPool,
) -> Callable[[int], str]:
    """Bind a page fetcher to the pool: resolve a healthy proxy per
    call, fall back to a direct fetch (proxy=None) when the pool is
    exhausted, and mark the proxy failed if the fetch raises before
    re-raising (so ``with_retry`` — the S4 policy — retries with the
    next proxy)."""

    def fetched(page: int) -> str:
        proxy = pool.get_proxy()
        try:
            return fetch(page, proxy)
        except Exception:
            if proxy is not None:
                pool.mark_failed(proxy)
            raise

    return fetched
