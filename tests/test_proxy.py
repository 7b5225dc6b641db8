"""Hermetic unit tests for the S6 proxy-pool connector seam
(sources/proxy.py — the engine twin of the reference's
src/scrapers/network/proxy_manager.py)."""

from __future__ import annotations

import random

import pytest

from datapipeline_scraping_spark.sources.proxy import (
    ProxyPool,
    parse_proxy_table,
    proxied_fetcher,
)
from datapipeline_scraping_spark.sources.scrape import with_retry

LIST_URL = "https://example.invalid/proxy-list"
PROBE_URL = "https://example.invalid/ip-echo"

PAGE = """
<html><body><table id="tbl">
<tr><th>IP</th><th>Port</th><th>Code</th><th>Country</th>
    <th>Anon</th><th>Google</th><th>Https</th></tr>
<tr><td>10.0.0.1</td><td>8080</td><td>AA</td><td>A</td>
    <td>elite</td><td>no</td><td>yes</td></tr>
<tr><td>10.0.0.2</td><td>3128</td><td>BB</td><td>B</td>
    <td>anon</td><td>no</td><td>no</td></tr>
<tr><td>10.0.0.3</td><td>80</td><td>CC</td><td>C</td>
    <td>elite</td><td>yes</td><td>YES</td></tr>
<tr><td>short row</td></tr>
</table></body></html>
"""


def transport_for(health: dict[str, bool], pages: dict[str, str] | None = None):
    """Transport fake honoring the ``transport(url, proxy)`` contract:
    serves the list page directly, and raises for probe requests routed
    through a proxy marked unhealthy."""
    calls = []

    def transport(url: str, proxy: str | None = None) -> str:
        calls.append((url, proxy))
        if url == LIST_URL:
            return (pages or {LIST_URL: PAGE})[url]
        if url == PROBE_URL:
            assert proxy is not None, "probe must be routed through a proxy"
            if health.get(proxy, False):
                return '{"origin": "1.2.3.4"}'
            raise OSError(f"probe failed via {proxy}")
        raise AssertionError(f"unexpected url {url}")

    transport.calls = calls
    return transport


def test_parse_keeps_only_https_rows_and_caps():
    got = parse_proxy_table(PAGE)
    assert got == ["http://10.0.0.1:8080", "http://10.0.0.3:80"]
    assert parse_proxy_table(PAGE, max_proxies=1) == ["http://10.0.0.1:8080"]
    assert parse_proxy_table("<html>no table</html>") == []


def test_get_proxy_skips_failed_and_tracks_them():
    health = {"http://10.0.0.1:8080": False, "http://10.0.0.3:80": True}
    pool = ProxyPool(transport_for(health), list_url=LIST_URL,
                     probe_url=PROBE_URL, rng=random.Random(0))
    assert pool.get_proxy() == "http://10.0.0.3:80"
    # the unhealthy one is in the failed set iff it was probed first
    assert pool.failed <= {"http://10.0.0.1:8080"}
    # all candidates failing -> one refresh cycle, then give up
    pool2 = ProxyPool(transport_for({}), list_url=LIST_URL,
                      probe_url=PROBE_URL, rng=random.Random(0))
    assert pool2.get_proxy() is None
    assert pool2.failed == {"http://10.0.0.1:8080", "http://10.0.0.3:80"}


def test_exhausted_pool_refreshes_once():
    health = {"http://10.0.0.1:8080": True}
    t = transport_for(health)
    pool = ProxyPool(t, list_url=LIST_URL, probe_url=PROBE_URL,
                     rng=random.Random(0))
    pool.fetch_proxies()
    # everything already failed -> get_proxy must refresh and find the
    # healthy one on the fresh list (failure state cleared)
    pool.failed = set(pool.proxies)
    assert pool.get_proxy() == "http://10.0.0.1:8080"
    assert t.calls.count((LIST_URL, None)) == 2  # initial + refresh


def test_list_fetch_failure_degrades_to_none():
    def broken(url: str, proxy: str | None = None) -> str:
        raise OSError("no network")

    pool = ProxyPool(broken, list_url=LIST_URL, probe_url=PROBE_URL)
    assert pool.fetch_proxies() == 0
    assert pool.get_proxy() is None


def test_proxied_fetcher_marks_failure_and_retry_rotates():
    health = {"http://10.0.0.1:8080": True, "http://10.0.0.3:80": True}
    pool = ProxyPool(transport_for(health), list_url=LIST_URL,
                     probe_url=PROBE_URL, rng=random.Random(1))
    seen: list[str | None] = []

    def fetch(page: int, proxy: str | None) -> str:
        seen.append(proxy)
        # first proxy dies at fetch time even though the probe passed
        if len(seen) == 1:
            raise OSError("connection reset by proxy")
        return f"page-{page} via {proxy}"

    fetched = with_retry(proxied_fetcher(fetch, pool), attempts=3)
    body = fetched(7)
    assert body.startswith("page-7 via http://")
    assert len(seen) == 2 and seen[0] != seen[1]  # rotated after failure
    assert seen[0] in pool.failed


def test_pool_exhaustion_falls_back_to_direct_fetch():
    pool = ProxyPool(transport_for({}), list_url=LIST_URL, probe_url=PROBE_URL,
                     rng=random.Random(0))

    def fetch(page: int, proxy: str | None) -> str:
        assert proxy is None
        return f"direct-{page}"

    assert proxied_fetcher(fetch, pool)(3) == "direct-3"


# --- property tests (hypothesis): the parser's https-filter/cap/order
# contract holds for arbitrary table shapes --------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_octet = st.integers(0, 255)
_row = st.tuples(
    st.tuples(_octet, _octet, _octet, _octet),   # ip
    st.integers(1, 65535),                        # port
    st.sampled_from(["yes", "no", "YES", "No", ""]),  # https flag
    st.integers(5, 9),                            # rendered cell count
)


def _render(rows) -> str:
    trs = []
    for (a, b, c, d), port, https, n_cells in rows:
        cells = [f"{a}.{b}.{c}.{d}", str(port), "XX", "Country", "anon", "no"]
        if n_cells >= 7:
            cells.append(https)
        cells += ["extra"] * (n_cells - len(cells))
        trs.append("<tr>" + "".join(f"<td>{c}</td>" for c in cells) + "</tr>")
    return "<table><tr><th>h</th></tr>" + "".join(trs) + "</table>"


@given(rows=st.lists(_row, max_size=20), cap=st.integers(1, 10))
@settings(max_examples=25, deadline=None)
def test_parse_property_https_filter_cap_order(rows, cap):
    got = parse_proxy_table(_render(rows), max_proxies=cap)
    expected = [
        f"http://{a}.{b}.{c}.{d}:{port}"
        for (a, b, c, d), port, https, n_cells in rows
        if n_cells >= 7 and https.lower() == "yes"
    ][:cap]
    assert got == expected
