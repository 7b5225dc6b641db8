"""Scrape-shaped source — the engine form of the reference's paginated
list scan + bounded-concurrency fetch executor (S1-S5 in SURVEY.md
§2.1; reference ``src/scrapers/scraper.py:58-128``).

Spark mapping: the page range IS a table (``spark.range(max_pages)``),
fetch+parse runs as an Arrow-batched ``mapInPandas`` over it, and the
task scheduler replaces the asyncio deque — concurrency = partition
count, retry = tenacity-style loop inside the worker (the reference's
S4 policy), task-level retry = ``spark.task.maxFailures``.

The HTTP stack itself (proxy rotation, UA pools — reference
``src/scrapers/network/*``) is connector environment, not query
surface: the fetcher is an injected callable, and tests/oracles use a
deterministic fake, exactly like the LLM backend seam.

Scale notes: one partition per page bounds per-task memory; a real
deployment fans out to thousands of pages per micro-batch and lands
results in a bronze table — from there on everything is the columnar
engine.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def with_retry(fn: Callable, attempts: int = 3, base_delay: float = 0.01,
               max_delay: float = 30.0) -> Callable:
    """Tenacity-semantics wrapper (exponential backoff, bounded) —
    config keys mirror the reference's ``retry:`` block
    (``configs/colombia.yml:13-19``)."""

    def wrapped(*args, **kwargs):
        delay = base_delay
        last = None
        for _ in range(attempts):
            try:
                return fn(*args, **kwargs)
            except Exception as exc:  # noqa: BLE001 — retry any fetch error
                last = exc
                time.sleep(min(delay, max_delay))
                delay *= 2
        raise last

    return wrapped


LIST_ROW_SCHEMA = T.StructType(
    [
        T.StructField("page", T.LongType()),
        T.StructField("row_idx", T.LongType()),
        T.StructField("lookup_key", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)


def fake_fetcher(page: int) -> str:
    """Deterministic stand-in for the HTTP fetch: a 'page' of 10
    delimited rows."""
    return "\n".join(f"p{page}-r{i}|payload-{page * 10 + i}" for i in range(10))


# UA pool for header rotation — same rotation semantics as the
# reference's header factory (``src/scrapers/network/http_client.py:
# 15-31``: random UA per request from a fixed pool); the pool contents
# are config, not behavior, so a short generic list suffices here.
DEFAULT_USER_AGENTS = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) Gecko/20100101 Firefox/115.0",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Safari/605.1.15",
)


def http_fetcher(
    base_url: str,
    *,
    user_agents: tuple[str, ...] = DEFAULT_USER_AGENTS,
    timeout: float = 15.0,
) -> Callable[[int], str]:
    """Real HTTP fetcher for the injected-fetcher seam: GET
    ``{base_url}{page}`` with a rotating User-Agent, raising on HTTP
    errors so :func:`with_retry` (the S4 policy) governs retries —
    the engine form of the reference's fetch loop
    (``src/scrapers/network/http_client.py:33-41``: rotated headers,
    bounded timeout, ``raise_for_status``).  Proxy rotation
    (``proxy_manager.py``) remains connector environment — a deployment
    wraps this callable, the query surface is unchanged.

    Uses stdlib urllib (aiohttp is not in this container): per-page
    concurrency already comes from one Spark task per page, so a
    blocking client per task is the right shape — the asyncio fan-out
    the reference needs in one process is exactly what the task
    scheduler provides for free.  The returned closure pickles into
    mapInPandas workers (no session object captured)."""
    import random
    import urllib.request

    def fetch(page: int) -> str:
        req = urllib.request.Request(
            f"{base_url}{page}",
            headers={
                "User-Agent": random.choice(user_agents),
                "Accept": "text/html,application/xhtml+xml,*/*;q=0.8",
            },
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if resp.status >= 400:  # urlopen raises for most, belt+braces
                raise OSError(f"HTTP {resp.status} for page {page}")
            # decode with the response's DECLARED charset and
            # errors='replace': a non-UTF-8 page must not raise inside
            # the task — a UnicodeDecodeError is deterministic, so
            # with_retry would retry it pointlessly (round-3 advice;
            # mirrors the reference client's lenient page handling).
            body = resp.read()
            charset = resp.headers.get_content_charset() or "utf-8"
            try:
                return body.decode(charset, errors="replace")
            except LookupError:  # bogus charset label in the header
                return body.decode("utf-8", errors="replace")

    return fetch


def parse_list_page(page: int, body: str) -> list[dict]:
    """Positional-cell list parser (P1-P3 shape): split rows, split
    cells, name the columns."""
    out = []
    for i, line in enumerate(body.splitlines()):
        cells = line.split("|")
        if len(cells) < 2 or not cells[0].strip():  # P2/P3 row-shape filter
            continue
        out.append(
            {
                "page": page,
                "row_idx": i,
                "lookup_key": cells[0].strip(),
                "payload": cells[1].strip(),
            }
        )
    return out


def paginated_list_scan(
    spark: SparkSession,
    max_pages: int,
    fetcher: Callable[[int], str] | None = None,
    parser: Callable[[int, str], list[dict]] = parse_list_page,
    retry_attempts: int = 3,
) -> DataFrame:
    """S1+S3: page-range scan -> per-page fetch -> parse, one partition
    per page (the reference's per-stage concurrency knob)."""
    fetcher = with_retry(fetcher or fake_fetcher, attempts=retry_attempts)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[dict] = []
            for page in pdf["id"].tolist():
                rows.extend(parser(page, fetcher(page)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in LIST_ROW_SCHEMA.fields]
            )

    pages = spark.range(max_pages).repartition(max_pages)
    return pages.mapInPandas(run, schema=LIST_ROW_SCHEMA)
