"""Scrape-stage sources: config-driven URL work lists, pagination, and the
fetch stage (SURVEY.md §2.1 S1-S4).

Reference semantics (glassdoor-scraper/src):
- S4 config (main.py:22-39): a url template with {country} {search_term}
  {country_code} {str_length} slots, crossed over search_terms x locations
  (str_length = len(location) + len(search_term) + 1).
- S3 pagination (main.py:49-58): page n rewrites the ".htm" suffix to
  "_IP<n>.htm" (iteratively from the previous page in the reference; the
  closed form is the same string).
- S1 fetch (packages/common.py:16-42): GET with browser headers, scheme
  fix, retry <= 10 times with a 5 s sleep.

Spark-first: the work list is a DataFrame (cross join + expressions), so a
100 TB-era crawl is just a bigger work list partitioned across executors;
the fetch stage is ``mapInPandas`` with ONE transport per partition
(connection reuse), an injectable ``fetcher`` callable (tests inject a
fake; production injects urllib/requests), and per-row error capture — a
failed URL is a ROW with an error, never a lost task.
"""

from __future__ import annotations

import re
import time as _time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..catalog import literal_dim
from ..deploy import ensure_shipped

# ---------------------------------------------------------------------------
# S4: config -> base-url work list
# ---------------------------------------------------------------------------


def _template_expr(template: str, slots: dict[str, Column]) -> Column:
    """Compile a '{name}'-slotted url template into a concat expression —
    literal segments stay literals; slots become columns. Works for any
    slot order the config chooses."""
    parts: list[Column] = []
    pos = 0
    for m in re.finditer(r"\{(\w+)\}", template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
        if name not in slots:
            raise KeyError(f"template slot {{{name}}} has no binding; have {sorted(slots)}")
        parts.append(slots[name].cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts)


def base_url_worklist(spark: SparkSession, config: dict) -> DataFrame:
    """The search_terms x locations cross product as a DataFrame with the
    formatted base url per pair (main.py:32-38). ``config`` is the parsed
    config.json (base_url, search_terms, locations: {name: code})."""
    # literal_dim keeps the config dims as pure JVM literal plans (no
    # Python-RDD scans — a handful of rows must not cost worker round
    # trips). The crawl frontier re-partitions AFTER paginate(), where the
    # fan-out is real.
    terms = literal_dim(
        spark, [(t,) for t in config["search_terms"]], "search_term string"
    )
    locs = literal_dim(
        spark,
        [(name, code) for name, code in config["locations"].items()],
        "location string, country_code string",
    )
    crossed = terms.crossJoin(F.broadcast(locs))
    url = _template_expr(
        config["base_url"],
        {
            "country": F.col("location"),
            "search_term": F.col("search_term"),
            "country_code": F.col("country_code"),
            "str_length": F.length("location") + F.length("search_term") + 1,
        },
    )
    return crossed.withColumn("base_url", url)


# ---------------------------------------------------------------------------
# S3: pagination
# ---------------------------------------------------------------------------


def page_url(base_url: Column, page: Column) -> Column:
    """Closed form of the reference's iterative update_url (main.py:49-58):
    page n's url is the base with ".htm" rewritten to "_IP<n>.htm"."""
    return F.concat(
        F.regexp_replace(base_url, r"\.htm$", ""),
        F.lit("_IP"),
        page.cast("string"),
        F.lit(".htm"),
    )


def paginate(worklist: DataFrame, max_pages: int, url_col: str = "base_url") -> DataFrame:
    """Expand each base url into its page-indexed urls (1..max_pages) —
    the crawl frontier as a DataFrame, ready to partition across the
    cluster."""
    pages = F.explode(F.sequence(F.lit(1), F.lit(max_pages))).alias("page")
    return worklist.select("*", pages).withColumn(
        "url", page_url(F.col(url_col), F.col("page"))
    )


# ---------------------------------------------------------------------------
# S1: fetch stage
# ---------------------------------------------------------------------------

# The reference's request headers (common.py:22-27) — kept for behavioral
# parity when a real transport is injected.
BROWSER_HEADERS = {
    "User-Agent": "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_3) "
    "AppleWebKit/537.36 (KHTML, like Gecko) Chrome/80.0.3987.149 Safari/537.36",
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
    "Accept-Language": "en-US,en;q=0.8",
}

FETCH_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("html", StringType()),
        StructField("error", StringType()),
    ]
)

Transport = Callable[[str], str]  # url -> html (raises on failure)


def default_transport(url: str) -> str:
    """urllib GET with the reference's browser headers. Only used when no
    transport is injected — tests and offline runs always inject."""
    from urllib.request import Request, urlopen

    if not re.match(r"^https?://", url):
        url = "https://" + url  # S2 scheme fix (common.py:10-13)
    req = Request(url=url, headers=BROWSER_HEADERS)
    with urlopen(req) as resp:  # noqa: S310 (scheme checked above)
        return resp.read().decode("utf-8", errors="replace")


def fetch_with_retry(
    url: str,
    transport: Transport,
    max_retries: int = 10,
    retry_wait: float = 5.0,
    sleep: Callable[[float], None] = _time.sleep,
) -> tuple[str | None, str | None]:
    """The reference's retry loop (common.py:29-42): up to ``max_retries``
    attempts with a fixed wait. Returns (html, None) or (None, error)."""
    last_err = "unknown"
    for attempt in range(max_retries):
        try:
            return transport(url), None
        except Exception as e:  # noqa: BLE001 — error becomes a data value
            last_err = f"{type(e).__name__}: {e}"
            if attempt < max_retries - 1:
                sleep(retry_wait)
    return None, last_err


def fetch_pages(
    df: DataFrame,
    url_col: str = "url",
    fetcher: Callable[[], Transport] | None = None,
    max_retries: int = 10,
    retry_wait: float = 5.0,
) -> DataFrame:
    """The fetch stage: url rows -> (url, html, error) rows.

    ``fetcher`` is a factory invoked ONCE PER PARTITION on the executor and
    returns the transport — one session/connection pool per partition, no
    per-row setup. Failures surface as rows with ``error`` set (auditable,
    joinable, retryable by left-anti against successes) instead of task
    failures. Rate limiting belongs in the injected transport.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = fetcher() if fetcher is not None else default_transport
        for pdf in batches:
            rows = []
            for url in pdf[url_col]:
                html, err = fetch_with_retry(url, transport, max_retries, retry_wait)
                rows.append({"url": url, "html": html, "error": err})
            yield pd.DataFrame(rows, columns=["url", "html", "error"])

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(gen, FETCH_SCHEMA)
