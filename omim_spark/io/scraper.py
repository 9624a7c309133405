"""S8: OMIM statistics-update code scraper — the Spark twin of the
reference's HTML stats importer (reference
omim2obo/utils/omim_code_scraper/omim_code_scraper.py:43-80; URL
scheme config.py:3-4; prefix-splitting rule :71-76).

The reference fetches ``https://omim.org/statistics/updates/YYYY/M``
one month at a time with requests+BeautifulSoup and returns
``(prefix, mim_number)`` tuples from every ``<span class="mim-font
mim-hint">`` on the page.  Re-expressed for Spark:

- the HTML GET is an injected ``transport`` callable (this container
  has no network; production passes a requests-backed one — the same
  inversion ``io/fetch.py`` uses for the REST source);
- parsing is ``html.parser`` from the stdlib (no bs4 dependency): a
  tiny subclass collects the text of matching spans, including nested
  markup, exactly like ``soup.find_all(...).text``;
- MANY months fan out executor-side through ``mapInPandas`` — the
  reference's one-month-per-process loop becomes a partitioned fetch,
  so backfilling a decade of stats pages is 120 parallel tasks, not a
  serial loop.  Each page is a few KB; per-task memory is bounded.

The scraper is deprecated upstream ("no longer has an identified use
case" — reference README) but kept here so §2 coverage is total; the
transport inversion means it is fully testable offline.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

STATS_PAGES_URL_BASE = "https://omim.org/statistics/updates"

CODES_SCHEMA = StructType(
    [
        StructField("yyyy_mm", StringType(), False),
        StructField("prefix", StringType(), False),
        StructField("mim_number", StringType(), False),
    ]
)


def codes_url(yyyy_mm: str) -> str:
    """Reference URL scheme (omim_code_scraper.py:56-57): stats page
    per year/month, month NOT zero-padded."""
    year, month = validate_yyyy_mm(yyyy_mm)
    return f"{STATS_PAGES_URL_BASE}/{year}/{month}"


def validate_yyyy_mm(yyyy_mm: str) -> tuple[str, int]:
    """Syntactic validation (reference validate_args:23-36, which the
    reference defines but never finishes — here it is enforced):
    'YYYY/MM' with a 4-digit year and a 1-12 month."""
    parts = yyyy_mm.split("/")
    if len(parts) != 2 or len(parts[0]) != 4 or not parts[0].isdigit():
        raise ValueError(
            f"invalid YYYY/MM argument: {yyyy_mm!r} (need 4-digit year, "
            "'/', then month)"
        )
    if not parts[1].isdigit() or not 1 <= int(parts[1]) <= 12:
        raise ValueError(f"invalid month in YYYY/MM argument: {yyyy_mm!r}")
    return parts[0], int(parts[1])


class _MimHintSpans(HTMLParser):
    """Collect the full text (nested markup included) of every
    ``<span class="mim-font mim-hint">`` — the stdlib counterpart of
    the reference's ``soup.find_all('span', {'class': 'mim-font
    mim-hint'})``, with two DELIBERATE divergences (r8 ADVICE): class
    matching is set-inclusion (both classes present ⇒ match, extra
    classes and any order are fine, where BS4's dict form matches the
    exact attribute string), and a matching span nested inside another
    matching span contributes to the OUTER span's text instead of
    yielding a second row.  Both are the more permissive/robust
    behavior for scrape input; on the reference's actual pages (flat
    span lists, exact two-class attribute) the outputs are
    identical — pinned by test_scraper.py's parity fixtures."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.texts: list[str] = []
        self._depth = 0  # >0 while inside a matching span
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if self._depth:
            self._depth += 1 if tag == "span" else 0
            return
        if tag == "span":
            classes = dict(attrs).get("class", "") or ""
            if {"mim-font", "mim-hint"} <= set(classes.split()):
                self._depth = 1
                self._buf = []

    def handle_endtag(self, tag):
        if self._depth and tag == "span":
            self._depth -= 1
            if self._depth == 0:
                self.texts.append("".join(self._buf))

    def handle_data(self, data):
        if self._depth:
            self._buf.append(data)


def parse_update_codes(html: str) -> list[tuple[str, str]]:
    """One stats page → [(prefix, mim_number)] with the reference's
    splitting rule (omim_code_scraper.py:71-76): a leading digit means
    no prefix; otherwise the first character is the prefix symbol
    (* # % + ^) and the rest is the MIM number."""
    p = _MimHintSpans()
    p.feed(html)
    out: list[tuple[str, str]] = []
    for raw in p.texts:
        code = raw.strip()
        if not code:
            continue
        if code[0].isnumeric():
            out.append(("", code))
        else:
            out.append((code[0], code[1:]))
    return out


def scrape_update_codes(
    spark: SparkSession,
    months: str | list[str],
    transport: Callable[[str], str],
) -> DataFrame:
    """(yyyy_mm, prefix, mim_number) for one or many stats months.

    Scale path: the month list becomes a DataFrame and each PARTITION
    fetches+parses its months inside ``mapInPandas`` — a 10-year
    backfill is cluster-parallel and driver-light (pages never land on
    the driver).  The transport travels to executors by closure
    serialization, same as any Python UDF dependency."""
    import pandas as pd

    if isinstance(months, str):
        months = [months]
    urls = [(m, codes_url(m)) for m in months]  # validate up front

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m, url in zip(pdf["yyyy_mm"], pdf["url"]):
                for prefix, mim in parse_update_codes(transport(url)):
                    rows.append((m, prefix, mim))
            yield pd.DataFrame(
                rows, columns=["yyyy_mm", "prefix", "mim_number"]
            )

    src = spark.createDataFrame(urls, "yyyy_mm string, url string")
    if len(urls) > 1:
        src = src.repartition(min(len(urls), 64))
    return src.mapInPandas(fetch, CODES_SCHEMA)
