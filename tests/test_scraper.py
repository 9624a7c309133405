"""S8 scraper tests: stdlib HTML parsing matches the reference's
BeautifulSoup extraction semantics (span class filter, nested text,
prefix splitting), URL scheme parity, and the Spark fan-out path with
an offline transport."""

from __future__ import annotations

import pytest

from omim_spark.io.scraper import (
    codes_url,
    parse_update_codes,
    scrape_update_codes,
    validate_yyyy_mm,
)

PAGE = """
<html><body>
<table>
 <tr><td><span class="mim-font mim-hint">*100100</span></td></tr>
 <tr><td><span class="mim-hint mim-font extra">#300100</span></td></tr>
 <tr><td><span class="mim-font mim-hint"> 118494 </span></td></tr>
 <tr><td><span class="mim-font mim-hint">%200100</span></td></tr>
 <tr><td><span class="mim-font mim-hint">^<b>100200</b></span></td></tr>
 <tr><td><span class="mim-font">999999</span></td></tr>
 <tr><td><span class="mim-hint">888888</span></td></tr>
 <tr><td><span class="mim-font mim-hint"></span></td></tr>
</table>
</body></html>
"""


class TestParse:
    def test_extraction_and_prefix_split(self):
        got = parse_update_codes(PAGE)
        assert got == [
            ("*", "100100"),   # leading symbol split off
            ("#", "300100"),   # extra classes still match
            ("", "118494"),    # numeric-first -> empty prefix
            ("%", "200100"),
            ("^", "100200"),   # nested markup text concatenated
        ]
        # spans with only one of the two classes are ignored, as is
        # the empty span

    def test_url_scheme_month_not_padded(self):
        assert codes_url("2021/05") == (
            "https://omim.org/statistics/updates/2021/5"
        )
        assert codes_url("2021/11").endswith("/2021/11")

    def test_validation(self):
        for bad in ("202105", "21/05", "2021/13", "2021/xx", "2021/"):
            with pytest.raises(ValueError):
                validate_yyyy_mm(bad)


class TestSparkFanOut:
    def test_many_months_fetch_executor_side(self, spark):
        calls = []

        def transport(url: str) -> str:
            calls.append(url)
            return PAGE

        months = ["2021/01", "2021/02", "2021/03"]
        df = scrape_update_codes(spark, months, transport)
        rows = df.collect()
        # 5 codes per page x 3 months
        assert len(rows) == 15
        assert {r.yyyy_mm for r in rows} == set(months)
        assert {(r.prefix, r.mim_number) for r in rows} == {
            ("*", "100100"), ("#", "300100"), ("", "118494"),
            ("%", "200100"), ("^", "100200"),
        }
        # the driver-side transport list stays empty: fetches happened
        # in executor pythons (closure-serialized copies), proving the
        # scrape is distributed, not a driver loop
        assert calls == []

    def test_single_month_string(self, spark):
        df = scrape_update_codes(spark, "2020/12", lambda url: PAGE)
        assert df.count() == 5

    def test_invalid_month_fails_before_any_fetch(self, spark):
        def explode(url):  # pragma: no cover - must never run
            raise AssertionError("transport called")

        with pytest.raises(ValueError):
            scrape_update_codes(spark, ["2021/01", "bad"], explode)
