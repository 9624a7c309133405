"""S7 fetch-protocol tests — offline, fake transport.

Mirrors the reference client's observable behavior
(omim2obo/omim_client.py:75-207): 20-id batching, paged since-date
search with short-page termination, 429 halt + resume, error taxonomy.
"""

from __future__ import annotations

import pytest

from omim_spark.io.fetch import (
    BATCH_SIZE,
    FetchError,
    FetchRequest,
    FetchResponse,
    FetchState,
    InvalidApiKeyError,
    OmimFetcher,
    classify_response,
    plan_batches,
    write_landing_zone,
)


def entry_page(ids):
    return {"entryList": [{"entry": {"mimNumber": i}} for i in ids]}


def search_page(ids):
    return {"searchResponse": entry_page(ids)}


class OkTransport:
    """Answers every entry request with one entry per requested id."""

    def __init__(self):
        self.requests: list[FetchRequest] = []

    def __call__(self, req: FetchRequest) -> FetchResponse:
        self.requests.append(req)
        ids = req.params["mimNumber"].split(",")
        return FetchResponse(status=200, body=entry_page(ids))


class TestBatching:
    def test_plan_batches_20(self):
        batches = plan_batches(list(range(45)))
        assert [len(b) for b in batches] == [20, 20, 5]
        assert batches[0][0] == "0" and batches[2][-1] == "44"

    def test_fetch_ids_one_request_per_batch(self):
        t = OkTransport()
        f = OmimFetcher(api_key="k", transport=t)
        entries, state = f.fetch_ids(list(range(45)))
        assert len(entries) == 45
        assert len(t.requests) == 3
        assert not state.incomplete
        assert len(state.fetched_ids) == 45

    def test_include_param_limited_vs_all(self):
        t = OkTransport()
        f = OmimFetcher(api_key="k", transport=t)
        f.fetch_ids([1], limit_include=True)
        assert t.requests[-1].params["include"] == [
            "referenceList", "externalLinks",
        ]
        f.fetch_ids([1], limit_include=False)
        assert t.requests[-1].params["include"] == "all"


class TestRateLimitHaltResume:
    def test_429_halts_and_marks_seed_incomplete(self):
        calls = []

        def transport(req):
            calls.append(req)
            if len(calls) >= 2:
                return FetchResponse(status=429, text="slow down")
            ids = req.params["mimNumber"].split(",")
            return FetchResponse(status=200, body=entry_page(ids))

        f = OmimFetcher(api_key="k", transport=transport)
        entries, state = f.fetch_ids(list(range(50)), seed_run=True)
        assert len(entries) == BATCH_SIZE  # first batch only
        assert state.incomplete
        assert len(state.fetched_ids) == BATCH_SIZE

    def test_resume_skips_fetched_ids(self):
        state = FetchState(fetched_ids=[str(i) for i in range(20)])
        t = OkTransport()
        f = OmimFetcher(api_key="k", transport=t)
        entries, state = f.fetch_ids(list(range(50)), state=state)
        assert len(entries) == 30  # only the remainder
        assert t.requests[0].params["mimNumber"].split(",")[0] == "20"
        assert not state.incomplete  # cleared on completion (:106-107)
        assert len(state.fetched_ids) == 50

    def test_state_roundtrips_json(self):
        s = FetchState(fetched_ids=["1", "2"], incomplete=True, since_date="2026-08-13")
        assert FetchState.from_json(s.to_json()) == s


class TestErrorTaxonomy:
    def test_classify(self):
        assert classify_response(FetchResponse(200, body={})) is None
        assert classify_response(
            FetchResponse(403, text="The API key: x is inactive")
        ) == "invalid-api-key"
        assert classify_response(FetchResponse(429)) == "rate-limit"
        assert classify_response(FetchResponse(500, text="boom")) == "boom"

    def test_invalid_key_raises(self):
        f = OmimFetcher(
            api_key="k",
            transport=lambda r: FetchResponse(
                403, text="The API key: k is inactive"
            ),
        )
        with pytest.raises(InvalidApiKeyError):
            f.fetch_ids([1])

    def test_short_entry_page_is_fatal(self):
        # id query returning fewer entries than asked: hard error (:182-183)
        f = OmimFetcher(
            api_key="k",
            transport=lambda r: FetchResponse(200, body=entry_page(["1"])),
        )
        with pytest.raises(FetchError, match="expected 2"):
            f.fetch_ids([1, 2])


class TestSinceDateSearch:
    def test_pages_until_short_page_then_fetches_ids(self):
        search_calls = []

        def transport(req):
            if "search" in req.params:
                search_calls.append(req.params["start"])
                lo = int(req.params["start"])
                ids = [str(i) for i in range(lo, min(lo + BATCH_SIZE, 30))]
                return FetchResponse(status=200, body=search_page(ids))
            ids = req.params["mimNumber"].split(",")
            return FetchResponse(status=200, body=entry_page(ids))

        f = OmimFetcher(api_key="k", transport=transport)
        entries, state = f.fetch_since("2026/01/01", "2026/08/13")
        assert search_calls == [0, 20]  # second page short (10) → stop
        assert len(entries) == 30
        # since_date records when the fetch STARTED (:108-111)
        assert state.since_date == "2026-08-13"

    def test_search_rate_limit_keeps_partial(self):
        def transport(req):
            if "search" in req.params:
                if int(req.params["start"]) == 0:
                    return FetchResponse(
                        status=200,
                        body=search_page([str(i) for i in range(BATCH_SIZE)]),
                    )
                return FetchResponse(status=429)
            ids = req.params["mimNumber"].split(",")
            return FetchResponse(status=200, body=entry_page(ids))

        f = OmimFetcher(api_key="k", transport=transport)
        entries, state = f.fetch_since("2026/01/01", "2026/08/13")
        assert len(entries) == BATCH_SIZE  # first page's ids still fetched
        # the window was NOT fully covered: since_date must not advance
        # and the state must be marked incomplete, or a persisting
        # caller would silently skip the never-fetched updated MIMs
        assert state.incomplete
        assert state.since_date == "2026-01-01"

    def test_search_halt_state_roundtrips_to_full_recovery(self):
        """The search-phase-halt RECOVERY loop, end to end: a 429 mid
        pagination leaves (incomplete, since_date unchanged); a caller
        persists that state as JSON, reloads it next run, re-runs the
        SAME window from state.since_date against a now-healthy API,
        and the window is fully covered — since_date advances and the
        incompleteness marker clears.  fetch_ids halts had this
        round-trip coverage; the search-phase halt did not."""
        healthy = [False]

        def transport(req):
            if "search" in req.params:
                lo = int(req.params["start"])
                if lo > 0 and not healthy[0]:
                    return FetchResponse(status=429)  # halt mid-pagination
                ids = [str(i) for i in range(lo, min(lo + BATCH_SIZE, 30))]
                return FetchResponse(status=200, body=search_page(ids))
            ids = req.params["mimNumber"].split(",")
            return FetchResponse(status=200, body=entry_page(ids))

        f = OmimFetcher(api_key="k", transport=transport)
        entries, state = f.fetch_since("2026/01/01", "2026/08/13")
        assert len(entries) == BATCH_SIZE  # page 2's ids never searched
        assert state.incomplete and state.since_date == "2026-01-01"

        # persist → reload → resume, exactly what a scheduled caller does
        reloaded = FetchState.from_json(state.to_json())
        assert reloaded.incomplete
        assert reloaded.since_date == "2026-01-01"
        healthy[0] = True
        entries2, state2 = f.fetch_since(
            reloaded.since_date.replace("-", "/"), "2026/08/13"
        )
        assert len(entries2) == 30  # full window re-covered, nothing skipped
        assert not state2.incomplete
        assert state2.since_date == "2026-08-13"

    def test_entry_rate_limit_does_not_advance_since_date(self):
        def transport(req):
            if "search" in req.params:
                lo = int(req.params["start"])
                ids = [str(i) for i in range(lo, min(lo + BATCH_SIZE, 30))]
                return FetchResponse(status=200, body=search_page(ids))
            return FetchResponse(status=429)  # id-fetch phase halts

        f = OmimFetcher(api_key="k", transport=transport)
        entries, state = f.fetch_since("2026/01/01", "2026/08/13")
        assert entries == []
        assert state.incomplete
        assert state.since_date == "2026-01-01"


class TestLandingZone:
    def test_written_file_feeds_spark_scan(self, tmp_path, spark):
        from omim_spark.io.readers import read_entry_json

        p = str(tmp_path / "entries.json")
        write_landing_zone(
            [
                {"mimNumber": 100100, "status": "live",
                 "titles": {"preferredTitle": "A TITLE; SYM"}},
                {"mimNumber": 100200, "status": "live",
                 "titles": {"preferredTitle": "B TITLE"}},
            ],
            p,
        )
        df = read_entry_json(spark, p)
        assert df.count() == 2
        assert sorted(r["entry"]["mimNumber"] for r in df.collect()) == [
            100100, 100200,
        ]
