"""S7: the OMIM entry-API fetch protocol (driver-side, pre-Spark).

Re-expresses the reference client's fetch semantics
(``omim2obo/omim_client.py:75-207``) as a transport-agnostic state
machine.  In this engine the API fetch is a DRIVER-side landing-zone
producer — it writes the JSON documents that the Spark scan
(:func:`omim_spark.io.readers.read_entry_json`) ingests; nothing here
runs on executors, so nothing here uses Spark.

Reference parity (file:line cites against omim2obo/omim_client.py):

- 20-id request batching — the API caps entry requests at 20 MIMs when
  any ``include`` is specified (BATCH_SIZE, :22 and :157-168).
- Paged since-date search — ``date_updated:{since}-{today}`` filter,
  ``start=`` offset pagination, short page terminates (:115-147).
- 429 rate-limit → HALT, keep partial results, persist resume state;
  seed runs additionally mark the cache incomplete so a later run can
  pick up where this one left off (:48-56, :170-179, :203-204).
- 403 inactive-key → distinguished error (:200-201); any other HTTP
  error or a short/empty entry page → hard RuntimeError (:180-185).
- since_date metadata records when fetching STARTED, not when it
  completed, so entries updated mid-fetch are re-fetched next run
  (:108-111, rationale :33-36).

The transport is injected (any ``Callable[[FetchRequest], FetchResponse]``)
so the protocol is fully unit-testable offline; the container has no
network access by design — the driver supplies the landing zone.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

BATCH_SIZE = 20  # API hard limit per request when 'include' is set
ENTRY_URL = "https://api.omim.org/api/entry"
SEARCH_URL = ENTRY_URL + "/search"

# Error classification (reference :136-141, :196-205).
ERR_RATE_LIMIT = "rate-limit"
ERR_INVALID_KEY = "invalid-api-key"


@dataclass(frozen=True)
class FetchRequest:
    """One HTTP GET the protocol wants performed."""

    url: str
    params: dict


@dataclass(frozen=True)
class FetchResponse:
    """Transport result: HTTP status + decoded JSON body (or raw text
    for error bodies)."""

    status: int
    body: dict | None = None
    text: str = ""


class FetchError(RuntimeError):
    """Unexpected API failure — halts the run (reference :141, :181-185)."""


class InvalidApiKeyError(FetchError):
    """403 with an inactive-key message (reference :200-201)."""


@dataclass
class FetchState:
    """Resumable protocol state — the caller persists this between runs
    (the reference persists the same facts as two marker files,
    :48-56 and :108-111).

    ``fetched_ids`` lets a resumed run skip work already done;
    ``incomplete`` mirrors CACHE_INCOMPLETENESS_INDICATOR_PATH;
    ``since_date`` mirrors CACHE_LAST_UPDATED_PATH and is the date the
    (possibly interrupted) fetch STARTED."""

    fetched_ids: list[str] = field(default_factory=list)
    incomplete: bool = False
    since_date: str | None = None  # YYYY-MM-DD

    def remaining(self, ids: Sequence[int | str]) -> list[str]:
        done = set(self.fetched_ids)
        return [s for s in (str(x) for x in ids) if s not in done]

    def to_json(self) -> str:
        return json.dumps(
            {
                "fetched_ids": self.fetched_ids,
                "incomplete": self.incomplete,
                "since_date": self.since_date,
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "FetchState":
        d = json.loads(s)
        return cls(
            fetched_ids=list(d.get("fetched_ids", [])),
            incomplete=bool(d.get("incomplete", False)),
            since_date=d.get("since_date"),
        )


def plan_batches(ids: Sequence[int | str], batch_size: int = BATCH_SIZE) -> list[list[str]]:
    """Deterministic 20-id request batching (reference :157-160)."""
    strs = [str(x) for x in ids]
    return [strs[i : i + batch_size] for i in range(0, len(strs), batch_size)]


def entry_request(batch: Sequence[str], api_key: str, limit_include: bool = True) -> FetchRequest:
    """Build one entry-API request (reference :161-163): ``include`` is
    trimmed to referenceList+externalLinks unless the caller wants all."""
    params = {
        "format": "json",
        "apiKey": api_key,
        "mimNumber": ",".join(batch),
        "include": ["referenceList", "externalLinks"] if limit_include else "all",
    }
    return FetchRequest(url=ENTRY_URL, params=params)


def search_request(
    since_date: str, to_date: str, start: int, api_key: str
) -> FetchRequest:
    """Build one paged since-date search request (reference :120-129).
    Dates are ``YYYY/MM/DD`` strings; ``start`` is the page offset."""
    return FetchRequest(
        url=SEARCH_URL,
        params={
            "search": "*:*",
            "filter": f"date_updated:{since_date}-{to_date}",
            "sort": "score desc, prefix_sort desc",
            "limit": BATCH_SIZE,
            "start": start,
            "format": "json",
            "apiKey": api_key,
        },
    )


def classify_response(resp: FetchResponse) -> str | None:
    """Map an HTTP response to the reference's error taxonomy
    (:196-205): 403+inactive-key, 429→rate-limit, other ≥400→fatal
    text; None for success."""
    if resp.status < 400:
        return None
    if resp.status == 403 and "is inactive" in (resp.text or ""):
        return ERR_INVALID_KEY
    if resp.status == 429:
        return ERR_RATE_LIMIT
    return resp.text or f"HTTP {resp.status}"


@dataclass
class OmimFetcher:
    """Drives the fetch protocol through an injected transport.

    ``transport`` performs one request and returns a
    :class:`FetchResponse`; the protocol owns batching, pagination,
    halt/resume, and error classification.  ``pace`` is called between
    requests (the reference sleeps 2 s, :144/:186) — injectable so
    tests run instantly and a production driver can rate-shape."""

    api_key: str
    transport: Callable[[FetchRequest], FetchResponse]
    pace: Callable[[], None] = lambda: None

    def fetch_ids(
        self,
        ids: Sequence[int | str],
        state: FetchState | None = None,
        seed_run: bool = False,
        limit_include: bool = True,
    ) -> tuple[list[dict], FetchState]:
        """Fetch entries for explicit MIM ids (reference :149-188).

        Returns (entries, state).  On 429 the run HALTS: entries
        fetched so far are returned, ``state.fetched_ids`` records
        them, and ``state.incomplete`` is set for seed runs so the next
        invocation resumes via ``state.remaining(ids)``."""
        state = state or FetchState()
        todo = state.remaining(ids)
        out: list[dict] = []
        for i, batch in enumerate(plan_batches(todo, BATCH_SIZE)):
            if i:
                self.pace()
            resp = self.transport(entry_request(batch, self.api_key, limit_include))
            err = classify_response(resp)
            if err == ERR_RATE_LIMIT:
                if seed_run:
                    state.incomplete = True
                return out, state
            if err == ERR_INVALID_KEY:
                raise InvalidApiKeyError(resp.text)
            if err:
                raise FetchError(err)
            entries = [
                e["entry"] for e in (resp.body or {}).get("entryList", [])
            ]
            if len(entries) != len(batch):
                # short page on an id query is a hard error (:182-183)
                raise FetchError(
                    f"query on ids {batch} returned {len(entries)} results, "
                    f"expected {len(batch)}"
                )
            out.extend(entries)
            state.fetched_ids.extend(batch)
        # full success clears the incompleteness marker (reference
        # :106-107 removes the indicator file once a fetch completes)
        state.incomplete = False
        return out, state

    def fetch_since(
        self, since_date: str, to_date: str
    ) -> tuple[list[dict], FetchState]:
        """Since-date fetch (reference :115-147): page the search API
        until a short page, collect the matching MIM numbers, then
        fetch them by id.  ``state.since_date`` records ``to_date`` —
        the date the fetch STARTED (:108-111) — but ONLY when the run
        completed: if either phase halted on a 429, ``since_date`` is
        left unchanged and ``state.incomplete`` is set, so a caller
        persisting the state re-covers the window next run instead of
        silently skipping the never-fetched MIMs (the reference has
        the same gap but logs loud RATE_ERR guidance; here the state
        itself carries the signal)."""
        ids: list[str] = []
        start = 0
        search_halted = False
        while True:
            if start:
                self.pace()
            resp = self.transport(
                search_request(since_date, to_date, start, self.api_key)
            )
            err = classify_response(resp)
            if err == ERR_RATE_LIMIT:
                search_halted = True
                break  # keep what we have (:136-139)
            if err == ERR_INVALID_KEY:
                raise InvalidApiKeyError(resp.text)
            if err:
                raise FetchError(err)
            page = (
                (resp.body or {})
                .get("searchResponse", {})
                .get("entryList", [])
            )
            ids.extend(str(e["entry"]["mimNumber"]) for e in page)
            start += BATCH_SIZE
            if len(page) < BATCH_SIZE:
                break
        entries, state = self.fetch_ids(ids)
        if search_halted or len(state.fetched_ids) < len(ids):
            state.incomplete = True
            state.since_date = since_date.replace("/", "-")
        else:
            state.since_date = to_date.replace("/", "-")
        return entries, state


def write_landing_zone(entries: list[dict], path: str) -> None:
    """Persist fetched entries as the JSON landing-zone document the
    Spark scan reads (:func:`omim_spark.io.readers.read_entry_json`)
    — the driver-side half of the S7 source."""
    with open(path, "w") as f:
        json.dump({"omim": {"entryList": [{"entry": e} for e in entries]}}, f)
