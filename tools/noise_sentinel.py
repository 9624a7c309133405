"""Background wall-time canary for bench runs.

The r13 box exposed a contamination mode the settle-gate probes can't
see: the calibration probes read AT their idle floors immediately
before and after the timed region, yet individual runs inside it
varied 2-5x on byte-identical code (BENCH_HISTORY r13 forensics).
The interference is hypervisor-level (other tenants on the host
stealing whole scheduling windows mid-run), bursty on a seconds
timescale — invisible to probes that sample only at the region's
edges, and only partially visible in guest loadavg or /proc/stat
steal accounting.

``NoiseSentinel`` samples DURING the timed region: a daemon thread
burns a fixed ~15-20 ms pure-Python loop every ``period`` seconds and
records each burn's wall time.  On a healthy host the samples are
tightly clustered at the loop's natural cost; a stolen scheduling
window stretches whichever samples it overlaps to a multiple of the
baseline.  The summary is compact enough for the bench artifact's
1900-byte line and turns "this draw looks slow" into "the host stole
time mid-draw, here is the count" — attributable from the artifact
alone, the same bar the calibration block meets.

GIL note: the main bench thread spends the timed region blocked in
py4j socket reads (the JVM executes the queries), so the GIL is free
and a ~15 ms burn every 500 ms (~3% of one core on a 32-core box)
does not perturb the measurement.  The burn is pure Python on
purpose — it measures exactly what a stolen window does to
single-thread progress, independent of Spark state.
"""

from __future__ import annotations

import threading
import time


class NoiseSentinel:
    def __init__(self, period: float = 0.5, n_iter: int = 150_000):
        self.period = period
        self.n_iter = n_iter
        self.samples: list[float] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _run(self) -> None:
        n = self.n_iter
        while not self._stop.is_set():
            t0 = time.perf_counter()
            x = 0
            for i in range(n):
                x += i * i
            self.samples.append(time.perf_counter() - t0)
            self._stop.wait(self.period)

    def start(self) -> "NoiseSentinel":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> dict:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
        return summarize(self.samples)


def summarize(samples: list[float]) -> dict:
    """Compact noise summary: sample count, count of samples stretched
    past 3x the observed baseline (min sample — the thread's natural
    cost on THIS interpreter), and the worst stretch factor.  A clean
    region reads {"n": N, "slow3x": 0, "worst": ~1.x}; a burst-hit
    region shows slow3x > 0 with worst at the stolen-window multiple."""
    if not samples:
        return {"n": 0, "slow3x": 0, "worst": 0.0}
    base = min(samples)
    return {
        "n": len(samples),
        "slow3x": sum(1 for s in samples if s > 3 * base),
        "worst": round(max(samples) / base, 1),
    }
