"""Host-condition capture: make benchmark artifacts self-validating.

The sandbox VM is co-tenanted: hypervisor steal and a shared memory
system mean two runs of identical code can differ 1.4x by wall-clock
window (round 4's headline regressed 25->36 s with bit-identical
counters and unchanged plans — adjudicated probably-host, but the
bench JSON carried no evidence either way). This module closes that
gap: every bench emission stamps

* steal% sampled BEFORE the run (3 s probe) and cumulatively DURING
  the timed section (/proc/stat delta),
* 1-minute loadavg at start,
* a short STREAM-like memory-bandwidth probe (same methodology as
  ``scripts/stream_control.py``) at 1 proc and at the bench
  parallelism, before and after the timed section — the wide-leg
  GiB/s is the figure the hypervisor pins in bad windows
  (7-9 GiB/s afternoon vs 18-51 GiB/s narrow/morning).

A reader of BENCH_r*.json can now separate "the code got slower"
from "the host got slower" without out-of-band docs.

``wait_for_quiet`` optionally polls for a low-steal window first
(the ``scripts/pipe4_hunt.py`` gate), bounded by a deadline so an
unattended bench never hangs.
"""

from __future__ import annotations

import multiprocessing as mp
import time


def _steal_ticks() -> tuple[int, int]:
    parts = open("/proc/stat").readline().split()
    v = [int(x) for x in parts[1:]]
    return v[7], sum(v)


def steal_probe(seconds: float = 3.0) -> float:
    """Steal%% over a quiet sleep window of ``seconds``."""
    s0, t0 = _steal_ticks()
    time.sleep(seconds)
    s1, t1 = _steal_ticks()
    return 100.0 * (s1 - s0) / max(t1 - t0, 1)


def load1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def _stream_worker(args) -> int:
    mb, dur = args
    import numpy as np
    a = np.ones(mb * 131072, dtype=np.float64)
    t_end = time.time() + dur
    it, s = 0, 0.0
    while time.time() < t_end:
        s += float(a.sum())
        it += 1
    return it


def stream_probe(n_procs: int, mb: int = 256, dur: float = 5.0) -> float:
    """Aggregate read bandwidth (GiB/s) of ``n_procs`` concurrent
    STREAM-like reducers over cache-busting arrays."""
    t0 = time.time()
    with mp.Pool(n_procs) as p:
        its = p.map(_stream_worker, [(mb, dur)] * n_procs)
    wall = time.time() - t0
    return sum(its) * mb / 1024.0 / wall


def wait_for_quiet(max_minutes: float, steal_max: float = 2.0,
                   load_max: float = 1.5,
                   interval: float = 30.0) -> dict:
    """Poll until a quiet window (steal and load below bounds) or the
    deadline; returns what happened so the caller can stamp it."""
    t0 = time.time()
    polls = 0
    while True:
        s = steal_probe(interval)
        ld = load1()
        polls += 1
        if s < steal_max and ld < load_max:
            return {"achieved": True, "waited_sec": round(time.time() - t0),
                    "polls": polls, "final_steal_pct": round(s, 2),
                    "final_load1": ld}
        if (time.time() - t0) / 60.0 >= max_minutes:
            return {"achieved": False, "waited_sec": round(time.time() - t0),
                    "polls": polls, "final_steal_pct": round(s, 2),
                    "final_load1": ld}


class HostMonitor:
    """Bracket a timed section; ``stop()`` yields the stamp dict."""

    def __init__(self, n_wide: int, probe_sec: float = 3.0,
                 stream_sec: float = 5.0):
        self.n_wide = max(int(n_wide), 1)
        self.stream_sec = stream_sec
        self.pre = {
            "steal_pct": round(steal_probe(probe_sec), 2),
            "load1": load1(),
            "stream_gib_s_1": round(stream_probe(1, dur=stream_sec / 2), 2),
            "stream_gib_s_wide": round(
                stream_probe(self.n_wide, dur=stream_sec), 2),
        }
        self._t0 = None
        self._s0 = None

    def start(self):
        self._s0 = _steal_ticks()
        self._t0 = time.time()

    def stop(self) -> dict:
        s1, t1 = _steal_ticks()
        s0, t0 = self._s0
        during = 100.0 * (s1 - s0) / max(t1 - t0, 1)
        post_wide = round(stream_probe(self.n_wide, dur=self.stream_sec), 2)
        stamp = {
            "pre": self.pre,
            "steal_pct_during": round(during, 2),
            "post": {"stream_gib_s_wide": post_wide},
            "n_wide": self.n_wide,
            "ts_utc": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
            # one-glance adjudication: quiet iff steal stayed under the
            # pipe4_hunt gate both before and during the timed section
            "quiet": bool(self.pre["steal_pct"] < 2.0 and during < 2.0),
        }
        return stamp
