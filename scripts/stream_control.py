"""Memory-BANDWIDTH ceiling control (complement of burn_control.py).

The pure-CPU burn control spins registers and therefore measures only
CPU delivery; the geometry kernel is memory-heavy (large NumPy
temporaries), so on a co-tenanted VM its scaling is capped by shared
memory bandwidth that a register spin cannot see (the 10:10 UTC pair
in BENCH/BASELINE.md isolates exactly this). This control measures
the bandwidth ceiling directly: each process repeatedly reduces a
working set far larger than cache (STREAM-like read traffic), and the
aggregate throughput at n_low vs n_high processes gives the
deliverable-bandwidth scaling ceiling:

    ceiling = (bytes/s at n_high) / (bytes/s at n_low) / (n_high/n_low)

A pipeline efficiency at or above this ceiling means the shortfall is
the host's shared memory system, not the engine. Appends to
BENCH/STREAM_CONTROL.json. Usage: python scripts/stream_control.py
[n_low] [n_high] [mb_per_proc]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _steal() -> tuple[int, int]:
    f = open("/proc/stat").readline().split()
    v = [int(x) for x in f[1:]]
    return v[7], sum(v)


def _stream(args) -> int:
    mb, dur = args
    import numpy as np
    a = np.ones(mb * 131072, dtype=np.float64)   # mb MiB of float64
    t_end = time.time() + dur
    it = 0
    s = 0.0
    while time.time() < t_end:
        s += float(a.sum())      # one full read pass over the array
        it += 1
    return it


def leg(n: int, mb: int, dur: float = 20.0) -> tuple[float, float]:
    """(GiB/s aggregate, steal%) for n concurrent stream processes."""
    s0, t0 = _steal()
    t_start = time.time()
    with mp.Pool(n) as p:
        its = p.map(_stream, [(mb, dur)] * n)
    wall = time.time() - t_start
    s1, t1 = _steal()
    gib = sum(its) * mb / 1024.0 / wall
    return gib, 100.0 * (s1 - s0) / max(t1 - t0, 1)


def main():
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    mb = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    g1, st1 = leg(1, mb)
    glo, stlo = leg(n_low, mb)
    ghi, sthi = leg(n_high, mb)
    ceiling = (ghi / glo) / (n_high / n_low)
    rec = {
        "mb_per_proc": mb, "n_low": n_low, "n_high": n_high,
        "gib_s": {"1": round(g1, 2), str(n_low): round(glo, 2),
                  str(n_high): round(ghi, 2)},
        "steal_pct": {"1": round(st1, 2), str(n_low): round(stlo, 2),
                      str(n_high): round(sthi, 2)},
        "bandwidth_ceiling": round(ceiling, 3),
        "saturation_low": round(glo / g1, 2),
        "ts": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
    }
    print(json.dumps(rec, indent=1))
    path = REPO / "BENCH" / "STREAM_CONTROL.json"
    data = json.loads(path.read_text()) if path.exists() else {"runs": []}
    data["runs"].append(rec)
    path.write_text(json.dumps(data, indent=1))


if __name__ == "__main__":
    main()
