"""Pure-CPU burn control: iterations of float arithmetic completed by
n spinning processes in a fixed wall window, at n and 4n.

This bounds ANY workload's n->4n scaling on this VM — no memory
traffic, no Spark, no Python-worker overhead, just cycles. The ratio
(work_4n / work_n) / 4 is the hypervisor's deliverable-CPU ceiling;
the north-rule's 0.8 bar must be read against it. Writes
BENCH/BURN_CONTROL.json. Usage: python scripts/burn_control.py [n]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _burn(dur: float) -> int:
    t_end = time.time() + dur
    x, it = 1.0001, 0
    while time.time() < t_end:
        for _ in range(10000):
            x = x * 1.0000001 % 10.0
        it += 1
    return it


def _steal() -> tuple[int, int]:
    f = open("/proc/stat").readline().split()
    v = [int(x) for x in f[1:]]
    return v[7], sum(v)


def _run(n: int, dur: float = 20.0) -> tuple[int, float]:
    s0, t0 = _steal()
    with mp.Pool(n) as p:
        its = p.map(_burn, [dur] * n)
    s1, t1 = _steal()
    return sum(its), round(100 * (s1 - s0) / max(t1 - t0, 1), 2)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    legs = []
    for procs in (n, 4 * n, n, 4 * n):     # interleaved, 2 rounds
        work, st = _run(procs)
        legs.append({"n": procs, "work": work, "steal_pct": st})
        print(f"n={procs}: work={work} steal={st}%", file=sys.stderr)
    best_lo = max(l["work"] for l in legs if l["n"] == n)
    best_hi = max(l["work"] for l in legs if l["n"] == 4 * n)
    eff = round((best_hi / best_lo) / 4, 3)
    out = {"n_low": n, "n_high": 4 * n, "legs": legs,
           "ceiling_efficiency": eff}
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "BURN_CONTROL.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
