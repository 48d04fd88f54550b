"""Clean-window orchestrator: when the host finally leaves the
fault-throttle regime AND steal/load are quiet, run (in order)

1. one pipe4_hunt round  — chasing the raw >= 0.8 8->32 pair, and
2. a bench.py rehearsal  — chasing a <= 25.2 s stamped headline,

holding /tmp/scaling.lock across both so concurrent work knows to
stay off the cores. In throttled windows it does nothing but poll:
throttled pairs/benches are already recorded with stamps; more of
them add no evidence.

Usage: python scripts/clean_window_hunt.py [hours] [n_low]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LOCK = Path("/tmp/scaling.lock")
sys.path.insert(0, str(REPO))
from osm_sidewalkreator_spark import hostcond  # noqa: E402


def _next_rehearsal() -> Path:
    n = 3
    while (REPO / "BENCH" / f"BENCH_r05_rehearsal{n}.json").exists():
        n += 1
    return REPO / "BENCH" / f"BENCH_r05_rehearsal{n}.json"


def main():
    hours = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    n_low = sys.argv[2] if len(sys.argv) > 2 else "8"
    deadline = time.time() + hours * 3600
    windows = 0
    while time.time() < deadline:
        w = hostcond.wait_for_quiet(
            min(20.0, max(1.0, (deadline - time.time()) / 60)))
        if not w["achieved"]:
            print("still throttled/noisy:", json.dumps(w), flush=True)
            continue
        print("CLEAN WINDOW:", json.dumps(w), flush=True)
        LOCK.write_text(str(os.getpid()))
        try:
            subprocess.run(
                [sys.executable, "scripts/pipe4_hunt.py", n_low, "1"],
                cwd=REPO, timeout=3600)
            env = dict(os.environ, SPARK_GRAFT_WAIT_QUIET="0")
            out = subprocess.run(
                [sys.executable, "bench.py"], cwd=REPO, env=env,
                capture_output=True, text=True, timeout=1800)
            lines = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("{")]
            if lines:
                path = _next_rehearsal()
                path.write_text(lines[-1] + "\n")
                val = json.loads(lines[-1])["value"]
                print(f"BENCH REHEARSAL {path.name}: {val}s", flush=True)
        finally:
            LOCK.unlink(missing_ok=True)
        windows += 1
        if windows >= 2:
            break
    print("done; clean windows used:", windows, flush=True)


if __name__ == "__main__":
    main()
