"""Steal-gated hunter for a clean sf0.4 pipeline scaling pair.

The north-rule evidence job is the sidewalk-geometry pipeline
(generate_features) on the 4x street grid, long enough to amortize
per-job driver overhead. The sandbox VM suffers bursty hypervisor
steal, so each leg:

1. waits for a quiet window (30 s with steal < 2% and load1 < 1.5),
2. runs the leg with /tmp/scaling.lock held,
3. records the /proc/stat steal delta over the leg.

A pair is CLEAN when both legs ran under the steal bound. A pure-CPU
burn control (scripts/burn_control.py methodology, inline here) runs
in the SAME window so the efficiency can be read against the host's
deliverable-core ceiling. Appends the pair to BENCH/PIPE4.json.

Usage: python scripts/pipe4_hunt.py [n_low] [max_rounds]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LOCK = Path("/tmp/scaling.lock")
STEAL_MAX = 2.5

LEG_CODE = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1])
import os
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "64")
os.environ.setdefault("SPARK_GRAFT_NPART", "128")
from osm_sidewalkreator_spark.session import get_spark
import osm_sidewalkreator_spark.plans.pipeline as PL
from osm_sidewalkreator_spark.synth import ensure_synth
sf = "/root/repo/data/synth/sf0.4"
ensure_synth(sf)
spark = get_spark(app=f"pipe4_{cpus}")
# untimed warm-up run (bench.py's methodology, and the north-rule
# posture: a 100 TB job amortizes JVM/codegen/arena startup across
# hours). generate_features persists only its own call's tile
# assignment, so the timed second run recomputes ALL real work on a
# warm heap — this is what makes legs valid inside the host's
# fresh-page fault-throttle regime, where a COLD leg times the
# hypervisor's first-touch path instead of the engine.
n_warm = PL.generate_features(spark, sf).count()
PL.release_cached()
t0 = time.time()
n = PL.generate_features(spark, sf).count()
dt = time.time() - t0
assert n == n_warm
print(json.dumps({"cpus": cpus, "rows": n, "seconds": round(dt, 2)}))
"""


def _steal() -> tuple[int, int]:
    f = open("/proc/stat").readline().split()
    v = [int(x) for x in f[1:]]
    return v[7], sum(v)


def _steal_pct(f):
    s0, t0 = _steal()
    out = f()
    s1, t1 = _steal()
    return out, 100.0 * (s1 - s0) / max(t1 - t0, 1)


def _fault_probe() -> dict:
    """Fresh-page fault-rate probe (hostcond): the host has a regime
    where first-touch is throttled to ~9 MB/s/proc at ZERO steal —
    scaling legs launched there measure the throttle, not the engine
    (the 32-wide leg faults from more threads and can even look
    super-linear). Gate on it like steal."""
    sys.path.insert(0, str(REPO))
    from osm_sidewalkreator_spark import hostcond
    return hostcond.stream_probe(1, mb=64, dur=1.0, alloc_deadline=5.0)


def _fault_ok(fp: dict) -> bool:
    return (not fp["alloc_limited"]) and fp["fault_gib_s"] >= 0.5


def _wait_quiet(minutes: int = 30) -> bool:
    for _ in range(minutes * 2):
        s0, t0 = _steal()
        time.sleep(30)
        s1, t1 = _steal()
        steal = 100.0 * (s1 - s0) / max(t1 - t0, 1)
        load1 = float(open("/proc/loadavg").read().split()[0])
        if steal < 2.0 and load1 < 1.5:
            fp = _fault_probe()
            if not _fault_ok(fp):
                # advisory only: the legs warm up untimed first, so
                # the fault-throttle regime doesn't poison the timed
                # sections; the pair record carries the bracket stamps
                print(f"quiet-wait: fault-throttled {fp} "
                      "(advisory - legs are warmed)", flush=True)
            return True
        print(f"quiet-wait: steal {steal:.1f}% load {load1:.1f}",
              flush=True)
    return False


def _leg(cpus: int) -> tuple[dict, float]:
    def run():
        out = subprocess.run([sys.executable, "-c", LEG_CODE, str(cpus)],
                             capture_output=True, text=True, timeout=3600)
        last = [ln for ln in out.stdout.strip().splitlines()
                if ln.startswith("{")]
        if not last:
            raise RuntimeError(out.stderr[-2000:])
        return json.loads(last[-1])
    return _steal_pct(run)


def _leg_retry(cpus: int, attempts: int = 3) -> tuple[dict, float]:
    """Run a leg, retrying (after a short re-quiet wait) when steal
    landed on it — one stolen leg should not discard a round whose
    other leg already ran clean (scaling_run.py has always retried its
    legs; the hunter now does too). Every attempt's steal is printed;
    the RETURNED leg's steal is what the pair records."""
    res, st = _leg(cpus)
    for _ in range(attempts - 1):
        if st <= STEAL_MAX:
            break
        print(f"  retry n={cpus}: steal {st:.2f}% > {STEAL_MAX}",
              flush=True)
        s0, t0 = _steal()
        time.sleep(30)
        s1, t1 = _steal()
        if 100.0 * (s1 - s0) / max(t1 - t0, 1) >= 2.0:
            continue          # still noisy; burn another wait slot
        res, st = _leg(cpus)
    return res, st


def _burn(dur: float) -> int:
    t_end = time.time() + dur
    x, it = 1.0001, 0
    while time.time() < t_end:
        for _ in range(10000):
            x = x * 1.0000001 % 10.0
        it += 1
    return it


def _burn_leg(n: int, dur: float = 20.0) -> tuple[int, float]:
    def run():
        with mp.Pool(n) as p:
            return sum(p.map(_burn, [dur] * n))
    return _steal_pct(run)


def main():
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    max_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = 4 * n_low
    for rnd in range(max_rounds):
        print(f"round {rnd}", flush=True)
        if not _wait_quiet():
            continue
        LOCK.write_text(str(os.getpid()))
        try:
            fault_pre = _fault_probe()
            hi, st_hi = _leg_retry(n_high)
            print(f"  high {hi} steal {st_hi:.2f}%", flush=True)
            if st_hi > STEAL_MAX:
                continue
            lo, st_lo = _leg_retry(n_low)
            print(f"  low {lo} steal {st_lo:.2f}%", flush=True)
            if st_lo > STEAL_MAX:
                continue
            fault_post = _fault_probe()
            # with WARMED legs (untimed first run inside each leg) the
            # fault-throttle regime no longer poisons the timed
            # section — cold-start faulting happens in the warm-up —
            # so the bracket probes are stamped into the record as
            # evidence instead of discarding the pair
            fault_clean = _fault_ok(fault_pre) and _fault_ok(fault_post)
            if not fault_clean:
                print(f"  fault-throttle bracketed the pair "
                      f"({fault_pre} -> {fault_post}); recording with "
                      "stamps (legs are warmed)", flush=True)
            # same-window burn control (hi first: induced steal lives
            # on the oversubscribed leg)
            bh, sbh = _burn_leg(n_high)
            bl, sbl = _burn_leg(n_low)
            # same-window BANDWIDTH ceiling (stream_control.py): the
            # kernel is memory-heavy; a register spin can't see shared
            # memory-system contention
            sys.path.insert(0, str(REPO / "scripts"))
            from stream_control import leg as _stream_leg
            gh, sgh = _stream_leg(n_high, 256)
            gl, sgl = _stream_leg(n_low, 256)
        finally:
            LOCK.unlink(missing_ok=True)
        eff = (lo["seconds"] / hi["seconds"]) / (n_high / n_low)
        ceiling = (bh / bl) / (n_high / n_low)
        bw_ceiling = (gh / gl) / (n_high / n_low)
        pair = {"n_low": n_low, "n_high": n_high,
                "t_low": lo["seconds"], "t_high": hi["seconds"],
                "rows_low": lo["rows"], "rows_high": hi["rows"],
                "steal_low": round(st_lo, 2), "steal_high": round(st_hi, 2),
                "efficiency": round(eff, 3),
                "burn_ceiling_same_window": round(ceiling, 3),
                "burn_steal": {"low": round(sbl, 2),
                               "high": round(sbh, 2)},
                "eff_vs_ceiling": round(eff / ceiling, 3) if ceiling else None,
                "bandwidth_ceiling_same_window": round(bw_ceiling, 3),
                "stream_gib_s": {"low": round(gl, 2), "high": round(gh, 2)},
                "stream_steal": {"low": round(sgl, 2),
                                 "high": round(sgh, 2)},
                "fault_gib_s": {"pre": fault_pre["fault_gib_s"],
                                "post": fault_post["fault_gib_s"]},
                "fault_clean": fault_clean,
                "legs_warmed": True,
                "ts": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())}
        p4 = REPO / "BENCH" / "PIPE4.json"
        data = json.loads(p4.read_text()) if p4.exists() else {"pairs": []}
        data["pairs"].append(pair)
        p4.write_text(json.dumps(data, indent=1))
        print("CLEAN PAIR", json.dumps(pair), flush=True)
        return
    print("GAVE UP", flush=True)


if __name__ == "__main__":
    main()
