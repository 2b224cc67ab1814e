"""Quiet-host bench harness (SUPERSEDED for official records since r9:
bench.py itself now owns the wait-retry-provenance loop on its default
path and stamps provenance_clean/bench_attempts; this wrapper remains for
manual multi-invocation sweeps): wait for a quiet window, run bench.py, and
retry until a run is clean by its OWN provenance (start loadavg, end
loadavg, cpu_steal_pct) — the r8 lesson is that co-tenant CPU bursts are
invisible to guest loadavg until they hit, so single bench invocations on
a shared box routinely read 15-40% slow (five same-code runs spanned
20.3-26.2 s headline in one evening; one load_avg_end hit 13.7).

Usage: python tools/bench_quiet.py [--attempts 5] [--accept 21.5]
Keeps the BEST run's stdout line as bench_quiet_best.json and its detail
as bench_detail.json; prints a per-attempt log.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_quiet(l1_max: float = 0.5, l5_max: float = 1.3, timeout_s: int = 1800) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        l1, l5, _ = os.getloadavg()
        if l1 < l1_max and l5 < l5_max:
            return
        time.sleep(30)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--attempts", type=int, default=5)
    ap.add_argument("--accept", type=float, default=None,
                    help="stop early when headline <= this AND load_end/steal clean")
    ap.add_argument("--load-end-max", type=float, default=4.5)
    ap.add_argument("--steal-max", type=float, default=1.0)
    args = ap.parse_args()

    best = None
    for attempt in range(1, args.attempts + 1):
        wait_quiet()
        print(f"attempt {attempt} start {time.strftime('%H:%M:%S')} "
              f"load {os.getloadavg()}", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                capture_output=True, text=True, timeout=1800, cwd=REPO,
            )
        except subprocess.TimeoutExpired:
            # a hung bench on a degraded host is exactly the condition
            # the retry loop exists for — count the attempt, keep going
            print(f"attempt {attempt}: bench timed out after 1800 s", flush=True)
            continue
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            print(f"attempt {attempt}: unparseable bench output", flush=True)
            continue
        clean = (
            rec["load_avg_end"][0] <= args.load_end_max
            and (rec.get("cpu_steal_pct") or 0) <= args.steal_max
        )
        print(f"attempt {attempt}: headline={rec['value']} "
              f"load_end={rec['load_avg_end'][0]} steal={rec.get('cpu_steal_pct')} "
              f"clean={clean}", flush=True)
        # a clean run always outranks a dirty one; among equals, fastest
        # wins — and the kept record carries its own adjudication, so a
        # best that never met the provenance gate is machine-readably
        # dirty, not a silently-blessed quiet number
        better = best is None or (
            (clean, -rec["value"]) > (best["provenance_clean"], -best["value"])
        )
        if better:
            best = {**rec, "provenance_clean": clean}
            with open(os.path.join(REPO, "bench_quiet_best.json"), "w") as f:
                json.dump(best, f, indent=1)
            shutil.copy(os.path.join(REPO, "bench_detail.json"),
                        os.path.join(REPO, "bench_detail_quiet_best.json"))
        if clean and (args.accept is None or rec["value"] <= args.accept):
            print("clean run accepted", flush=True)
            break
    print(f"BEST: {best['value'] if best else None} "
          f"clean={best.get('provenance_clean') if best else None}")
    return 0 if best and best.get("provenance_clean") else 1


if __name__ == "__main__":
    raise SystemExit(main())
