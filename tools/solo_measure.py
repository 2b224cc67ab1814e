"""Steal-gated solo re-measure of a query subset (triage helper).

Usage: python tools/solo_measure.py q_a[,q_b,...] [attempts]

Wraps bench.py's subset mode (which deliberately skips the official
retry loop) in the same quiet gate the official path uses: wait for
load1 < 1 and a 2 s steal probe <= 0.5%, run, and accept only a pass
whose own whole-run steal <= 1% — otherwise retry (default 4 attempts).
Prints one JSON line per attempt and a final BEST line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _steal(win: float = 2.0) -> float:
    def ticks():
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return v[7], sum(v)

    a = ticks()
    time.sleep(win)
    b = ticks()
    return 100 * (b[0] - a[0]) / max(b[1] - a[1], 1)


def main() -> int:
    subset = sys.argv[1]
    attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    best = None
    for i in range(attempts):
        deadline = time.time() + 300
        while time.time() < deadline:
            s, l1 = _steal(), os.getloadavg()[0]
            if s <= 0.5 and l1 < 1.0:
                break
            time.sleep(10)
        env = dict(os.environ, SPARK_GRAFT_BENCH_ONLY=subset)
        out = subprocess.run(
            ["python", os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, timeout=900, cwd=REPO,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            print(f"attempt {i}: unparseable", flush=True)
            continue
        clean = (rec.get("cpu_steal_pct") or 0) <= 1.0
        print(json.dumps({
            "attempt": i, "total": rec["all_queries_total"],
            "steal": rec.get("cpu_steal_pct"), "clean": clean,
            "queries": rec.get("queries") or None,
        }), flush=True)
        if best is None or (clean, -rec["all_queries_total"]) > (best[0], -best[1]):
            best = (clean, rec["all_queries_total"])
        if clean:
            break
    print(f"BEST clean={best[0]} total={best[1]}" if best else "BEST none")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
