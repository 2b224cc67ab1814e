"""Thin alias over bench.py (r10: the wait-retry-provenance loop lives
ONLY in bench.py since r9 — keeping a second loop here caused drift).

Runs bench.py once (it internally pre-waits for a quiet window, retries
up to $SPARK_GRAFT_BENCH_ATTEMPTS, and stamps provenance_clean /
cpu_steal_pct / engine_git_sha), then snapshots the artifacts under the
quiet-record names the round process expects:

  bench_quiet_best.json        <- bench.py's stdout line
  bench_detail_quiet_best.json <- bench_detail.json

Exit status is 0 only for a provenance-clean record.

Usage: python tools/bench_quiet.py [--attempts N]
(--attempts forwards to SPARK_GRAFT_BENCH_ATTEMPTS.)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--attempts", type=int, default=None,
                    help="forwarded to SPARK_GRAFT_BENCH_ATTEMPTS")
    args = ap.parse_args()

    env = dict(os.environ)
    if args.attempts is not None:
        env["SPARK_GRAFT_BENCH_ATTEMPTS"] = str(args.attempts)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    sys.stderr.write(out.stderr)
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        rec = json.loads(line)
    except json.JSONDecodeError:
        print("bench.py produced no parseable record", flush=True)
        return 1
    with open(os.path.join(REPO, "bench_quiet_best.json"), "w") as f:
        json.dump(rec, f, indent=1)
    shutil.copy(os.path.join(REPO, "bench_detail.json"),
                os.path.join(REPO, "bench_detail_quiet_best.json"))
    print(f"headline={rec['value']} clean={rec.get('provenance_clean')} "
          f"steal={rec.get('cpu_steal_pct')} sha={rec.get('engine_git_sha')}",
          flush=True)
    return 0 if rec.get("provenance_clean") else 1


if __name__ == "__main__":
    raise SystemExit(main())
