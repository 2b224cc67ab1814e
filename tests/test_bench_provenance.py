"""Bench-record provenance gate (r10, judge ask #3).

Two rounds in a row a committed quiet bench artifact predated the last
engine commit by minutes, and the judge had to adjudicate which number
matched HEAD by timestamps. bench.py now stamps ``engine_git_sha`` into
every record; this test pins the durable property for every committed
record that carries the stamp:

    between the engine commit the bench ran on (``engine_git_sha``) and
    the commit that committed the record file, NO engine path changed.

That property holds forever (later rounds' engine commits land after the
record's own commit, not inside the checked range), so the gate never
goes stale. Records predating the stamp (r9 and earlier) are skipped —
their provenance was already adjudicated by the r9 judge.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENGINE_PATHS = ["hive_json_spark", "bench.py", "__spark_entry__.py"]


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, timeout=30
    ).stdout.strip()


def _quiet_records() -> list[str]:
    names = sorted(
        glob.glob(os.path.join(REPO, "BENCH_quiet_r*.json"))
        + [os.path.join(REPO, "bench_quiet_best.json")]
        + [os.path.join(REPO, "bench_detail_quiet_best.json")]
    )
    return [p for p in names if os.path.exists(p)]


@pytest.mark.parametrize(
    "path", _quiet_records(), ids=[os.path.basename(p) for p in _quiet_records()]
)
def test_committed_quiet_record_matches_engine_sha(path):
    if not _git("rev-parse", "--git-dir"):
        pytest.skip("not a git checkout")
    with open(path) as f:
        rec = json.load(f)
    sha = rec.get("engine_git_sha")
    if sha is None:
        pytest.skip("pre-r10 record without engine_git_sha (adjudicated by hand)")
    assert not sha.endswith("-dirty"), (
        f"{os.path.basename(path)} was produced on a dirty engine tree — "
        "commit the engine first, then regenerate the record"
    )
    rel = os.path.relpath(path, REPO)
    if _git("status", "--porcelain", "--", rel):
        pytest.skip("record not yet committed — validated once it lands")
    rec_commit = _git("log", "-1", "--format=%H", "--", rel)
    if not rec_commit:
        pytest.skip("record never committed")
    # the bench's engine sha must be an ancestor of (or equal to) the
    # commit that committed the record…
    anc = subprocess.run(
        ["git", "merge-base", "--is-ancestor", sha, rec_commit],
        cwd=REPO, capture_output=True, timeout=30,
    )
    assert anc.returncode == 0, (
        f"{os.path.basename(path)}: engine_git_sha {sha[:12]} is not an "
        f"ancestor of the record's own commit {rec_commit[:12]}"
    )
    # …and no engine path may have changed in between: the record must
    # describe the engine as committed, not an earlier snapshot
    drift = _git("log", "--format=%H", f"{sha}..{rec_commit}", "--", *ENGINE_PATHS)
    assert not drift, (
        f"{os.path.basename(path)}: engine commits landed between the "
        f"benched sha {sha[:12]} and the record's commit "
        f"{rec_commit[:12]}: {drift.splitlines()}"
    )
