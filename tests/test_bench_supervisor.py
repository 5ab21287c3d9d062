"""bench.py supervisor: outage-aware retry semantics (VERDICT r3 item 1).

The supervisor must (a) pass a healthy child's headline through and exit 0,
(b) retry a failed attempt within the budget and succeed when the tunnel
recovers, (c) treat a post-headline diagnostics stall as success, and
(d) give up with rc=2 only after the retry budget is exhausted.

Uses the VST_BENCH_FAKE_CHILD hook so no backend is touched; each test runs
the real ``python bench.py`` entry point as a subprocess.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

BENCH = str(Path(__file__).resolve().parent.parent / "bench.py")


def _run(env_extra, timeout=60):
    env = dict(os.environ)
    env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        env=env,
        timeout=timeout,
    )
    return proc


def _headline_lines(stdout):
    out = []
    for line in stdout.splitlines():
        try:
            parsed = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "metric" in parsed and "unit" in parsed:
            out.append(parsed)
    return out


def test_healthy_child_passes_headline_through():
    proc = _run({"VST_BENCH_FAKE_CHILD": "ok"})
    assert proc.returncode == 0
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["unit"] == "images/sec/chip"


def test_retry_recovers_after_one_failed_attempt(tmp_path):
    marker = tmp_path / "attempted"
    t0 = time.monotonic()
    proc = _run(
        {
            "VST_BENCH_FAKE_CHILD": "fail_then_ok",
            "VST_BENCH_FAKE_MARKER": str(marker),
            "VST_BENCH_RETRY_WAIT_S": "1",
            "VST_BENCH_BUDGET_S": "600",
        }
    )
    assert proc.returncode == 0
    assert len(_headline_lines(proc.stdout)) == 1
    assert marker.exists()  # first attempt really ran and failed
    assert "retrying" in proc.stderr
    assert time.monotonic() - t0 >= 1.0  # waited between attempts


def test_stall_after_headline_counts_as_success():
    # Attempt timeout must cover python+numpy startup on this host's single
    # slow core UNDER LOAD (a 3 s margin flaked when the full suite ran
    # alongside: the child was killed before it could print the headline,
    # and the supervisor slept the default 600 s retry wait). Keep the
    # retry wait short so even a too-slow first attempt cannot stall the
    # test; the child hangs for 3600 s after its headline, so finishing
    # within the outer timeout at all proves the stalled child was killed.
    t0 = time.monotonic()
    proc = _run(
        {
            "VST_BENCH_FAKE_CHILD": "stall_after",
            "VST_BENCH_ATTEMPT_TIMEOUT_S": "30",
            "VST_BENCH_RETRY_WAIT_S": "1",
        },
        timeout=180,
    )
    assert proc.returncode == 0
    assert len(_headline_lines(proc.stdout)) == 1
    assert "treating as success" in proc.stderr
    assert time.monotonic() - t0 < 150  # killed the stalled child promptly


def test_gives_up_with_rc2_when_budget_exhausted():
    proc = _run(
        {
            "VST_BENCH_FAKE_CHILD": "fail",
            "VST_BENCH_RETRY_WAIT_S": "1",
            "VST_BENCH_BUDGET_S": "2",
        }
    )
    assert proc.returncode == 2
    assert _headline_lines(proc.stdout) == []
    assert "giving up" in proc.stderr
