"""TPU idle-wait guard (utils/idle.py): status-file parsing + wait bounds.

The guard serializes the driver-run entry points (bench.py,
__graft_entry__.py) against the tunnel-return watcher jobs
(tools/tunnel_chain_v2.sh; the superseded runbook scripts remain in the
ancestor allowlist), whose append-only status file uses
``<tag> start <date>`` / ``<tag> rc=N <date>`` pairs.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

from attpc_engine_tpu.utils.idle import (
    parse_busy,
    wait_for_tpu_idle,
    watcher_ancestor,
)

IDLE_LOG = """\
runbook start Tue Aug 18 10:34:59 UTC 2026
r4 chain armed Tue Aug 18 12:00:20 UTC 2026
"""

VERIFYING = IDLE_LOG + "port open at Tue Aug 18 13:00:00 UTC 2026, verifying backend\n"

UP = VERIFYING + "[TpuDevice(id=0)]\ntunnel up at Tue Aug 18 13:01:00 UTC 2026\n"

OPEN_JOB = UP + "plain1 start Tue Aug 18 13:01:30 UTC 2026\n"

CLOSED_JOB = OPEN_JOB + "plain1 rc=0 Tue Aug 18 13:20:00 UTC 2026\n"

R4_OPEN = CLOSED_JOB + (
    "runbook done Tue Aug 18 16:00:00 UTC 2026\n"
    "r4 sortbench start Tue Aug 18 16:01:00 UTC 2026\n"
)

R4_CLOSED = R4_OPEN + "r4 sortbench rc=124 Tue Aug 18 16:41:00 UTC 2026\n"


def test_parse_busy_states():
    assert parse_busy("") is None
    # phase markers alone (runbook armed, chain armed) are not jobs
    assert parse_busy(IDLE_LOG) is None
    # the backend-verify python process is a real TPU process
    assert parse_busy(VERIFYING) == "backend-verify"
    assert parse_busy(UP) is None
    assert parse_busy(OPEN_JOB) == "plain1"
    assert parse_busy(CLOSED_JOB) is None
    # r4-chain jobs carry an "r4 " prefix; nonzero/timeout rcs still close
    assert parse_busy(R4_OPEN) == "sortbench"
    assert parse_busy(R4_CLOSED) is None


def test_parse_busy_restart_pairs():
    # a watchdog re-arm appends a second start for the same tag
    text = CLOSED_JOB + "plain1 start Tue Aug 19 01:00:00 UTC 2026\n"
    assert parse_busy(text) == "plain1"
    text += "plain1 rc=0 Tue Aug 19 01:30:00 UTC 2026\n"
    assert parse_busy(text) is None


def test_parse_busy_gave_up_closes_verify():
    text = VERIFYING + "gave up at Tue Aug 18 21:00:00 UTC 2026\n"
    assert parse_busy(text) is None


def test_wait_returns_immediately_when_idle(tmp_path):
    p = tmp_path / "status"
    p.write_text(CLOSED_JOB)
    t0 = time.monotonic()
    wait_for_tpu_idle(status_path=str(p), poll_s=0.05)
    assert time.monotonic() - t0 < 1.0


def test_wait_returns_when_file_missing(tmp_path):
    wait_for_tpu_idle(status_path=str(tmp_path / "nope"))


def test_wait_blocks_then_releases(tmp_path):
    p = tmp_path / "status"
    p.write_text(OPEN_JOB)
    t0 = time.monotonic()
    # writer closes the job from a thread after ~0.3 s
    import threading

    def close():
        time.sleep(0.3)
        p.write_text(CLOSED_JOB)

    th = threading.Thread(target=close)
    th.start()
    wait_for_tpu_idle(status_path=str(p), poll_s=0.05, max_wait_s=10)
    th.join()
    assert 0.25 < time.monotonic() - t0 < 5.0


def test_wait_stale_file_proceeds(tmp_path):
    p = tmp_path / "status"
    p.write_text(OPEN_JOB)
    old = time.time() - 10_000
    os.utime(p, (old, old))
    t0 = time.monotonic()
    wait_for_tpu_idle(status_path=str(p), poll_s=0.05, stale_s=4000)
    assert time.monotonic() - t0 < 1.0


def test_wait_max_wait_bound(tmp_path):
    p = tmp_path / "status"
    p.write_text(OPEN_JOB)
    t0 = time.monotonic()
    wait_for_tpu_idle(status_path=str(p), poll_s=0.05, max_wait_s=0.2)
    assert time.monotonic() - t0 < 2.0


def test_watcher_ancestor_detection():
    # this pytest process is not a watcher descendant
    assert not watcher_ancestor()
    # a child of a shell script named like the watcher IS detected (the
    # script name must appear in an ancestor's cmdline)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "from attpc_engine_tpu.utils.idle import watcher_ancestor; "
        "print(int(watcher_ancestor()))"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        sh = os.path.join(td, "tunnel_runbook.sh")
        with open(sh, "w") as f:
            f.write(f"#!/bin/bash\n{sys.executable} -c \"{code}\" \"$1\"\n")
        os.chmod(sh, 0o755)
        out = subprocess.run(
            [sh, repo], capture_output=True, text=True, timeout=60
        )
    assert out.stdout.strip() == "1", (out.stdout, out.stderr)
