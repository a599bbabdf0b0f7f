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
    TAG_TIMEOUT_S,
    close_orphans,
    parse_busy,
    wait_for_tpu_idle,
    watcher_ancestor,
)

# Fixture stamps are generated FRESH at import so the open-tag fixtures
# stay within TAG_TIMEOUT_S of "now" (hardcoded dates silently aged into
# orphans once the per-tag age check landed).
_NOW = time.strftime("%a %b %d %H:%M:%S UTC %Y", time.gmtime())

IDLE_LOG = f"""\
runbook start {_NOW}
r4 chain armed {_NOW}
"""

VERIFYING = IDLE_LOG + f"port open at {_NOW}, verifying backend\n"

UP = VERIFYING + f"[TpuDevice(id=0)]\ntunnel up at {_NOW}\n"

OPEN_JOB = UP + f"plain1 start {_NOW}\n"

CLOSED_JOB = OPEN_JOB + f"plain1 rc=0 {_NOW}\n"

R4_OPEN = CLOSED_JOB + (
    f"runbook done {_NOW}\n"
    f"r4 sortbench start {_NOW}\n"
)

R4_CLOSED = R4_OPEN + f"r4 sortbench rc=124 {_NOW}\n"


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
    text = CLOSED_JOB + f"plain1 start {_NOW}\n"
    assert parse_busy(text) == "plain1"
    text += f"plain1 rc=0 {_NOW}\n"
    assert parse_busy(text) is None


def test_parse_busy_gave_up_closes_verify():
    text = VERIFYING + f"gave up at {_NOW}\n"
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


import calendar


def _epoch(stamp: str) -> float:
    return calendar.timegm(time.strptime(stamp, "%a %b %d %H:%M:%S %Z %Y"))


# The exact failure that zeroed round 4's driver artifacts: the `ladder`
# job's watcher died without writing its rc= line, and a later followup
# appended its own (closed) jobs — keeping the file MTIME fresh while the
# orphaned tag stayed open. idle.py's old busy-parse counted starts>rcs
# with no per-tag age check, so bench.py and dryrun_multichip waited
# until the driver's timeout killed them (BENCH_r04/MULTICHIP_r04 rc=124).
R4_POISONED = UP + (
    "ladder start Wed Aug 19 03:24:55 UTC 2026\n"
    "followup armed Wed Aug 19 03:34:56 UTC 2026\n"
    "ab2 start Wed Aug 19 04:58:36 UTC 2026\n"
    "ab2 rc=0 Wed Aug 19 05:14:10 UTC 2026\n"
    "warmpost start Wed Aug 19 05:20:28 UTC 2026\n"
    "warmpost rc=0 Wed Aug 19 05:25:19 UTC 2026\n"
)


def test_parse_busy_orphaned_tag_by_line_age():
    # while `ladder` is within its own job timeout it is genuinely busy
    t_start = _epoch("Wed Aug 19 03:24:55 UTC 2026")
    assert parse_busy(R4_POISONED, now=t_start + 600) == "ladder"
    # once its start stamp is older than any job's own `timeout` wrapper
    # the tag is orphaned — idle, regardless of later file activity
    assert parse_busy(R4_POISONED, now=t_start + TAG_TIMEOUT_S + 1) is None


def test_parse_busy_unparsable_stamp_stays_busy():
    # conservative: a stamp the parser can't read never ages out here
    # (the caller's file-mtime staleness window bounds that case)
    text = UP + "oddjob start not-a-date\n"
    assert parse_busy(text, now=time.time() + 1e9) == "oddjob"


def test_wait_orphaned_tag_fresh_mtime_proceeds(tmp_path):
    """Round-4 regression: orphaned tag + fresh file mtime must proceed."""
    p = tmp_path / "status"
    p.write_text(R4_POISONED)  # mtime = now; `ladder` start is 2026-08-19
    t0 = time.monotonic()
    wait_for_tpu_idle(status_path=str(p), poll_s=0.05, max_wait_s=30)
    assert time.monotonic() - t0 < 2.0
    # and the orphan was closed in the file for shell-side readers
    assert "ladder rc=-1 orphan-closed" in p.read_text()


def test_close_orphans_appends_and_is_idempotent(tmp_path):
    p = tmp_path / "status"
    p.write_text(R4_POISONED)
    assert close_orphans(str(p)) == ["ladder"]
    assert parse_busy(p.read_text()) is None
    assert close_orphans(str(p)) == []
    assert p.read_text().count("orphan-closed") == 1


def test_close_orphans_leaves_live_jobs_alone(tmp_path):
    p = tmp_path / "status"
    stamp = time.strftime("%a %b %d %H:%M:%S UTC %Y", time.gmtime())
    p.write_text(UP + f"livejob start {stamp}\n")
    assert close_orphans(str(p)) == []
    assert "orphan-closed" not in p.read_text()


def test_driver_entry_wait_bounds_under_driver_timeout():
    """The driver kills its runs at ~10 min; the idle waits inside the
    driver entry points must be bounded far below that (round 4's
    unbounded waits turned both artifacts into rc=124 zeros)."""
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for fname, bound in (("bench.py", 300), ("__graft_entry__.py", 240)):
        with open(os.path.join(repo, fname)) as f:
            src = f.read()
        waits = [
            float(m)
            for m in re.findall(r"max_wait_s\s*=\s*(?:float\(os\.environ\."
                                r"get\([^,]+,\s*)?(\d+(?:\.\d+)?)", src)
        ]
        assert waits, f"{fname}: no bounded wait found"
        assert max(waits) <= bound, (fname, waits)


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


def test_parse_busy_rc_excess_does_not_mask_next_start():
    """A synthetic orphan-close racing the job's own late rc= line leaves
    an rc EXCESS; the next genuine start of that tag must still read as
    busy (sequence semantics, not start/rc counting)."""
    text = (
        UP
        + "ab start Wed Aug 19 03:00:00 UTC 2026\n"
        + "ab rc=-1 orphan-closed Wed Aug 19 04:25:00 UTC 2026\n"
        + "ab rc=124 Wed Aug 19 04:26:40 UTC 2026\n"  # late real rc
        + f"ab start {_NOW}\n"  # watchdog re-arms the job
    )
    assert parse_busy(text) == "ab"
    # and once that restart logs its rc the tag is idle again
    assert parse_busy(text + f"ab rc=0 {_NOW}\n") is None


def test_parse_busy_heartbeat_keeps_long_manual_job_alive():
    """`<tag> hb <date>` refreshes an open tag's age: a legitimately-long
    manual job (documented CLAUDE.md runbook convention) survives past
    TAG_TIMEOUT_S as long as it heartbeats."""
    t0 = _epoch("Wed Aug 19 03:00:00 UTC 2026")
    text = UP + "soak start Wed Aug 19 03:00:00 UTC 2026\n"
    # without a heartbeat the tag ages out...
    assert parse_busy(text, now=t0 + TAG_TIMEOUT_S + 60) is None
    # ...with one it stays busy from the heartbeat's stamp
    hb = text + "soak hb Wed Aug 19 04:30:00 UTC 2026\n"
    t_hb = _epoch("Wed Aug 19 04:30:00 UTC 2026")
    assert parse_busy(hb, now=t_hb + 600) == "soak"
    assert parse_busy(hb, now=t_hb + TAG_TIMEOUT_S + 60) is None


def test_parse_busy_stray_heartbeat_cannot_resurrect_closed_tag():
    text = (
        UP
        + "job start Wed Aug 19 03:00:00 UTC 2026\n"
        + "job rc=0 Wed Aug 19 03:10:00 UTC 2026\n"
        + f"job hb {_NOW}\n"  # straggler heartbeat after the close
    )
    assert parse_busy(text) is None
