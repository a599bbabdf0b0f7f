"""Serialize TPU entry points against the watcher jobs on this box.

Two TPU-backed processes overlapping — even one starting while another
winds down — can hang device init past a 10-minute timeout (measured;
CLAUDE.md "NEVER let two TPU processes overlap"). The tunnel-return
watcher chain (``tools/tunnel_chain_v2.sh``)
already serializes its own jobs through an append-only status file
(``/tmp/runbook_status``: ``<tag> start <date>`` / ``<tag> rc=N <date>``
pairs). This module lets *other* entry points — ``bench.py`` and
``__graft_entry__.py``, which the round driver runs on its own schedule —
wait until no watcher job is in flight before touching the device.
(``tunnel_runbook.sh``/``r4_post_runbook.sh`` were the superseded first
generation, since deleted; their names stay in the ancestor allowlist so
an archived status file or a straggler process is still recognized.)

The wait is skipped when the caller is itself a descendant of a watcher
script (the watchers run ``bench.py`` as their own serialized jobs — the
job's ``start`` line is written before the child execs, so the child
would otherwise dead-wait on its own tag).
"""

from __future__ import annotations

import os
import re
import sys
import time
from collections import Counter

STATUS_PATH = "/tmp/runbook_status"

# watcher job lines: "plain1 start Tue Aug ..." / "r4 ab rc=0 Tue Aug ..."
_START_RE = re.compile(r"^(?:r4 )?([a-z0-9_]+) start ")
_RC_RE = re.compile(r"^(?:r4 )?([a-z0-9_]+) rc=-?\d+")
# phase markers that are not start/rc job pairs
_NON_JOBS = {"runbook", "chain"}


def parse_busy(text: str) -> str | None:
    """Return the tag of an in-flight watcher job, or None when idle.

    A job is in flight when its tag has more ``start`` lines than ``rc=``
    lines. The runbook's initial backend verification (a real TPU process
    that logs no start/rc pair) is tracked through its own phase markers.
    """
    starts: Counter[str] = Counter()
    rcs: Counter[str] = Counter()
    verifying = False
    for line in text.splitlines():
        line = line.strip()
        m = _START_RE.match(line)
        if m and m.group(1) not in _NON_JOBS:
            starts[m.group(1)] += 1
        m = _RC_RE.match(line)
        if m:
            rcs[m.group(1)] += 1
        if line.startswith("port open at"):
            verifying = True
        elif (
            line.startswith("tunnel up at")
            or line.startswith("backend init failed")
            or line.startswith("gave up at")
            or line.startswith("runbook done")
        ):
            verifying = False
    for tag, n in starts.items():
        if n > rcs.get(tag, 0):
            return tag
    if verifying:
        return "backend-verify"
    return None


def watcher_ancestor() -> bool:
    """True when any ancestor process is one of the watcher scripts."""
    pid = os.getpid()
    try:
        for _ in range(20):
            with open(f"/proc/{pid}/stat") as f:
                # field 4 (after the parenthesized comm, which may itself
                # contain spaces) is the ppid
                ppid = int(f.read().rsplit(")", 1)[1].split()[1])
            if ppid <= 1:
                return False
            with open(f"/proc/{ppid}/cmdline", "rb") as f:
                argv = f.read().decode(errors="replace").split("\0")
            # whole-argv basename match only: a shell whose -c STRING merely
            # mentions a watcher script (e.g. an interactive command that
            # syntax-checks it) must not count as running one
            names = {
                "tunnel_runbook.sh", "r4_post_runbook.sh",
                "tunnel_chain_v2.sh", "chain_followup_r4.sh",
            }
            if any(os.path.basename(a) in names for a in argv if a):
                return True
            pid = ppid
    except OSError:
        return False
    return False


def wait_for_tpu_idle(
    status_path: str = STATUS_PATH,
    max_wait_s: float = 7200.0,
    stale_s: float = 5400.0,
    poll_s: float = 30.0,
) -> None:
    """Block until the watcher status file shows no job in flight.

    Returns immediately when the status file does not exist, when the
    caller is a watcher descendant, or when the file has not been touched
    for ``stale_s`` seconds. ``stale_s`` MUST exceed the longest single
    watcher job timeout (currently 4800 s, tools/tunnel_chain_v2.sh's
    ``ab`` job) — the file is only appended at job start/end, so a
    shorter window would declare a still-running job dead and start an
    overlapping TPU process. An open tag on a file stale past that bound
    means the watcher itself was killed.
    Gives up (and proceeds) after ``max_wait_s``.
    """
    if watcher_ancestor():
        return
    deadline = time.monotonic() + max_wait_s
    announced: str | None = None
    while True:
        try:
            st = os.stat(status_path)
            with open(status_path) as f:
                busy = parse_busy(f.read())
        except OSError:
            return
        if busy is None:
            if announced is not None:
                print(f"[tpu-idle] job '{announced}' finished; proceeding",
                      file=sys.stderr)
            return
        if time.time() - st.st_mtime > stale_s:
            print(
                f"[tpu-idle] open job '{busy}' but status file stale "
                f"(> {stale_s:.0f}s); assuming the watcher died, proceeding",
                file=sys.stderr,
            )
            return
        if time.monotonic() > deadline:
            print(
                f"[tpu-idle] gave up after {max_wait_s:.0f}s waiting on "
                f"job '{busy}'; proceeding",
                file=sys.stderr,
            )
            return
        if busy != announced:
            print(
                f"[tpu-idle] watcher TPU job '{busy}' in flight; waiting "
                "(overlapping TPU processes hang device init — CLAUDE.md)",
                file=sys.stderr,
            )
            announced = busy
        time.sleep(poll_s)
