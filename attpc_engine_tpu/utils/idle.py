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

import calendar
import os
import re
import sys
import time

STATUS_PATH = "/tmp/runbook_status"

# Longest single watcher job timeout (tools/tunnel_chain_v2.sh `ab`,
# 4800 s) plus margin. A tag whose LAST `start` line is older than this
# with no matching `rc=` line cannot still be running — its job would
# have been killed by its own `timeout` wrapper — so the watcher died
# without logging (round 4: the `ladder` job orphaned its tag and both
# driver artifacts sat in `[tpu-idle] waiting` until rc=124).
TAG_TIMEOUT_S = 4900.0

# watcher job lines: "plain1 start Tue Aug ..." / "r4 ab rc=0 Tue Aug ..."
_START_RE = re.compile(r"^(?:r4 )?([a-z0-9_]+) start (.+)$")
_RC_RE = re.compile(r"^(?:r4 )?([a-z0-9_]+) rc=-?\d+")
# optional heartbeat for long MANUAL jobs (no chain job emits these):
# "mytag hb <date>" refreshes the tag's age so a legitimately-long run
# (e.g. a multi-hour production soak) outlives TAG_TIMEOUT_S without
# being declared orphaned. Convention for operators:
#   while :; do echo "mytag hb $(date -u)" >> /tmp/runbook_status; sleep 600; done &
_HB_RE = re.compile(r"^(?:r4 )?([a-z0-9_]+) hb (.+)$")
# phase markers that are not start/rc job pairs
_NON_JOBS = {"runbook", "chain"}


def _parse_date(s: str) -> float | None:
    """Epoch seconds for a `date`-style UTC stamp, or None when unparsable."""
    s = s.strip()
    for fmt in ("%a %b %d %H:%M:%S %Z %Y", "%a %b %d %H:%M:%S %Y"):
        try:
            return calendar.timegm(time.strptime(s, fmt))
        except ValueError:
            continue
    return None


def _tag_events(text: str):
    """Walk the status file once: per tag, the LAST event kind
    ("start"/"rc") and the freshest age stamp (last start or heartbeat);
    plus the backend-verify phase flag. Sequence semantics, not counts:
    counting ``starts > rcs`` mis-handles a tag that accumulates an
    rc EXCESS (a waiter's synthetic orphan-close racing the job's own
    late ``rc=`` line) — the next genuine ``start`` would then be
    invisibly masked while its job holds the device."""
    last_event: dict[str, str] = {}
    last_stamp: dict[str, float | None] = {}
    verifying = False
    for line in text.splitlines():
        line = line.strip()
        m = _START_RE.match(line)
        if m and m.group(1) not in _NON_JOBS:
            last_event[m.group(1)] = "start"
            last_stamp[m.group(1)] = _parse_date(m.group(2))
            continue
        m = _RC_RE.match(line)
        if m:
            last_event[m.group(1)] = "rc"
            continue
        m = _HB_RE.match(line)
        if m and m.group(1) not in _NON_JOBS:
            # heartbeat refreshes the age of an OPEN tag only; a stray hb
            # after the rc must not resurrect a closed tag
            if last_event.get(m.group(1)) == "start":
                last_stamp[m.group(1)] = _parse_date(m.group(2))
            continue
        if line.startswith("port open at"):
            verifying = True
        elif (
            line.startswith("tunnel up at")
            or line.startswith("backend init failed")
            or line.startswith("gave up at")
            or line.startswith("runbook done")
        ):
            verifying = False
    return last_event, last_stamp, verifying


def parse_busy(text: str, now: float | None = None,
               tag_timeout_s: float = TAG_TIMEOUT_S) -> str | None:
    """Return the tag of an in-flight watcher job, or None when idle.

    A job is in flight when its tag's MOST RECENT event is a ``start``
    line (sequence semantics — restart pairs and synthetic orphan-closes
    compose correctly) AND its freshest stamp (last ``start``, or a
    ``hb`` heartbeat for long manual jobs) is younger than
    ``tag_timeout_s`` (every chain job runs under ``timeout`` shorter
    than that bound, so an older open tag means the watcher died without
    logging its ``rc=`` — the tag is ORPHANED, not busy). An unparsable
    stamp keeps the tag busy (conservative); the caller's file-mtime
    staleness window still bounds that case. The runbook's initial
    backend verification (a real TPU process that logs no start/rc pair)
    is tracked through its own phase markers.
    """
    if now is None:
        now = time.time()
    last_event, last_stamp, verifying = _tag_events(text)
    for tag, ev in last_event.items():
        if ev == "start":
            t0 = last_stamp.get(tag)
            if t0 is not None and now - t0 > tag_timeout_s:
                continue  # orphaned: older than any job's own timeout
            return tag
    if verifying:
        return "backend-verify"
    return None


def close_orphans(status_path: str = STATUS_PATH,
                  tag_timeout_s: float = TAG_TIMEOUT_S) -> list[str]:
    """Append a synthetic ``<tag> rc=-1`` line for every orphaned tag.

    Best-effort recovery bookkeeping: a watcher that died mid-job leaves
    its tag open forever; closing it in the file (rather than only
    age-filtering at parse time) makes the record self-describing for
    shell-side readers like tools/chain_followup scripts. Returns the
    tags closed."""
    try:
        with open(status_path) as f:
            text = f.read()
    except OSError:
        return []
    now = time.time()
    closed = []
    # tags parse_busy skips on age (open by sequence, aged out) are the
    # orphans; closing them keeps the file self-describing
    if parse_busy(text, now=now, tag_timeout_s=tag_timeout_s) is None:
        last_event, _, _ = _tag_events(text)
        stamp = time.strftime("%a %b %d %H:%M:%S UTC %Y", time.gmtime(now))
        closed = [tag for tag, ev in last_event.items() if ev == "start"]
        if closed:
            try:
                with open(status_path, "a") as f:
                    for tag in closed:
                        f.write(f"{tag} rc=-1 orphan-closed {stamp}\n")
            except OSError:
                return []
    return closed


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
    caller is a watcher descendant, or when every open tag is ORPHANED —
    its last ``start`` stamp older than ``TAG_TIMEOUT_S`` (per-tag age
    from the line's own timestamp, NOT file mtime: round 4's `ladder`
    job died without its ``rc=`` line while later appends kept the mtime
    fresh, and the driver's bench + dryrun both wedged to rc=124). The
    file-mtime window ``stale_s`` remains as the fallback for stamps the
    parser can't read; it MUST exceed the longest single watcher job
    timeout (4800 s, tools/tunnel_chain_v2.sh's ``ab`` job).
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
            closed = close_orphans(status_path)
            if closed:
                print(
                    f"[tpu-idle] closed orphaned watcher tags {closed} "
                    "(start older than the per-tag timeout; watcher died "
                    "without logging rc)",
                    file=sys.stderr,
                )
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
