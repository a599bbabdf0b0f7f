"""Condense the tunnel-return chain's logs into one markdown summary.

The v2 chain (tools/tunnel_chain_v2.sh) leaves its measurements spread
over /tmp/rb_*.log and /tmp/runbook_status. When the tunnel returns late
in a round there may be minutes, not hours, to fold the numbers into
BASELINE.md/docs/roofline.md — this tool does the error-prone part:

    python tools/post_chain_report.py [> report.md]

It prints, per job: rc + wall time from the status file, every JSON
metric line, the bench stage-split stderr lines, the A/B verdict, and
the autoflip outcome — ready to paste. Missing logs are listed, not
fatal (the chain may still be mid-run; pair with utils/idle.parse_busy).
"""

from __future__ import annotations

import json
import re
from datetime import datetime
from pathlib import Path

STATUS = Path("/tmp/runbook_status")
LOGS = Path("/tmp")

# chain job tags in execution order (tools/tunnel_chain_v2.sh)
JOBS = [
    "warm1", "ab", "autoflip", "warm2",
    "r3plain1", "r3rec1", "r3plain2", "r3rec2",
    "ladder", "cold", "prof768", "prof1536", "sortbench",
    "warmfinal",
]

_TS_RE = re.compile(r"(\w{3} \w{3} +\d+ [\d:]+ UTC \d{4})")


def _parse_date(line: str):
    m = _TS_RE.search(line)
    if not m:
        return None
    try:
        return datetime.strptime(m.group(1), "%a %b %d %H:%M:%S %Z %Y")
    except ValueError:
        return None


def parse_status(text: str) -> dict[str, dict]:
    """tag -> {rc, wall_s} from the start/rc line pairs."""
    out: dict[str, dict] = {}
    starts: dict[str, object] = {}
    for line in text.splitlines():
        line = line.strip()
        m = re.match(r"^([a-z0-9_]+) start ", line)
        if m:
            starts[m.group(1)] = _parse_date(line)
            continue
        m = re.match(r"^([a-z0-9_]+) rc=(-?\d+) ", line)
        if m:
            tag, rc = m.group(1), int(m.group(2))
            t0, t1 = starts.get(tag), _parse_date(line)
            wall = (t1 - t0).total_seconds() if t0 and t1 else None
            out[tag] = {"rc": rc, "wall_s": wall}
    return out


def interesting_lines(log: Path) -> list[str]:
    """JSON metric lines + the informative prose lines of one job log."""
    keep: list[str] = []
    try:
        text = log.read_text(errors="replace")
    except OSError:
        return keep
    for line in text.splitlines():
        s = line.strip()
        if not s:
            continue
        if s.startswith("{") and s.endswith("}"):
            try:
                json.loads(s)
            except json.JSONDecodeError:
                continue
            keep.append(s)
        elif s.startswith(("[bench]", "[ladder]", "[tpu-idle]")):
            keep.append(s)
        elif re.match(
            r"^(per-event:|events=|bit-exact|.*compile\+first"
            r"|.*median |flipped|no flip|preferring|identity tests"
            r"|A/B verdict)", s
        ):
            keep.append(s)
    return keep[-40:]  # the tail is what matters for long profiles


def main() -> None:
    print("# Tunnel-return chain report\n")
    status = parse_status(STATUS.read_text()) if STATUS.exists() else {}
    if not status:
        print("(no /tmp/runbook_status — chain has not started)")
    missing = []
    for tag in JOBS:
        log = LOGS / f"rb_{tag}.log"
        st = status.get(tag)
        if st is None and not log.exists():
            missing.append(tag)
            continue
        head = f"## {tag}"
        if st:
            wall = f", {st['wall_s']:.0f}s" if st["wall_s"] is not None else ""
            head += f"  (rc={st['rc']}{wall})"
        print(head)
        for line in interesting_lines(log):
            print(f"    {line}")
        print()
    if missing:
        print(f"missing/not-run: {', '.join(missing)}")
    # chain-level markers
    if STATUS.exists():
        for line in STATUS.read_text().splitlines():
            if re.match(r"^(tunnel up|gave up|chainv2 done|backend init)",
                        line.strip()):
                print(f"status: {line.strip()}")


if __name__ == "__main__":
    main()
