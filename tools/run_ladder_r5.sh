#!/bin/bash
# BASELINE ladder, round-5 form: every rung is its OWN process group with
# its OWN timeout, so one hung rung cannot orphan the status tag for the
# rest (the round-4 all-in-one ladder hung in config 3/4 and wedged both
# driver artifacts — VERDICT r4 task 4). Cleanup is pgid-targeted
# (kill -- -PGID), never pattern-based (pkill -f can match this session).
#
# Usage: tools/run_ladder_r5.sh [rungs...]   (default: 1 2 4)
# Env:   LADDER_TIMEOUT per-rung seconds (default 2400), LADDER_* passed
#        through to tools/run_ladder.py. Logs: /tmp/r5_ladder<rung>.log.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
STATUS=/tmp/runbook_status
T="${LADDER_TIMEOUT:-2400}"
RUNGS=("${@:-1}")
if [ $# -eq 0 ]; then RUNGS=(1 2 4); fi

for cfg in "${RUNGS[@]}"; do
  tag="r5ladder${cfg}"
  echo "$tag start $(date -u)" >> "$STATUS"
  setsid env LADDER_CONFIGS="$cfg" python "$REPO/tools/run_ladder.py" \
    > "/tmp/r5_ladder${cfg}.log" 2>&1 &
  pid=$!
  waited=0
  while kill -0 "$pid" 2>/dev/null && [ "$waited" -lt "$T" ]; do
    sleep 10; waited=$((waited + 10))
  done
  if kill -0 "$pid" 2>/dev/null; then
    # rung overran: TERM then KILL the whole process group (writer
    # children, pruner) so no straggler holds the device for the next rung
    kill -TERM -- "-$pid" 2>/dev/null
    sleep 20
    kill -KILL -- "-$pid" 2>/dev/null
    rc=124
  else
    wait "$pid"; rc=$?
  fi
  # sweep any survivors of the group either way (no-op when clean)
  kill -KILL -- "-$pid" 2>/dev/null
  echo "$tag rc=$rc $(date -u)" >> "$STATUS"
  sleep 30   # let the device/tunnel fully wind down between rungs
done
