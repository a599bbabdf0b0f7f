#!/bin/bash
# Supervisor for the tunnel-return watchers: if BOTH the runbook
# (tools/tunnel_runbook.sh) and the r4 chain (tools/r4_post_runbook.sh)
# have exited without the chain completing (e.g. the runbook's 11 h
# probe window lapsed with the tunnel still down), archive the status
# file and re-arm a fresh pair. Exits once "r4 chain done" is recorded.
# PID files only — never matches processes by pattern.
set -u
cd /root/repo
S=/tmp/runbook_status

alive() {  # alive <pidfile>
  local f=$1
  [ -f "$f" ] && kill -0 "$(cat "$f")" 2>/dev/null
}

while true; do
  sleep 120
  if grep -q "r4 chain done" "$S" 2>/dev/null; then
    echo "watchdog: chain complete, exiting $(date)" >> "$S"
    exit 0
  fi
  if alive /tmp/runbook.pid || alive /tmp/r4chain.pid; then
    continue
  fi
  # both dead without completion: archive and re-arm
  mv "$S" "$S.$(date +%s)" 2>/dev/null
  echo "watchdog re-arm $(date)" >> "$S"
  nohup bash tools/tunnel_runbook.sh >/dev/null 2>&1 &
  echo $! > /tmp/runbook.pid
  sleep 5
  nohup bash tools/r4_post_runbook.sh >/dev/null 2>&1 &
  echo $! > /tmp/r4chain.pid
done
