#!/bin/bash
# Supervisor for the v2 tunnel-return chain: if the chain has exited
# without completing (e.g. its 11 h probe window lapsed with the tunnel
# still down), archive the status file and re-arm it. Exits once
# "chainv2 done" is recorded. PID files only — never matches processes
# by pattern.
set -u
cd /root/repo
S=/tmp/runbook_status

alive() {  # alive <pidfile>
  local f=$1
  [ -f "$f" ] && kill -0 "$(cat "$f")" 2>/dev/null
}

while true; do
  sleep 120
  if grep -q "chainv2 done" "$S" 2>/dev/null; then
    echo "watchdog: chain complete, exiting $(date)" >> "$S"
    exit 0
  fi
  if alive /tmp/chainv2.pid; then
    continue
  fi
  # dead without completion: archive and re-arm
  mv "$S" "$S.$(date +%s)" 2>/dev/null
  echo "watchdog re-arm $(date)" >> "$S"
  nohup bash tools/tunnel_chain_v2.sh >/dev/null 2>&1 &
  echo $! > /tmp/chainv2.pid
done
