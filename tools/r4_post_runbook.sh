#!/bin/bash
# Round-4 TPU A/B chain: waits for the r3-pinned runbook to finish (or
# die), then serializes the round-4 kernel A/Bs from the MAIN tree.
# Status appended to /tmp/runbook_status; logs /tmp/r4_*.log.
set -u
cd /root/repo
S=/tmp/runbook_status
echo "r4 chain armed $(date)" >> "$S"
while true; do
  if grep -q "runbook done\|gave up" "$S" 2>/dev/null; then break; fi
  # runbook process gone without finishing? take over only if tunnel is up
  if ! pgrep -f "tools/tunnel_runbook.sh" > /dev/null 2>&1; then
    echo "r4 chain: runbook process gone at $(date)" >> "$S"
    break
  fi
  sleep 120
done
if grep -q "gave up" "$S"; then
  echo "r4 chain: tunnel never came back, exiting $(date)" >> "$S"
  exit 1
fi
# if the runbook died early, verify the tunnel before burning time
if ! grep -q "runbook done" "$S"; then
  if ! timeout 600 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "r4 chain: no tunnel, exiting $(date)" >> "$S"
    exit 1
  fi
fi
sleep 30

run() {
  local tag=$1 to=$2; shift 2
  echo "r4 $tag start $(date)" >> "$S"
  timeout "$to" "$@" > "/tmp/r4_${tag}.log" 2>&1
  echo "r4 $tag rc=$? $(date)" >> "$S"
  sleep 30
}

run sortbench 2400 python tools/microbench_sort_pallas.py
run ab        3600 python tools/ab_round4.py
# flip defaults if the A/B won by >=3% (identity tests re-run, commit);
# runs on CPU, after all TPU work above has fully exited
run autoflip  3000 python tools/autoflip_r4.py
# warm the persistent compile cache at the (possibly flipped) defaults
# so the driver's round-end BENCH run compiles nothing
run benchwarm 2400 python bench.py
echo "r4 chain done $(date)" >> "$S"
