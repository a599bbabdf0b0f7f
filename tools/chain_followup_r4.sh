#!/bin/bash
# Post-chain follow-up (round 4, armed after the Mosaic lowering fixes,
# commit 67de7ed): the first on-TPU kernel A/B failed every new-kernel
# combo on weak-typed 64-bit leaks that are now fixed, so the A/B must
# be re-run once tools/tunnel_chain_v2.sh drains. Strictly serial, same
# status-file tag convention (/tmp/runbook_status) so utils/idle.py
# keeps the driver's own bench/entry runs from overlapping a job.
#   ab2       — re-run the 6-combo kernel A/B with the fixed kernels
#   autoflip2 — flip EngineParams defaults + commit on a >=3% win
#   warmpost  — leave the compile cache warm at the (possibly flipped)
#               defaults for the driver's round-end BENCH run
set -u
cd /root/repo
S=/tmp/runbook_status
echo "followup armed $(date)" >> "$S"

# wait (up to 4 h) for the v2 chain to finish. The chain may also DIE
# mid-sequence (it runs in the build session's process group and is
# killed with it) — detect that as a status file stale past the longest
# single job timeout (4800 s) and proceed anyway: every chain job
# append-logs at start AND end, so >80 min of silence means no job is
# running. Mirrors utils/idle.py's stale-window logic.
ok=0
for i in $(seq 1 480); do
  if grep -q "chainv2 done" "$S" 2>/dev/null; then ok=1; break; fi
  if [ -f "$S" ]; then
    age=$(( $(date +%s) - $(stat -c %Y "$S") ))
    if [ "$age" -gt 4900 ]; then
      echo "followup: chain status stale ${age}s, assuming chain dead $(date)" >> "$S"
      ok=1; break
    fi
  fi
  sleep 30
done
if [ "$ok" != 1 ]; then echo "followup gave up $(date)" >> "$S"; exit 1; fi
sleep 30

export ATTPC_TPU_TIMING=1 ATTPC_CHILD_TIMING=1
run() {  # run <tag> <timeout> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "$tag start $(date)" >> "$S"
  timeout "$to" "$@" > "/tmp/rb_${tag}.log" 2>&1
  echo "$tag rc=$? $(date)" >> "$S"
  sleep 30
}

run ab2 4800 python tools/ab_round4.py
cp /tmp/rb_ab2.log /tmp/r4_ab.log 2>/dev/null  # autoflip reads /tmp/r4_ab.log
run autoflip2 3000 python tools/autoflip_r4.py
run warmpost 2400 python bench.py
echo "followup done $(date)" >> "$S"
