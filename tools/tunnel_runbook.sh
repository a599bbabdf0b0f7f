#!/bin/bash
# Tunnel-return runbook (VERDICT r3 task 1). Waits for the axon TPU
# tunnel, then runs the serialized measurement sequence from CLAUDE.md:
#   1. bench A/B: plain vs recycled writer, interleaved (plain, rec,
#      plain, rec) — same-epoch comparison of the r3 closing host-loop
#      trims + recycled-writer default vs the 315-348 ev/s r3 trail.
#   2. tools/run_ladder.py — BASELINE configs 1-4, first TPU run.
#   3. Cold-warmup measurement with a fresh compile cache (r2 task 5:
#      target <120 s on a good-link day).
#   4. Device-side step profile at batch 768 and 1536 (post-convert-fix).
#   5. Final warm bench.py so the driver's round-end BENCH run hits a
#      warm persistent compile cache.
# ONE TPU process at a time; 30 s gaps so the previous fully winds down.
# Status: /tmp/runbook_status (append-only). Logs: /tmp/rb_*.log.
# Runs from a worktree pinned at the r3 closing commit so round-4 edits
# in the main tree cannot contaminate the r3-validation A/B.
set -u
cd "${RUNBOOK_TREE:-/root/repo/.worktrees/r3}"
S=/tmp/runbook_status
echo "runbook start $(date)" >> "$S"

# Cheap port probe loop (no python, no TPU process) — the relay listens
# on 8113 when up. Verify with a real backend init before proceeding.
up=0
for i in $(seq 1 660); do
  if timeout 5 bash -c 'echo > /dev/tcp/localhost/8113' 2>/dev/null; then
    echo "port open at $(date), verifying backend" >> "$S"
    if timeout 600 python -c "import jax; print(jax.devices())" >> "$S" 2>&1; then
      up=1; break
    fi
    echo "backend init failed despite open port at $(date)" >> "$S"
  fi
  sleep 60
done
if [ "$up" != 1 ]; then echo "gave up at $(date)" >> "$S"; exit 1; fi
echo "tunnel up at $(date)" >> "$S"
sleep 30

export ATTPC_TPU_TIMING=1 ATTPC_CHILD_TIMING=1
run() {  # run <tag> <timeout> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "$tag start $(date)" >> "$S"
  timeout "$to" "$@" > "/tmp/rb_${tag}.log" 2>&1
  echo "$tag rc=$? $(date)" >> "$S"
  sleep 30
}

run plain1 2400 env BENCH_RECYCLE=0 python bench.py
run rec1   2400 env BENCH_RECYCLE=1 python bench.py
run plain2 2400 env BENCH_RECYCLE=0 python bench.py
run rec2   2400 env BENCH_RECYCLE=1 python bench.py
run ladder 3600 env LADDER_SCALE=1 python tools/run_ladder.py
CD=$(mktemp -d)
run cold   2400 env BENCH_CACHE_DIR="$CD" BENCH_EVENTS=2000 python bench.py
rm -rf "$CD"
run prof768  1800 env PROF_EVENTS=768 python tools/profile_detector.py
run prof1536 1800 env PROF_EVENTS=1536 python tools/profile_detector.py
run warmfinal 2400 python bench.py
echo "runbook done $(date)" >> "$S"
