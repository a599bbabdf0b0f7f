#!/bin/bash
# Priority-ordered tunnel-return chain (round 4, v2). Replaces the
# tunnel_runbook.sh + r4_post_runbook.sh pair with ONE strictly serial
# process, ordered so a LATE tunnel return still lands the pieces the
# round is judged on before the nice-to-haves:
#   P1 main-tree warm bench — warms the persistent compile cache for the
#      exact programs the driver's round-end BENCH run executes
#   P2 round-4 kernel A/B (tools/ab_round4.py) + default autoflip; if the
#      defaults flipped, re-warm the flipped-default programs
#   P3 r3-validation interleaved plain/recycle bench A/B from the worktree
#      PINNED AT THE r3 CLOSING COMMIT (.worktrees/r3 — round-4 edits must
#      not contaminate the r3 attribution; VERDICT r3 task 1)
#   P4 ladder (BASELINE configs, r3 tree), cold-warmup with a fresh cache
#      (r2 task 5: <120 s target), step profiles at batch 768/1536,
#      in-VMEM sort microbench
#   P5 final main-tree warm bench at the (possibly flipped) defaults
# ONE TPU process at a time; 30 s gaps so each fully winds down
# (overlapping TPU processes hang device init — CLAUDE.md).
# Status: /tmp/runbook_status (append-only; `<tag> start` / `<tag> rc=`
# pairs are parsed by attpc_engine_tpu/utils/idle.py to keep the driver's
# own runs from overlapping). Logs: /tmp/rb_*.log.
set -u
cd /root/repo
S=/tmp/runbook_status
R3TREE=${RUNBOOK_TREE:-/root/repo/.worktrees/r3}
# the r3 validation tree is pinned by COMMIT HASH, not by gitlink (a
# committed gitlink gives fresh clones a phantom submodule — ADVICE r4).
# Recreate on any box with:
#   git worktree add .worktrees/r3 $R3_PIN
R3_PIN=6d50b63d14b81116f5fcc0320eb47b75fd20f7f2
if [ -d "$R3TREE" ]; then
  have=$(git -C "$R3TREE" rev-parse HEAD 2>/dev/null || echo none)
  if [ "$have" != "$R3_PIN" ]; then
    echo "chain r3 tree at $have != pin $R3_PIN; P3 jobs will be skipped" >> "$S"
    R3TREE=""
  fi
else
  R3TREE=""
fi
echo "chainv2 armed $(date)" >> "$S"

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

# ---- P1: warm the driver's round-end BENCH programs (main tree) ------- #
run warm1 2400 python bench.py

# ---- P2: round-4 kernel A/B + default flip ---------------------------- #
run ab 4800 python tools/ab_round4.py
cp /tmp/rb_ab.log /tmp/r4_ab.log 2>/dev/null  # autoflip reads /tmp/r4_ab.log
head=$(git log -1 --format=%s)
run autoflip 3000 python tools/autoflip_r4.py
if [ "$(git log -1 --format=%s)" != "$head" ]; then
  # defaults flipped -> the driver's BENCH now runs DIFFERENT programs;
  # warm those too
  run warm2 2400 python bench.py
fi

# ---- P3: r3-validation plain/recycle A/B (pinned worktree, x2) -------- #
# python <script path> puts the script's dir first on sys.path, so these
# import the r3 tree's package regardless of cwd
if [ -n "$R3TREE" ]; then
  run r3plain1 2400 env BENCH_RECYCLE=0 python "$R3TREE/bench.py"
  run r3rec1   2400 env BENCH_RECYCLE=1 python "$R3TREE/bench.py"
  run r3plain2 2400 env BENCH_RECYCLE=0 python "$R3TREE/bench.py"
  run r3rec2   2400 env BENCH_RECYCLE=1 python "$R3TREE/bench.py"
fi

# ---- P4: ladder, cold warmup, profiles, sort microbench --------------- #
# main tree (the r4 hang was in the r3 tree's monolithic ladder run;
# run_ladder now also supports per-rung invocation — see LADDER_CONFIGS)
run ladder 3600 env LADDER_SCALE=1 python tools/run_ladder.py
CD=$(mktemp -d)
run cold 2400 env BENCH_CACHE_DIR="$CD" BENCH_EVENTS=2000 python bench.py
rm -rf "$CD"
run prof768  1800 env PROF_EVENTS=768 python tools/profile_detector.py
run prof1536 1800 env PROF_EVENTS=1536 python tools/profile_detector.py
run sortbench 2400 python tools/microbench_sort_pallas.py

# ---- P5: leave the cache warm at the current defaults ----------------- #
run warmfinal 2400 python bench.py
echo "chainv2 done $(date)" >> "$S"
