#!/bin/bash
# Round-5 end-of-round tunnel-return chain. The tunnel died ~2026-08-20
# 01:00 with the HEAD tree's programs already cached (the 00:13 rewarm
# paid its 3 line-number-shift misses). All round-5 A/Bs are done and
# recorded; the ONLY job left for the silicon is keeping the driver's
# round-end BENCH programs warm and banking one more epoch sample.
#   P1 warm bench (main tree, current defaults)  x2, interleaved
# Status protocol: /tmp/runbook_status `<tag> start` / `<tag> rc=` pairs
# (parsed by attpc_engine_tpu/utils/idle.py so the driver's own runs
# queue behind in-flight jobs instead of overlapping device init).
set -u
cd /root/repo
S=/tmp/runbook_status
echo "chainr5 armed $(date)" >> "$S"

up=0
for i in $(seq 1 720); do
  if timeout 5 bash -c 'echo > /dev/tcp/localhost/8113' 2>/dev/null; then
    echo "port open at $(date), verifying backend" >> "$S"
    if timeout 600 python -c "import jax; print(jax.devices())" >> "$S" 2>&1; then
      up=1; break
    fi
    echo "backend init failed despite open port at $(date)" >> "$S"
  fi
  sleep 60
done
if [ "$up" != 1 ]; then echo "chainr5 gave up at $(date)" >> "$S"; exit 1; fi
echo "tunnel up at $(date)" >> "$S"
sleep 30

run() {  # run <tag> <timeout> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "$tag start $(date)" >> "$S"
  timeout "$to" "$@" > "/tmp/rb_${tag}.log" 2>&1
  echo "$tag rc=$? $(date)" >> "$S"
  sleep 30
}

# BENCH_IDLE_WAIT=0: these ARE the watcher jobs; waiting on their own
# tag would burn the 300 s cap for nothing.
run r5endA 2400 env BENCH_IDLE_WAIT=0 python bench.py
run r5endB 2400 env BENCH_IDLE_WAIT=0 python bench.py
echo "chainr5 done $(date)" >> "$S"
