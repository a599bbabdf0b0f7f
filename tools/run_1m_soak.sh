#!/bin/bash
# 1M-event production soak (BASELINE ladder config 5) with bounded disk
# use: the full Spyral HDF5 output is written through the normal writer
# path, each completed run file is size-verified and then pruned so the
# retained set stays at 3 files (~3.3 GB) — this dev box has 126 GB of
# tmpfs against ~221 GB of 1M-event output.
#
# Usage: tools/run_1m_soak.sh [outdir]   (default /dev/shm/soak1m)
# Results land in $outdir/clouds (last 3 run files + manifests) and the
# bench JSON line on stdout. Round-3 recorded: 347.8 ev/s sustained,
# zero mid-run recompiles, flat writer-child RSS (BASELINE.md).
set -u
OUT=${1:-/dev/shm/soak1m}
mkdir -p "$OUT/clouds"
FLAG=$(mktemp)
(
  while [ -f "$FLAG" ]; do
    for f in $(ls -t "$OUT"/clouds/run_*.h5 2>/dev/null | tail -n +4); do
      sz=$(stat -c %s "$f" 2>/dev/null || echo 0)
      if [ "$sz" -gt 50000000 ]; then
        rm -f "$f"
        echo "$(date +%H:%M:%S) pruned $f ($sz bytes)" >> "$OUT/pruner.log"
      fi
    done
    sleep 45
  done
) &
PRUNER=$!
BENCH_EVENTS=1000000 BENCH_BATCH=${BENCH_BATCH:-384} BENCH_OUTDIR="$OUT" \
  ATTPC_TPU_TIMING=1 python "$(dirname "$0")/../bench.py"
rc=$?
rm -f "$FLAG"
wait $PRUNER 2>/dev/null
exit $rc
