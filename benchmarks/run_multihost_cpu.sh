#!/bin/bash
# CPU-process weak-scaling receipt (VERDICT r4 #7): run the pod harness
# (benchmarks/scaling.py --config multihost) at 1/2/4 OS processes on virtual CPU
# devices and record process 0's JSON line per world size. This is NOT a performance
# claim — CPU collectives ride gloo over localhost — it is the standing receipt that
# the multi-host harness produces numbers, so a real pod run is one command
# (BASELINE.md config #5).
set -e
cd "$(dirname "$0")/.."
OUT=benchmarks/multihost_cpu_r5.jsonl
: > "$OUT"
PPD=${PPD:-2000}
COMMON=(--config multihost --population-per-device "$PPD" --hidden 64 64
        --horizon 20 --iterations 3 --chain 4 --repeats 3)
for PROCS in 1 2 4; do
  PORT=$((9700 + PROCS))
  PIDS=()
  for ((i=0; i<PROCS; i++)); do
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=2 \
      python benchmarks/scaling.py "${COMMON[@]}" \
      --coordinator "localhost:$PORT" --num-processes "$PROCS" --process-id "$i" \
      > "/tmp/mh_${PROCS}_${i}.log" 2>&1 &
    PIDS+=($!)
  done
  for pid in "${PIDS[@]}"; do wait "$pid"; done
  grep -h '^{' "/tmp/mh_${PROCS}_0.log" | tail -1 >> "$OUT"
  echo "world=$PROCS done"
done
cat "$OUT"
