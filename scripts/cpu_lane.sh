#!/bin/bash
# CPU regen-target protocol lane (round 4): the full reference
# train.py:49-58 shape — each restart child regenerates + validates its
# own planted target (18-try validation stream), 20 seeds, resumable.
#
# Env: CPU_WALL_END (epoch seconds) — default 14:50 UTC today.
set -u
cd /root/repo
export TNEQ_PLATFORM=cpu
WALL_END=${CPU_WALL_END:-$(date -u -d 'today 14:50' +%s)}

REM=$(( WALL_END - $(date +%s) ))
echo "[cpu_lane] start $(date -u +%T), wall budget ${REM}s"
[ "$REM" -lt 600 ] && exit 0

python -m tneq_tpu.bench.flagship_protocol --mode pair --cpu --regen-target \
  --restarts 20 --out FLAGSHIP_protocol_regen_cpu.json \
  --wall-budget "$REM" --retries 1 --retry-wait 30
echo "[cpu_lane] protocol exit $? at $(date -u +%T)"
