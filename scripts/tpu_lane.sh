#!/bin/bash
# TPU work lane (round 4): strictly serialized channel work, resumable
# across reboots (state lives in committed JSON artifacts; this script is
# committed so a fresh session can re-arm with scripts/rearm.sh).
#
# Queue: 1) suite stage 9 re-drive (only stage still red)
#        2) flagship protocol extension to 20 TPU seeds (wall-bounded)
#        3) D=512 MPS flagship (physics at the bf16 knee), if wall remains
#
# Env: TPU_WALL_END (epoch seconds) — default 14:40 UTC today.
set -u
cd /root/repo
WALL_END=${TPU_WALL_END:-$(date -u -d 'today 14:40' +%s)}
mkdir -p .lane_cache

remaining() { echo $(( WALL_END - $(date +%s) )); }

echo "[tpu_lane] start $(date -u +%T), wall ends $(date -u -d @$WALL_END +%T)"

# --- 1. suite stage 9 (flagship_32q) -------------------------------------
if python - <<'EOF'
import json, sys
try:
    s = json.load(open('bench_results/summary.json'))
except Exception:
    sys.exit(1)
sys.exit(0 if any(r['stage'] == '9_flagship_32q' and r.get('ok') for r in s)
         else 1)
EOF
then
  echo "[tpu_lane] stage 9 already green; skipping"
else
  echo "[tpu_lane] re-driving suite stage 9 (isolated)"
  python -m tneq_tpu.bench.run_all --stages 9 --isolate \
    --out bench_results --timeout 5400
  echo "[tpu_lane] stage 9 exit $?"
fi

# --- 2. TPU protocol to 20 seeds ------------------------------------------
AFTER=""
while true; do
  REM=$(remaining)
  if [ "$REM" -lt 1200 ]; then echo "[tpu_lane] wall reached"; break; fi
  python -m tneq_tpu.bench.flagship_protocol --mode pair --restarts 20 \
    --out FLAGSHIP_protocol_pair.json \
    --target-cache .lane_cache/target_pair.pkl \
    --wall-budget "$REM" --retries 2 --retry-wait 600 $AFTER
  rc=$?
  if [ $rc -eq 3 ]; then
    # stopped on an abandoned-but-alive child: wait it out, then resume
    echo "[tpu_lane] abandoned child; waiting 900s before --after-abandon"
    sleep 900
    AFTER="--after-abandon"
    continue
  fi
  break
done

# --- 3. D=512 MPS flagship if the protocol finished early ------------------
COMPLETE=$(python -c "import json;print(json.load(open('FLAGSHIP_protocol_pair.json')).get('complete'))" 2>/dev/null)
REM=$(remaining)
if [ "$COMPLETE" = "True" ] && [ "$REM" -gt 3600 ]; then
  echo "[tpu_lane] protocol complete; running D=512 MPS flagship"
  python -m tneq_tpu.bench.mps_flagship --qubits 32 --dim 512 \
    --precision default --out MPS_FLAGSHIP_D512_r04.json || true
fi

echo "[tpu_lane] done $(date -u +%T)"
