#!/bin/bash
# TPU work lane (round 5): strictly serialized channel work, resumable
# across reboots (state lives in committed JSON artifacts; this script is
# committed so a fresh session can re-arm with scripts/rearm.sh).
#
# Children are PREEMPTIBLE: every lane child installs the mid-run
# bench-priority yield (install_lane_yield), so a round-end bench.py run
# acquires the channel within ~one fit chunk instead of waiting out a
# 7-55 min restart (VERDICT r4 #1).
#
# Queue: 1) suite stage 9 re-drive (only stage still red; bigger child
#           timeout after the r4 3126s TERM)
#        2) flagship protocol toward 20 TPU seeds, phase 1
#        3) pallas_decision (the promised PARITY.md L2 evidence artifact)
#        4) D=512 bf16-knee MPS flagship (VERDICT r5 item 6)
#        5) protocol resume until the wall
#
# Env: TPU_WALL_END (epoch seconds) — default 18:20 UTC today.
set -u
cd /root/repo
WALL_END=${TPU_WALL_END:-$(date -u -d 'today 18:20' +%s)}
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
  echo "[tpu_lane] re-driving suite stage 9 (isolated, timeout 5600)"
  python -m tneq_tpu.bench.run_all --stages 9 --isolate \
    --out bench_results --timeout 5600
  echo "[tpu_lane] stage 9 exit $?"
fi

# --- helper: run the protocol until a given wall -------------------------
run_protocol_until() {
  local until_s=$1
  local AFTER=""
  while true; do
    local REM=$(( until_s - $(date +%s) ))
    if [ "$REM" -lt 1200 ]; then echo "[tpu_lane] protocol phase wall reached"; return 0; fi
    python -m tneq_tpu.bench.flagship_protocol --mode pair --restarts 20 \
      --out FLAGSHIP_protocol_pair.json \
      --target-cache .lane_cache/target_pair.pkl \
      --wall-budget "$REM" --retries 2 --retry-wait 600 $AFTER
    rc=$?
    if [ $rc -eq 3 ]; then
      echo "[tpu_lane] abandoned child; waiting 900s before --after-abandon"
      sleep 900
      AFTER="--after-abandon"
      continue
    fi
    return $rc
  done
}

# --- 2. TPU protocol phase 1 (until wall-9000s, leaving room for 3+4) ----
PHASE1_END=$(( WALL_END - 9000 ))
run_protocol_until "$PHASE1_END"

COMPLETE=$(python -c "import json;print(json.load(open('FLAGSHIP_protocol_pair.json')).get('complete'))" 2>/dev/null)

# --- 3. pallas_decision (one TPU window, alarm-bounded) -------------------
if [ ! -f PALLAS_DECISION_r05.json ] && [ "$(remaining)" -gt 3000 ]; then
  echo "[tpu_lane] pallas_decision"
  python -m tneq_tpu.bench.pallas_decision --out PALLAS_DECISION_r05.json
  echo "[tpu_lane] pallas_decision exit $?"
fi

# --- 4. D=512 MPS flagship (physics at the bf16 knee) ---------------------
if [ ! -f MPS_FLAGSHIP_D512_r05.json ] && [ "$(remaining)" -gt 3600 ]; then
  echo "[tpu_lane] D=512 MPS flagship"
  # 'default' = single-pass bf16 MXU: the knee where r03 measured
  # 104.9 TFLOP/s on this exact step; the >=0.5 practical_util target
  # (VERDICT r5 #6) is unreachable at the 3-pass 'high' rate
  python -m tneq_tpu.bench.mps_flagship --qubits 32 --dim 512 \
    --precision default --sync-every 512 --budget 3000 \
    --out MPS_FLAGSHIP_D512_r05.json
  echo "[tpu_lane] mps_flagship exit $?"
fi

# --- 5. protocol resume until the wall ------------------------------------
if [ "$COMPLETE" != "True" ]; then
  run_protocol_until "$WALL_END"
fi

echo "[tpu_lane] done $(date -u +%T)"
