#!/bin/bash
# Commit lane artifacts every 5 min — reboots revert the working tree to
# the last commit, so anything uncommitted is lost (learned twice).
# Env: AC_END (epoch seconds) — default 15:05 UTC today.
set -u
cd /root/repo
END=${AC_END:-$(date -u -d 'today 15:05' +%s)}

while [ "$(date +%s)" -lt "$END" ]; do
  sleep 300
  for f in FLAGSHIP_protocol_pair.json FLAGSHIP_protocol_regen_cpu.json \
           FLAGSHIP_protocol_compare.json bench_results .lane_cache \
           MPS_FLAGSHIP_D512_r05.json PALLAS_DECISION_r05.json BATCHED_COMPARE_r05.json STIEFEL_STALL_r05.json GA_recover_r05.json BENCH_PREEMPT_r05.json; do
    git add -- "$f" 2>/dev/null || true
  done
  if ! git diff --cached --quiet 2>/dev/null; then
    T=$(python -c "import json;print(len(json.load(open('FLAGSHIP_protocol_pair.json'))['runs']))" 2>/dev/null || echo '?')
    R=$(python -c "import json;print(len(json.load(open('FLAGSHIP_protocol_regen_cpu.json'))['runs']))" 2>/dev/null || echo '?')
    git commit -q -m "Protocol lanes: TPU $T/20, regen-CPU $R/20 (autocommit)" || true
  fi
done
echo "[autocommit] deadline reached $(date -u +%T)"
