#!/bin/bash
# Round-4 finalize: regenerate the cross-backend compare artifact from the
# final protocol inputs and commit everything. Idempotent; run near round
# end (or any time the protocol files advance).
set -u
cd /root/repo
python -m tneq_tpu.bench.protocol_compare \
  --a FLAGSHIP_protocol_pair.json --b FLAGSHIP_protocol_pair_cpu.json \
  --label-a tpu --label-b cpu --out FLAGSHIP_protocol_compare.json
for f in FLAGSHIP_protocol_pair.json FLAGSHIP_protocol_regen_cpu.json \
         FLAGSHIP_protocol_compare.json bench_results .lane_cache; do
  git add -- "$f" 2>/dev/null || true
done
git diff --cached --quiet || git commit -q -m "Finalize round-4 protocol artifacts (compare regen)"
