#!/bin/bash
# VERDICT r5 item 1 done-criterion: a REAL `bench.py` run that acquires
# the channel while a background lane child is mid-restart, in <10 min.
# Runs bench.py, times the wait from launch to the moment its measurement
# child starts (the lane child yields rc=5 at its next chunk boundary),
# and wraps the result + timings into BENCH_PREEMPT_r05.json.
set -u
cd /root/repo
T0=$(date +%s)
HOLDER=$(python -c "import json;print(json.load(open('/tmp/tneq_tpu_client.lock')).get('tag','<free>'))" 2>/dev/null || echo '<free>')
echo "[preempt-proof] start $(date -u +%T); channel holder: $HOLDER"
python bench.py > /tmp/bench_preempt_stdout.txt 2> /tmp/bench_preempt_stderr.txt
RC=$?
T1=$(date +%s)
python - "$T0" "$T1" "$RC" "$HOLDER" <<'EOF'
import json, re, sys
t0, t1, rc, holder = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
out = open('/tmp/bench_preempt_stdout.txt').read().strip().splitlines()
err = open('/tmp/bench_preempt_stderr.txt').read()
result = None
for line in out[::-1]:
    try:
        result = json.loads(line)
        break
    except Exception:
        continue
# waiting time = number of 60s holder-wait log lines (bench logs one per poll)
waits = len(re.findall(r"TPU channel held by", err))
rec = {
    "artifact": "BENCH_PREEMPT_r05",
    "claim": ("round-end bench.py acquires the TPU channel under an "
              "ACTIVE lane (mid-restart child) via the mid-run "
              "bench-priority yield, inside the 10-min done-criterion "
              "(VERDICT r4 next-#1)"),
    "channel_holder_at_launch": holder,
    "wall_s_total": t1 - t0,
    "holder_wait_polls_60s": waits,
    "bench_rc": rc,
    "bench_result": result,
    "stderr_tail": err.splitlines()[-12:],
}
with open("BENCH_PREEMPT_r05.json", "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps({"wall_s_total": t1 - t0, "waits": waits, "rc": rc,
                  "device": (result or {}).get("device")}))
EOF
