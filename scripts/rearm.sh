#!/bin/bash
# One-command lane re-arm after a host reboot: launches the TPU queue, the
# CPU regen-target protocol, and the 5-min autocommit watcher, each logged
# under /tmp. Check current protocol state first:
#   python -c "import json;print(len(json.load(open('FLAGSHIP_protocol_pair.json'))['runs']))"
cd /root/repo
chmod +x scripts/*.sh
nohup scripts/tpu_lane.sh  > /tmp/tpu_lane.log  2>&1 & echo "tpu_lane  $!"
nohup scripts/cpu_lane.sh  > /tmp/cpu_lane.log  2>&1 & echo "cpu_lane  $!"
nohup scripts/autocommit.sh > /tmp/autocommit.log 2>&1 & echo "autocommit $!"
