#!/bin/bash
# Round-5 TPU job queue: runs spool jobs serially with claim-cooldown gaps.
# Jobs are shell files in benchmarks/spool/ (sorted order); each is moved
# to spool_done/ after running.  Touch benchmarks/spool/STOP to drain and
# exit.  One TPU process at a time; 140 s gaps respect the claim cooldown.
set -u
cd /root/repo
GAP=140
while true; do
  if [ -e benchmarks/spool/STOP ]; then echo "STOP seen, exiting"; exit 0; fi
  job=$(ls benchmarks/spool/*.job 2>/dev/null | head -1)
  if [ -z "$job" ]; then sleep 20; continue; fi
  echo "=== $(date -u +%H:%M:%S) run: $job ==="
  timeout 5400 bash "$job" >> "artifacts/queue_r5.log" 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) done: $job (rc=$rc) ==="
  mv "$job" benchmarks/spool_done/
  sleep $GAP
done
