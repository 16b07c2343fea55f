#!/bin/bash
# Round-4 retraining queue: serialized TPU jobs with claim-cooldown gaps.
# Produces final_evals-bearing artifacts for every config the hardened
# gate needs (VERDICT r3 next #2).
set -u
cd /root/repo
GAP=120
run() {
  echo "=== $(date -u +%H:%M:%S) queue: $* ==="
  timeout 5400 python benchmarks/learning.py "$@"
  echo "=== $(date -u +%H:%M:%S) done: $* (rc=$?) ==="
  sleep $GAP
}
run breakout --seed 0 --max-opts 60000 --out artifacts/breakout_curve.json
run seaquest --seed 0 --max-opts 30000 --out artifacts/seaquest_curve.json
run pong --seed 0 --max-opts 40000 --out artifacts/pong_curve.json
run pong --seed 1 --max-opts 40000 --out artifacts/pong_curve_seed1.json
run spaceinvaders --seed 0 --out artifacts/spaceinvaders_curve.json
run spaceinvaders --seed 1 --max-opts 24000 --out artifacts/spaceinvaders_curve_seed1.json
run spaceinvaders --seed 2 --max-opts 24000 --out artifacts/spaceinvaders_curve_seed2.json
run pong_host --seed 1 --out artifacts/pong_host_curve_seed1.json
run pong_host --seed 2 --out artifacts/pong_host_curve_seed2.json
echo "=== queue complete ==="
