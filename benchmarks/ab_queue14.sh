#!/bin/bash
# Round-5 queue 14 (runs after queue 13): CPU-side validations that must
# not co-schedule with the hardware queues on this 1-core host —
# the full validate_real_weights dry-run matrix (all legs) and the
# bench_multichip virtual-mesh rehearsal.
set -u
cd /root/repo

while ! grep -q "QUEUE13 DONE\|STOPPED" benchmarks/ab_queue13_r5.log 2>/dev/null; do
  sleep 60
done

echo "### validate_real_weights --dry-run  [$(date +%H:%M:%S)]"
JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python -u examples/validate_real_weights.py --dry-run 2>&1 | grep -v "^WARNING"
echo "### rc=$?"
echo "### bench_multichip --dry-run  [$(date +%H:%M:%S)]"
PYTHONPATH=/root/repo python benchmarks/bench_multichip.py --devices 8 --dry-run 2>&1 | grep -v "^WARNING"
echo "### QUEUE14 DONE [$(date +%H:%M:%S)]"
