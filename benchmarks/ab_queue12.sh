#!/bin/bash
# Round-5 queue 12 (runs after queue 11): one-artifact serving deployment
# (VERDICT r4 next #3).  Sequence per family: export -> prime (writes the
# artifact's own jit_call_exported persistent-cache entry) -> serve (fresh
# process, warm restart: deserialize + cache hit + run) -> coldjit warm
# for the comparison row.  Targets: sd15 serve <= 25 s, sdxl <= 30 s.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

while ! grep -q "QUEUE11 DONE\|STOPPED" benchmarks/ab_queue11_r5.log 2>/dev/null; do
  sleep 60
done

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep -v "^WARNING"
}

for fam in sd15 sdxl; do
  step python benchmarks/exp_aot_serving.py export --family $fam
  step python benchmarks/exp_aot_serving.py prime --family $fam
  step python benchmarks/exp_aot_serving.py serve --family $fam
  step python benchmarks/exp_aot_serving.py coldjit --family $fam
done
echo "### QUEUE12 DONE [$(date +%H:%M:%S)]"
