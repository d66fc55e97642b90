#!/bin/bash
# Round-5 queue 18: CLEAN serving re-measure.  Queue 17's serve/coldjit
# legs were co-scheduled with the full CPU test suite (the known
# host-load compile degradation), and the sd15 serve in its clean window
# took 1102 s despite the persistent-cache entry existing — this queue
# re-runs all four legs exclusively, with persistent-cache debug logging
# on the first sd15 serve to see the get/put keys and hit/miss.
# Launch ONLY when nothing else (tests, benches) is running.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)  [$(date +%H:%M:%S)]"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep --line-buffered -v "^WARNING"
}

echo "### serve sd15 (cache debug logging)  [$(date +%H:%M:%S)]"
JAX_DEBUG_LOG_MODULES=jax._src.compilation_cache \
  python benchmarks/exp_aot_serving.py serve --family sd15 2>&1 | \
  grep --line-buffered -v "^WARNING"
step python benchmarks/exp_aot_serving.py serve --family sd15
step python benchmarks/exp_aot_serving.py coldjit --family sd15
step python benchmarks/exp_aot_serving.py serve --family sdxl
step python benchmarks/exp_aot_serving.py coldjit --family sdxl
echo "### QUEUE18 DONE [$(date +%H:%M:%S)]"
