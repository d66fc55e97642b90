#!/bin/bash
# Queued round-3-late hardware A/Bs (see benchmarks/RESULTS.md "Queued").
# Run on the TPU host once the axon relay recovers:
#   bash benchmarks/round3_late_ab.sh | tee /tmp/ab_results.txt
# Each line is bench.py's one-line JSON + its timing comment.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() { echo "### $*"; timeout 2400 python bench.py "$@" 2>&1 | tail -2; }

run                                    # baseline 512^2/50 batch 4
run --batch 1                          # latency baseline
run --deepcache 3                      # DeepCache throughput
run --batch 1 --deepcache 3            # DeepCache latency
run --batch 1 --quant w8               # weight-only int8 latency
run --sampler dpm++_sde                # SDE sampler cost check
run --sampler lcm --steps 4 --no-cfg --batch 1   # few-step distilled config
run --family sdxl --deepcache 3        # SDXL DeepCache (1024^2 batch 1)

# round-3-late guidance/feature extras (added after the queue above):
run --batch 1 --pag-scale 3.0           # PAG: one extra cond-lane eval/step
run --batch 1 --sag-scale 0.75          # SAG: capture + degraded eval/step
run --sampler lms                       # LMS (one eval/step, ~ddpm cost)
run --sampler dpm2                      # DPM2 (two evals/step, ~heun cost)

# ToMe token merging (approximate; merges self-attn tokens at the 4096+
# level) — throughput + latency + SDXL (deep transformer stacks = most
# attention-bound family, biggest expected win)
run --tome 0.5                          # 512^2 batch 4
run --batch 1 --tome 0.5                # latency config
run --family sdxl --tome 0.5            # SDXL 1024^2 batch 1

# round-3-late-2 feature wave costs (reference-only, IP-Adapter, tome,
# dpm_fast, panorama, ESRGAN) via the generate() API:
echo "### features (exp_round3_features.py)"
timeout 3600 python benchmarks/exp_round3_features.py 2>&1 | tail -20
