#!/bin/bash
# Unattended measurement program for the pending-on-TPU backlog
# (run when the axon relay is back; each bench setting gets its own process
# because MQTPU_MODELK_ATTN_SPLITS is read at trace time).
#
# Backlog (2026-08-18, relay down all session):
#   1. folded-head model kernel: Mosaic compile + bs=1 decode (bench.py default)
#   2. bs=8 attention sub-phase sweep (splits 1/2/4)
#   3. generation-style prefill (logits_at) metric
#   4. all-models refresh (stablelm/gemma incl. w8 kernel + folded head)
set -u
cd "$(dirname "$0")/.."
mkdir -p work/measure
TS=$(date +%Y%m%d_%H%M%S)

run() {  # run <name> <timeout_s> [env ...] -- cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ==="
  timeout "$tmo" env "$@" > "work/measure/${TS}_${name}.log" 2>&1
  echo "exit $? -> work/measure/${TS}_${name}.log"
  tail -5 "work/measure/${TS}_${name}.log"
}

# 1+3: the official bench (includes folded-head decode configs, gen-prefill,
# the W4A16 weight-only config, and the end-to-end serving metric)
run bench_main 9000 MQTPU_BENCH_SERVE=1 -- python bench.py

# 2: bs=8 whole-model-kernel attention-split sweep
for s in 1 2 4; do
  run "bs8_splits_$s" 3600 MQTPU_BENCH_BS8_ONLY=1 MQTPU_MODELK_ATTN_SPLITS=$s \
      -- python bench.py
done

# 4: all three reference targets
run bench_all_models 10800 MQTPU_BENCH_ALL_MODELS=1 -- python bench.py

echo "all logs in work/measure/${TS}_*.log"
