#!/usr/bin/env bash
# Weight-only W4A16 (auto_gptq-style, g128) — no calibration or range
# learning: convert then pack straight off the FP checkpoint
# (ref mobilellm/quantization/qmodule.py:868-886; eval mode
# eval/simple_eval.py --mode w4a16).
#
#   usage: w4a16_weight_only.sh <tinyllama|gemma|stablelm> <hf_ckpt_dir>
set -euo pipefail

WHICH=${1:?usage: w4a16_weight_only.sh <tinyllama|gemma|stablelm> <hf_ckpt_dir>}
HF_CKPT=${2:?need hf checkpoint dir}

case "$WHICH" in
  tinyllama) MODEL=tinyllama-1.1b;  FAMILY=llama ;;
  gemma)     MODEL=gemma-2b;        FAMILY=gemma ;;
  stablelm)  MODEL=stablelm-2-1.6b; FAMILY=stablelm ;;
  *) echo "unknown model $WHICH"; exit 1 ;;
esac

WORK=${WORK:-results/${MODEL}-w4a16}

python -m mobilequant_tpu.cli convert \
    --hf_path "$HF_CKPT" --model "$MODEL" --family "$FAMILY" \
    --output_dir "$WORK"

python -m mobilequant_tpu.cli pack \
    --model_dir "$WORK" --output_dir "$WORK/engine" --max_seq_len 1024 \
    --act_bits 16 --weight_bits 4 --group_size 128 --warm_cache

echo "engine ready: $WORK/engine"
