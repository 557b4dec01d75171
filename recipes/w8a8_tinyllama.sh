#!/usr/bin/env bash
# W8A8 TinyLlama-1.1B end-to-end MobileQuant recipe.
# Hyperparameters pinned to the reference recipe
# (/root/reference/experiments/w8a8/main/e2e_llama-s1024-ep60.sh):
# 60 epochs, 1024 pile samples @ seqlen 1024, LET 1e-3→1e-4, LWC 1e-2→1e-3,
# LRL 1e-6→1e-7, batch 1, fp32 training.
set -euo pipefail

HF_CKPT=${1:?usage: w8a8_tinyllama.sh <hf_ckpt_dir> [calib]}
CALIB=${2:-pile}
WORK=${WORK:-results/tinyllama-w8a8}

python -m mobilequant_tpu.cli convert \
    --hf_path "$HF_CKPT" --model tinyllama-1.1b --family llama \
    --output_dir "$WORK"

python -m mobilequant_tpu.cli quantize \
    --model_dir "$WORK" --mode e2e --wbits 8 --abits 8 \
    --epochs 60 --nsamples 1024 --seqlen 1024 --batch_size 1 \
    --calib "$CALIB" --let --lwc --lrl \
    --let_lr 1e-3 --let_min_lr 1e-4 --lwc_lr 1e-2 --lwc_min_lr 1e-3 \
    --lrl_lr 1e-6 --lrl_min_lr 1e-7

python -m mobilequant_tpu.cli pack \
    --model_dir "$WORK" --output_dir "$WORK/engine" --max_seq_len 1024
