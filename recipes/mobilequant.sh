#!/usr/bin/env bash
# Parameterized MobileQuant recipe covering the reference's experiments matrix
# (/root/reference/experiments/{w8a8,w4a8}/main/e2e_*-s1024-ep60.sh):
# all three target models x W8A8/W4A8, with each model's pinned LET/LWC/LRL
# learning rates. 60 epochs, 1024 pile samples @ seqlen 1024, batch 1, fp32.
#
#   usage: mobilequant.sh <tinyllama|gemma|stablelm> <w8a8|w4a8> <hf_ckpt_dir> [calib]
set -euo pipefail

WHICH=${1:?usage: mobilequant.sh <tinyllama|gemma|stablelm> <w8a8|w4a8> <hf_ckpt_dir> [calib]}
PREC=${2:?usage: mobilequant.sh <tinyllama|gemma|stablelm> <w8a8|w4a8> <hf_ckpt_dir> [calib]}
HF_CKPT=${3:?need hf checkpoint dir}
CALIB=${4:-pile}

case "$WHICH" in
  tinyllama) MODEL=tinyllama-1.1b;  FAMILY=llama ;;
  gemma)     MODEL=gemma-2b;        FAMILY=gemma ;;
  stablelm)  MODEL=stablelm-2-1.6b; FAMILY=stablelm ;;
  *) echo "unknown model $WHICH"; exit 1 ;;
esac
case "$PREC" in
  w8a8) WBITS=8 ;;
  w4a8) WBITS=4 ;;
  *) echo "unknown precision $PREC"; exit 1 ;;
esac

# per-model learning rates, pinned to the reference's experiment scripts
# (w8a8: e2e_{llama,gemma,stablelm}-s1024-ep60.sh; w4a8 same dir)
case "$WHICH/$PREC" in
  tinyllama/w8a8) LRS="--let_lr 1e-3 --let_min_lr 1e-4 --lwc_lr 1e-2 --lwc_min_lr 1e-3 --lrl_lr 1e-6 --lrl_min_lr 1e-7" ;;
  tinyllama/w4a8) LRS="--let_lr 1e-3 --let_min_lr 1e-4 --lwc_lr 1e-2 --lwc_min_lr 1e-3 --lrl_lr 1e-6 --lrl_min_lr 1e-7" ;;
  gemma/w8a8)     LRS="--let_lr 1e-3 --let_min_lr 1e-3 --lwc_lr 5e-3 --lwc_min_lr 5e-3 --lrl_lr 1e-6 --lrl_min_lr 1e-7" ;;
  gemma/w4a8)     LRS="--let_lr 1e-3 --let_min_lr 1e-3 --lwc_lr 5e-3 --lwc_min_lr 5e-3 --lrl_lr 5e-6 --lrl_min_lr 1e-6" ;;
  stablelm/w8a8)  LRS="--let_lr 1e-3 --let_min_lr 1e-3 --lwc_lr 1e-2 --lwc_min_lr 5e-3 --lrl_lr 1e-7 --lrl_min_lr 1e-7" ;;
  stablelm/w4a8)  LRS="--let_lr 1e-3 --let_min_lr 5e-4 --lwc_lr 5e-3 --lwc_min_lr 1e-3 --lrl_lr 1e-6 --lrl_min_lr 1e-7" ;;
esac

WORK=${WORK:-results/${MODEL}-${PREC}}

python -m mobilequant_tpu.cli convert \
    --hf_path "$HF_CKPT" --model "$MODEL" --family "$FAMILY" \
    --output_dir "$WORK"

python -m mobilequant_tpu.cli quantize \
    --model_dir "$WORK" --mode e2e --wbits "$WBITS" --abits 8 \
    --epochs 60 --nsamples 1024 --seqlen 1024 --batch_size 1 \
    --calib "$CALIB" --let --lwc --lrl $LRS

python -m mobilequant_tpu.cli pack \
    --model_dir "$WORK" --output_dir "$WORK/engine" --max_seq_len 1024 \
    --head_bits $([ "$WBITS" = 4 ] && echo 4 || echo 8) --warm_cache

echo "engine ready: $WORK/engine (demo/serve with --engine_dir $WORK/engine)"
