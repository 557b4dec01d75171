#!/usr/bin/env bash
# Baseline-ablation recipes — the reference's Table-row provenance scripts
# (/root/reference/experiments/smoothquant/*.sh and w4a8|w8a8/baselines/
# {omniquant,lrl}_*.sh), pinned to the same hyperparameters:
#
#   smoothquant  SmoothQuant init only (alpha 0.5, incl. the paper's v->o and
#                w3->w2 "modified" smoothing) + calibrated static ranges, NO
#                training — ref smoothquant_modified_baseline_<m>.sh
#   omniquant    layer-wise LET+LWC (no LRL, LET init at 1 — ref runs
#                smoothquant first only to SAVE the ckpt; omniquant itself
#                re-learns scales), 20 epochs x 128 samples —
#                ref baselines/omniquant_modified_baseline_<m>.sh
#   lrl          e2e LET+LWC+LRL, 20 epochs x 128 samples —
#                ref baselines/lrl_<m>.sh
#
#   usage: ablations.sh <tinyllama|gemma|stablelm> <smoothquant|omniquant|lrl>
#                       <w8a8|w4a8> <converted_model_dir> [calib] [tokens.npy]
#
# The full MobileQuant rows (60 epochs x 1024 samples) live in
# recipes/mobilequant.sh; eval-ppl prints the fp/quant ppl pair for the table.
set -euo pipefail
cd "$(dirname "$0")/.."

WHICH=${1:?usage: ablations.sh <model> <smoothquant|omniquant|lrl> <w8a8|w4a8> <model_dir>}
ABL=${2:?need ablation: smoothquant|omniquant|lrl}
PREC=${3:?need precision: w8a8|w4a8}
MODEL_DIR=${4:?need converted model dir}
CALIB=${5:-pile}
TOKENS=${6:-}

case "$PREC" in
  w8a8) WBITS=8 ;;
  w4a8) WBITS=4 ;;
  *) echo "unknown precision $PREC"; exit 1 ;;
esac

# per-model LET/LWC/LRL learning rates, pinned to the reference's baseline
# scripts (identical across the three for llama; gemma/stablelm reuse their
# main-recipe rates as the reference baselines do)
LRS="--let_lr 1e-3 --let_min_lr 1e-4 --lwc_lr 1e-2 --lwc_min_lr 1e-3 \
     --lrl_lr 1e-6 --lrl_min_lr 1e-7"

COMMON="--model_dir $MODEL_DIR --wbits $WBITS --abits 8 --calib $CALIB \
        --nsamples 128 --seqlen 1024 --batch_size 1"

case "$ABL" in
  smoothquant)
    # init-only: 0 epochs keeps the SmoothQuant-initialized LET + calibrated
    # ranges as the final state (the ref baseline's 16-bit softmax I/O is
    # our default policy)
    python -m mobilequant_tpu.cli quantize $COMMON --mode e2e \
        --epochs 0 --let --smooth_init
    ;;
  omniquant)
    python -m mobilequant_tpu.cli quantize $COMMON --mode layerwise \
        --epochs 20 --let --lwc --no_smooth_init $LRS
    ;;
  lrl)
    python -m mobilequant_tpu.cli quantize $COMMON --mode e2e \
        --epochs 20 --let --lwc --lrl --no_smooth_init $LRS
    ;;
  *) echo "unknown ablation $ABL"; exit 1 ;;
esac

if [[ -n "$TOKENS" ]]; then
  python -m mobilequant_tpu.cli eval-ppl --model_dir "$MODEL_DIR" \
      --tokens "$TOKENS" --seqlen 1024
fi
echo "ablation $WHICH/$ABL/$PREC done -> $MODEL_DIR"
