#!/usr/bin/env bash
# Reproduce the reference's accuracy-parity table (BASELINE.md /
# ref eval/README.md:20-73) unattended, for all three target models x W8/W4.
# See PARITY_RUNBOOK.md for inputs, exact tolerances and triage.
#
# Real run (network/checkpoint-equipped environment):
#   bash recipes/reproduce_reference.sh <hf_cache_dir> <pile_val.jsonl.zst> \
#        [wikitext_test.npy]
#   (if the .npy is omitted it is built from the datasets library per model)
#
# Smoke run (this environment; validates every command/flag on a tiny model):
#   bash recipes/reproduce_reference.sh --synthetic
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--synthetic" ]]; then
    # --- runbook CI: identical command sequence, tiny random model ----------
    # tiny-model smoke never needs the TPU relay (slow remote compiles)
    export JAX_PLATFORMS=cpu MQTPU_DEVICE=cpu
    WORK=${WORK:-/tmp/reproduce_ref_smoke}
    rm -rf "$WORK" && mkdir -p "$WORK"
    python - "$WORK" << 'EOF'
import sys, numpy as np, torch, transformers
sys.path.insert(0, ".")
from mobilequant_tpu.models import get_config
work = sys.argv[1]
torch.manual_seed(0)
cfg = get_config("test-llama")
hf = transformers.LlamaConfig(
    vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
    intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
    num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
    head_dim=cfg.head_dim_, rms_norm_eps=cfg.norm_eps)
transformers.LlamaForCausalLM(hf).float().save_pretrained(
    work + "/hf", safe_serialization=True)
rng = np.random.default_rng(0)
np.save(work + "/wikitext.npy",
        rng.integers(0, cfg.vocab_size, 4096).astype(np.int32))
import json
exs = [{"ctx": rng.integers(0, cfg.vocab_size, 8).tolist(),
        "choices": [rng.integers(0, cfg.vocab_size, 3).tolist()
                    for _ in range(4)],
        "label": int(rng.integers(0, 4))} for _ in range(8)]
json.dump(exs, open(work + "/task.json", "w"))
EOF
    M="$WORK/m"
    python -m mobilequant_tpu.cli convert --hf_path "$WORK/hf" \
        --model test-llama --family llama --output_dir "$M"
    python -m mobilequant_tpu.cli eval-ppl --model_dir "$M" \
        --tokens "$WORK/wikitext.npy" --seqlen 32 --max_windows 4   # FP baseline
    python -m mobilequant_tpu.cli quantize --model_dir "$M" --mode e2e \
        --wbits 8 --abits 8 --epochs 2 --nsamples 16 --seqlen 16 \
        --batch_size 4 --calib synthetic --let --lwc --lrl \
        --let_lr 1e-3 --let_min_lr 1e-4 --lwc_lr 1e-2 --lwc_min_lr 1e-3 \
        --lrl_lr 1e-6 --lrl_min_lr 1e-7
    python -m mobilequant_tpu.cli pack --model_dir "$M" \
        --output_dir "$M/engine" --max_seq_len 64 --verify
    python -m mobilequant_tpu.cli eval-ppl --model_dir "$M" \
        --engine_dir "$M/engine" --tokens "$WORK/wikitext.npy" \
        --seqlen 32 --max_windows 4
    python -m mobilequant_tpu.cli eval-choice --model_dir "$M" \
        --task "$WORK/task.json"
    echo "reproduce_reference --synthetic: PASSED"
    exit 0
fi

HF=${1:?usage: reproduce_reference.sh <hf_cache_dir> <pile_val.jsonl.zst> [wikitext.npy] | --synthetic}
CALIB=${2:?pile val jsonl.zst path}
WIKITEXT=${3:-}

# model table: name, hf repo, family, gemma's extra policy flag
CONFIGS=(
  "tinyllama-1.1b TinyLlama/TinyLlama-1.1B-Chat-v1.0 llama "
  "gemma-2b       google/gemma-2b                    gemma --use_16bit_output_for_mlp"
  "stablelm-2-1.6b stabilityai/stablelm-2-1_6b       stablelm "
)

make_wikitext_npy() {  # $1 = hf ckpt dir, $2 = out npy
    python - "$1" "$2" << 'EOF'
import sys, numpy as np
from datasets import load_dataset
from transformers import AutoTokenizer
tok = AutoTokenizer.from_pretrained(sys.argv[1], use_fast=False)
text = "\n\n".join(load_dataset("wikitext", "wikitext-2-raw-v1",
                                split="test")["text"])
np.save(sys.argv[2], np.asarray(tok(text).input_ids, np.int32))
EOF
}

for line in "${CONFIGS[@]}"; do
    read -r NAME REPO FAM EXTRA <<< "$line"
    for WB in 8 4; do
        W=results/${NAME}-w${WB}a8
        python -m mobilequant_tpu.cli convert --hf_path "$HF/$REPO" \
            --model "$NAME" --family "$FAM" --output_dir "$W"
        WT=${WIKITEXT:-$W/wikitext.npy}
        [[ -f "$WT" ]] || make_wikitext_npy "$HF/$REPO" "$WT"
        # FP baseline ppl (the Δ-vs-FP column the reference never committed)
        python -m mobilequant_tpu.cli eval-ppl --model_dir "$W" \
            --tokens "$WT" --seqlen 1024 | tee "$W/ppl_fp.txt"
        python -m mobilequant_tpu.cli quantize --model_dir "$W" --mode e2e \
            --wbits "$WB" --abits 8 --epochs 60 --nsamples 1024 \
            --seqlen 1024 --batch_size 1 --calib "$CALIB" \
            --let --lwc --lrl --let_lr 1e-3 --let_min_lr 1e-4 \
            --lwc_lr 1e-2 --lwc_min_lr 1e-3 --lrl_lr 1e-6 --lrl_min_lr 1e-7 \
            $EXTRA
        python -m mobilequant_tpu.cli pack --model_dir "$W" \
            --output_dir "$W/engine" --max_seq_len 1024 --verify
        python -m mobilequant_tpu.cli eval-ppl --model_dir "$W" \
            --engine_dir "$W/engine" --tokens "$WT" --seqlen 1024 \
            | tee "$W/ppl_quant.txt"
        # accuracy tasks: real lm-eval harness if installed, else the
        # harness-free likelihood scorer on exported task files
        python - "$W" << 'EOF' || true
import importlib.util, subprocess, sys
if importlib.util.find_spec("lm_eval"):
    subprocess.run([sys.executable, "-m", "mobilequant_tpu.cli",
                    "eval-harness", "--model_dir", sys.argv[1],
                    "--tasks", "arc_challenge,hellaswag,mmlu"], check=False)
else:
    print("lm_eval not installed - export ARC/HellaSwag/MMLU task JSONs "
          "(eval/choice.py schema) and run eval-choice; see PARITY_RUNBOOK.md")
EOF
    done
done
echo "reproduce_reference: done — compare against PARITY_RUNBOOK.md §3"
