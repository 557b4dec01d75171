"""mobilequant_tpu — a TPU-native post-training-quantization + integer inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of saic-fi/MobileQuant
(reference mounted at /root/reference): unified small-LLM decoder (TinyLlama / Gemma /
StableLM families), SmoothQuant-style equivalent transformations, jointly-learned
LET/LWC/LRL quantization parameters (W8A8 / W4A8, per-tensor static activations,
int8 KV-cache), and an integer inference engine built on Pallas TPU kernels with
tensor-parallel sharding over a `jax.sharding.Mesh`.

Layer map (TPU-native analogue of reference SURVEY.md §1):
  models/    — unified functional decoder + HF checkpoint conversion   (ref L1)
  quant/     — quantizer math, fake-quant model, LET/LWC/LRL training  (ref L2+L3)
  ops/       — Pallas TPU kernels (int8/int4 matmul, quantized attn)   (ref L6 compute)
  runtime/   — integer engine: prefill/decode, int8 KV, sampling, serve (ref capp/)
  parallel/  — mesh + NamedSharding rules (TP/DP)                      (new, no ref)
  data/      — calibration corpora loaders                             (ref datautils)
  eval/      — perplexity / LAMBADA / harness adaptors                 (ref L5)
  export/    — act_dict.json / qcfg.json interchange, AOT artifacts    (ref L4)
"""

__version__ = "0.1.0"
