from mobilequant_tpu.quant.quantizer import (
    QuantConfig, round_ste, scale_offset_from_min_max, min_max_from_scale_offset,
    fake_quant, fake_quant_weight, weight_min_max, clip_weight_to_learned_bounds,
    CLIPMIN, CLIPMAX,
)
