from mobilequant_tpu.models.config import ModelConfig
from mobilequant_tpu.models.registry import get_config, MODEL_CONFIGS
