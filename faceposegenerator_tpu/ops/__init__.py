from .attention import dot_product_attention
from .norms import group_norm, layer_norm, rms_norm
from .lora import lora_dense
