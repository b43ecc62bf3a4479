from .attention import multi_head_attention, reference_attention
from .layernorm import fused_layernorm
from .fused_mlp import fused_mlp

__all__ = [
    "multi_head_attention",
    "reference_attention",
    "fused_layernorm",
    "fused_mlp",
]
