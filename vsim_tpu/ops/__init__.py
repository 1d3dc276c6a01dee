from vsim_tpu.ops.layers import gelu_exact, gelu_tanh, get_activation, layer_norm
from vsim_tpu.ops.matmul import (
    q4_matmul,
    q4_matmul_act_quant,
    get_default_impl,
    set_default_impl,
)
from vsim_tpu.ops.rope import apply_rope, apply_rope_gptj, apply_rope_neox

__all__ = [
    "apply_rope",
    "apply_rope_gptj",
    "apply_rope_neox",
    "gelu_exact",
    "gelu_tanh",
    "get_activation",
    "get_default_impl",
    "layer_norm",
    "q4_matmul",
    "q4_matmul_act_quant",
    "set_default_impl",
]
