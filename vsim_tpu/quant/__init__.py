from vsim_tpu.quant.q4 import (
    QK,
    Q4Tensor,
    dequantize_km,
    dequantize_q4_0,
    dequantize_q4_0_np,
    fake_quantize,
    from_ggml_q4_0_bytes,
    q4_take_rows,
    quantize_q4_0,
    quantize_q4_0_np,
    quantize_q4_0_with_hist_np,
    to_ggml_q4_0_bytes,
)

__all__ = [
    "QK",
    "Q4Tensor",
    "dequantize_km",
    "dequantize_q4_0",
    "dequantize_q4_0_np",
    "fake_quantize",
    "from_ggml_q4_0_bytes",
    "q4_take_rows",
    "quantize_q4_0",
    "quantize_q4_0_np",
    "quantize_q4_0_with_hist_np",
    "to_ggml_q4_0_bytes",
]
