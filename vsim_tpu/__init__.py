"""vsim_tpu — a TPU-native INT4 (Q4_0) quantized LLM inference framework.

Built from scratch in JAX/XLA/Pallas with the capability set of
NAIST-Archlab/vsim (a Cformers/ggml fork with IMAX/EMAX7 CGRA offload):
Q4_0 weight-only quantization for GPT-NeoX/Pythia, GPT-J/CodeGen, BLOOM and
GPT-2; HF-checkpoint → Q4 conversion; an ``AutoInference`` API with streaming
generation and seeded top-k/top-p/repeat-penalty sampling; per-phase
performance monitoring; and Pallas fused dequant+matmul kernels with
mesh-sharded weights/KV-cache in place of the reference's accelerator offload.
"""

__version__ = "0.1.0"
