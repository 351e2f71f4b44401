"""cpmcu_tpu — a TPU-native LLM inference framework (CPM.cu capability set).

Built from scratch in JAX/XLA/Pallas: W4A16 GPTQ inference with Pallas fused
dequant-matmul, tree speculative sampling (EAGLE / FR-Spec) with
tree-attention verification, InfLLM-v2 block-sparse attention for 100K+
contexts, static KV planning + chunked prefill + jit-cached decode steps,
and mesh-sharded multi-chip serving the single-GPU CUDA reference lacks.
"""

__version__ = "0.1.0"

from .core.config import EngineConfig, ModelConfig, RopeConfig  # noqa: F401
