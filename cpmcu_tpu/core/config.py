"""Model and engine configuration.

Frozen, hashable dataclasses so they can be passed as static arguments to
``jax.jit``. The fields mirror what the CUDA reference plumbs as plain
constructor arguments into its C++ model (reference: cpmcu/llm.py:67-111,
src/entry.cu:103-191), plus TPU-specific additions (sharding axes, dtype
policy, bucketing) that have no reference counterpart.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Any, Optional, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# dtype policy
# ---------------------------------------------------------------------------

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def resolve_dtype(name: str):
    return _DTYPES[name]


@dataclasses.dataclass(frozen=True)
class RopeConfig:
    """RoPE table configuration.

    Supports the three rope types the reference supports (cpmcu/llm.py:181-192
    routes through HF ``ROPE_INIT_FUNCTIONS`` for "default", "llama3" and
    "longrope"/YARN); we implement the init functions natively in
    ``cpmcu_tpu.layers.rotary``.
    """

    rope_type: str = "default"  # default | llama3 | longrope
    theta: float = 10000.0
    # llama3 fields
    factor: float = 1.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 0
    # longrope / YARN fields (factors as tuples so the config stays hashable)
    short_factor: Optional[Tuple[float, ...]] = None
    long_factor: Optional[Tuple[float, ...]] = None
    max_position_embeddings: int = 0


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Llama-family decoder config covering MiniCPM4 / Llama / Qwen knobs.

    MiniCPM scale knobs follow cpmcu/llm.py:67-69:
      * ``scale_emb``        — multiplies embedding output.
      * ``scale_residual``   — ``scale_depth / sqrt(num_layers)``; multiplies
                               each sublayer output before the residual add.
      * ``scale_lmhead``     — ``dim_model_base / hidden_size``; multiplies
                               hidden states before the LM head.
    Qwen knobs follow cpmcu/common/utils.py:119-146:
      * ``use_qk_norm``      — Qwen3 per-head RMSNorm on q,k.
      * ``use_attn_bias``    — Qwen2 bias on q/k/v projections.
    """

    vocab_size: int
    num_layers: int
    hidden_size: int
    intermediate_size: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rms_norm_eps: float = 1e-6
    rope: RopeConfig = RopeConfig()

    scale_emb: float = 1.0
    scale_lmhead: float = 1.0
    scale_residual: float = 1.0

    use_qk_norm: bool = False
    use_attn_bias: bool = False
    tie_word_embeddings: bool = False

    dtype: str = "bfloat16"

    # --- quantization (W4A16 GPTQ; reference §2.4) ---
    quant: bool = False
    quant_group_size: int = 128
    # W4 lm_head (TPU addition): the reference keeps its lm_head fp16
    # (cpmcu/llm.py:136); at decode the bf16 head costs 0.8ms/token of HBM
    # (600MB read) vs ~0.25ms at 4-bit. Parity-affecting — logits delta is
    # bounded by tools/logits_parity.py; off by default, on in bench.py.
    quant_lmhead: bool = False

    # --- InfLLM-v2 block-sparse attention (reference §2.5; defaults from
    # cpmcu/common/args.py:72-84: sink 1, block window 8, topk 64, switch 0,
    # compress-lse on) ---
    apply_sparse: bool = False
    sink_window_size: int = 1  # init_blocks: leading blocks always selected
    block_window_size: int = 8  # local window + top-k exclusion, 64-tok blocks
    sparse_topk_k: int = 64
    sparse_switch: int = 0  # engage selection once compressed coverage > this
    use_compress_lse: bool = True  # stage-1 LSE from the 64x-compressed keys
    sparse_oracle_union: bool = False  # best-case bracket for synthetic
    # weights (bench --oracle-union): broadcast the last query's stage-1
    # scores across the chunk so every query tile selects the SAME top-k
    # blocks — the per-tile visit union collapses to ~topk blocks. Random
    # weights give uncorrelated scores whose per-tile union saturates ALL
    # KV tiles (PERF.md caveat); real checkpoints sit between the two
    # endpoints. Stage-1/top-k compute is unchanged (honest timing).

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def jnp_dtype(self):
        return resolve_dtype(self.dtype)

    # -- constructors ------------------------------------------------------

    @staticmethod
    def from_hf_config(cfg: dict, dtype: Optional[str] = None, **overrides) -> "ModelConfig":
        """Build from a parsed HF ``config.json`` dict.

        Mirrors the reference's field extraction (cpmcu/llm.py:61-69) and
        MiniCPM/Qwen auto-detection (cpmcu/common/utils.py:119-146).
        """
        hidden = cfg["hidden_size"]
        num_heads = cfg["num_attention_heads"]
        head_dim = cfg.get("head_dim") or hidden // num_heads
        num_layers = cfg["num_hidden_layers"]

        scale_emb = cfg.get("scale_emb", 1.0)
        scale_lmhead = (
            cfg["dim_model_base"] / hidden if "dim_model_base" in cfg else 1.0
        )
        scale_residual = (
            cfg["scale_depth"] / math.sqrt(num_layers) if "scale_depth" in cfg else 1.0
        )

        rope_scaling = cfg.get("rope_scaling") or {}
        rope_type = rope_scaling.get("rope_type", rope_scaling.get("type", "default"))
        if rope_type in (None, "su"):
            rope_type = "longrope" if rope_scaling else "default"

        def _tup(x):
            return tuple(float(v) for v in x) if x is not None else None

        rope = RopeConfig(
            rope_type=rope_type,
            theta=cfg.get("rope_theta", 10000.0),
            factor=rope_scaling.get("factor", 1.0),
            low_freq_factor=rope_scaling.get("low_freq_factor", 1.0),
            high_freq_factor=rope_scaling.get("high_freq_factor", 4.0),
            original_max_position_embeddings=rope_scaling.get(
                "original_max_position_embeddings",
                cfg.get("max_position_embeddings", 0),
            ),
            short_factor=_tup(rope_scaling.get("short_factor")),
            long_factor=_tup(rope_scaling.get("long_factor")),
            max_position_embeddings=cfg.get("max_position_embeddings", 0),
        )

        # Feature flags keyed on model_type, matching the reference's
        # create_model wiring (cpmcu/common/utils.py:124-126).
        archs = cfg.get("architectures") or [""]
        family = (cfg.get("model_type") or archs[0]).lower()
        use_qk_norm = "qwen3" in family or cfg.get("use_qk_norm", False)
        use_attn_bias = (
            ("qwen2" in family) or cfg.get("attention_bias", False)
        )

        kw = dict(
            vocab_size=cfg["vocab_size"],
            num_layers=num_layers,
            hidden_size=hidden,
            intermediate_size=cfg["intermediate_size"],
            num_heads=num_heads,
            num_kv_heads=cfg.get("num_key_value_heads", num_heads),
            head_dim=head_dim,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope=rope,
            scale_emb=scale_emb,
            scale_lmhead=scale_lmhead,
            scale_residual=scale_residual,
            use_qk_norm=use_qk_norm,
            use_attn_bias=use_attn_bias,
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        )
        if dtype is not None:
            kw["dtype"] = dtype
        elif cfg.get("torch_dtype") in ("float16", "bfloat16", "float32"):
            # fp16 has no TPU advantage; bf16 is the native MXU dtype.
            kw["dtype"] = "bfloat16" if cfg["torch_dtype"] == "float16" else cfg["torch_dtype"]
        kw.update(overrides)
        return ModelConfig(**kw)

    @staticmethod
    def from_pretrained(path: str, **overrides) -> "ModelConfig":
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        return ModelConfig.from_hf_config(cfg, **overrides)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Engine/runtime knobs (reference: cpmcu/common/args.py:22-155 defaults)."""

    chunk_length: int = 2048
    memory_limit: float = 0.8
    max_total_length: int = 0  # 0 = solve from HBM budget (core.memory)
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = 0
    random_seed: int = 0

    # tokens generated per fused device program (the CUDA-Graph-replay
    # analog; 1 = step-per-dispatch like the reference)
    decode_segment_size: int = 16
    # reuse KV rows of the longest shared token prefix with the previous
    # request (multi-turn chat skips re-prefilling the conversation
    # history). Lossless: KV is deterministic in the token prefix. No
    # reference counterpart (the reference re-prefills every request).
    prefix_cache: bool = False
    # spec rounds fused per device program (1 = sync per round, like the
    # reference's per-step accept readback). On a tunneled device the
    # per-dispatch round trip (~50-70ms) dominates a ~10ms device round, so
    # fuse deep; rounds past the generation end are clipped by the caller.
    spec_segment_size: int = 12

    # speculative decoding (reference defaults args.py:50-66)
    use_spec: bool = False
    spec_num_iter: int = 2
    spec_topk_per_iter: int = 10
    spec_tree_size: int = 12
    spec_window_size: int = 1024
    frspec_vocab_size: int = 0

    # sharding
    tp_size: int = 1
    dp_size: int = 1


# MiniCPM4 YARN factors, hardcoded by the reference for long-context runs
# (cpmcu/common/utils.py:183-210 apply_minicpm4_yarn_config); head_dim 128
# -> 64 per-frequency factors, long == short.
MINICPM4_YARN_FACTORS = (
    0.9977997200264581, 1.014658295992452, 1.0349680404997148, 1.059429246056193,
    1.0888815016813513, 1.1243301355211495, 1.166977103606075, 1.2182568066927284,
    1.2798772354275727, 1.3538666751582975, 1.4426259039919596, 1.5489853358570191,
    1.6762658237220625, 1.8283407612492941, 2.0096956085876183, 2.225478927469756,
    2.481536379650452, 2.784415934557119, 3.1413289096347365, 3.560047844772632,
    4.048719380066383, 4.752651957515948, 5.590913044973868, 6.584005926629993,
    7.7532214876576155, 9.119754865903639, 10.704443927019176, 12.524994176518703,
    14.59739595363613, 16.93214476166354, 19.53823297353041, 22.417131025031697,
    25.568260840911098, 28.991144156566317, 32.68408069090375, 36.65174474170465,
    40.90396065611201, 45.4664008671033, 50.37147343433591, 55.6804490772103,
    61.470816952306556, 67.8622707390618, 75.00516023410414, 83.11898235973767,
    92.50044360202462, 103.57086856690864, 116.9492274587385, 118.16074567836519,
    119.18497548708795, 120.04810876261652, 120.77352815196981, 121.38182790207875,
    121.89094985353891, 122.31638758099915, 122.6714244963338, 122.9673822552567,
    123.21386397019609, 123.41898278254268, 123.58957065488238, 123.73136519024158,
    123.84917421274221, 123.94701903496814, 124.02825801299717, 124.09569231686116,
)


def minicpm4_yarn_rope(
    theta: float = 10000.0,
    original_max: int = 32768,
    max_position: int = 131072,
) -> RopeConfig:
    """LongRoPE/YARN RopeConfig with the MiniCPM4 factor table applied."""
    return RopeConfig(
        rope_type="longrope",
        theta=theta,
        short_factor=MINICPM4_YARN_FACTORS,
        long_factor=MINICPM4_YARN_FACTORS,
        original_max_position_embeddings=original_max,
        max_position_embeddings=max_position,
    )


# Known-good configs for the BASELINE ladder (sizes from the public
# MiniCPM4 configs; used for synthetic benchmarks when no checkpoint is
# mounted).
MINICPM4_0_5B = ModelConfig(
    vocab_size=73448,
    num_layers=24,
    hidden_size=1024,
    intermediate_size=4096,
    num_heads=16,
    num_kv_heads=2,
    head_dim=64,
    rms_norm_eps=1e-5,
    rope=RopeConfig(rope_type="default", theta=100000.0),
    scale_emb=12.0,
    scale_lmhead=256.0 / 1024.0,
    scale_residual=1.4 / math.sqrt(24),
)

MINICPM4_8B = ModelConfig(
    vocab_size=73448,
    num_layers=32,
    hidden_size=4096,
    intermediate_size=16384,
    num_heads=32,
    num_kv_heads=2,
    head_dim=128,
    rms_norm_eps=1e-5,
    rope=RopeConfig(rope_type="default", theta=10000.0),
    scale_emb=12.0,
    scale_lmhead=256.0 / 4096.0,
    scale_residual=1.4 / math.sqrt(32),
)
