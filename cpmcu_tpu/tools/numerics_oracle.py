"""Numerics oracle: bound the activation-dtype divergence at W4A16.

The CUDA reference runs fp16 activations with fp32 accumulation
(src/model/linear.cuh:8-40; default dtype cpmcu/common/args.py:38); this
framework promotes fp16 checkpoints to bf16 (the native MXU dtype,
core/config.py from_hf_config). Nothing else in the stack bounds the
resulting logits divergence — which gates the accept-length-parity target
(SURVEY.md hard part 6): the spec drafter and base must agree on argmax for
the same sequence as often as under fp16.

This tool quantifies it: the same W4A16 weights are run at float32 (ground
truth), bfloat16 and float16 activations; we report per-dtype max-abs logit
error, KL(f32 || dtype) and top-1 agreement, plus the extra divergence of
the W4 lm_head vs the bf16 lm_head (core/config.py quant_lmhead). Usage::

    python -m cpmcu_tpu.tools.numerics_oracle [--tokens 256] [--seed 0]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Dict

import numpy as np


def _forward_logits(cfg, params, ids):
    import jax.numpy as jnp

    from ..models import llama

    return np.asarray(
        llama.forward_batch(cfg, params, jnp.asarray(ids)[None])[0],
        np.float32,
    )


def _cast_params(params, dtype):
    import jax
    import jax.numpy as jnp

    def cast(path, x):
        # int4 packs stay int32; group scales ('s') keep their pack dtype
        # in every activation-dtype mode (the kernels cast scales to f32 at
        # use), so the quantized weights are bit-identical across variants
        if x.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
            return x
        if path and getattr(path[-1], "key", None) == "s":
            return x
        return x.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


def _metrics(ref: np.ndarray, got: np.ndarray) -> Dict[str, float]:
    """ref/got: (T, V) fp32 logits."""

    def softmax(x):
        x = x - x.max(axis=-1, keepdims=True)
        e = np.exp(x)
        return e / e.sum(axis=-1, keepdims=True)

    p, q = softmax(ref), softmax(got)
    kl = float(np.mean(np.sum(p * (np.log(p + 1e-20) - np.log(q + 1e-20)), -1)))
    return {
        "max_abs_err": float(np.max(np.abs(ref - got))),
        "rel_rms": float(
            np.sqrt(np.mean((ref - got) ** 2)) / (np.sqrt(np.mean(ref**2)) + 1e-20)
        ),
        "mean_kl": kl,
        "top1_agree": float(np.mean(ref.argmax(-1) == got.argmax(-1))),
    }


def run_oracle(tokens: int = 128, seed: int = 0, cfg=None) -> Dict[str, Dict]:
    """Build a small synthetic W4A16 model and measure dtype divergence."""
    import jax

    from ..core.config import ModelConfig, RopeConfig
    from ..models import llama
    from ..models.quantize import quantize_params

    if cfg is None:
        cfg = ModelConfig(
            vocab_size=2048, num_layers=4, hidden_size=1024,
            intermediate_size=2048, num_heads=8, num_kv_heads=2, head_dim=128,
            rope=RopeConfig(), dtype="float32", scale_emb=12.0,
            scale_lmhead=0.25, scale_residual=0.7,
        )
    dense = llama.init_params(cfg, jax.random.PRNGKey(seed), scale=0.05)
    qcfg = dataclasses.replace(cfg, quant=True)
    qparams = quantize_params(dense, qcfg)
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, cfg.vocab_size, size=tokens).astype(np.int32)

    ref = _forward_logits(dataclasses.replace(qcfg, dtype="float32"),
                          _cast_params(qparams, np.float32), ids)
    out: Dict[str, Dict] = {}
    for dt in ("bfloat16", "float16"):
        got = _forward_logits(
            dataclasses.replace(qcfg, dtype=dt), _cast_params(qparams, dt), ids
        )
        out[dt] = _metrics(ref, got)

    # W4 lm_head extra divergence (bf16 activations held fixed)
    qlm = quantize_params(dense, dataclasses.replace(qcfg, quant_lmhead=True))
    bf = _forward_logits(dataclasses.replace(qcfg, dtype="bfloat16"),
                         _cast_params(qparams, "bfloat16"), ids)
    w4 = _forward_logits(dataclasses.replace(qcfg, dtype="bfloat16",
                                             quant_lmhead=True),
                         _cast_params(qlm, "bfloat16"), ids)
    out["w4_lmhead_vs_bf16_head"] = _metrics(bf, w4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    print(json.dumps(run_oracle(args.tokens, args.seed), indent=2))


if __name__ == "__main__":
    main()
