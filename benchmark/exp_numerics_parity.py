"""W4A16 numerics oracle: bound the bf16-vs-fp16 logits divergence.

VERDICT r1 "Missing #4": the reference runs fp16 activations with fp32
accumulation (src/model/linear.cuh:8-40, default dtype common/args.py:38);
this repo promotes fp16 -> bf16 (the MXU-native dtype). Nothing bounded the
divergence, which gates the accept-length-parity target (SURVEY hard part 6).

Method: ONE synthetic W4A16 checkpoint, three activation dtypes over the
same greedy generation — fp32 (exact oracle), bf16 (ours), fp16 (the
reference's). Reported per pair vs the fp32 oracle: max|Δlogit|, KL, top-1
agreement (tools.logits_parity.compare_captures). If bf16's divergence from
fp32 is of the same order as fp16's, the engine dtype cannot be the source
of an accept-length gap at identical checkpoints.

CPU run (no chip needed): timeout 900 python benchmark/exp_numerics_parity.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# oneDNN bf16 matmul emulation is garbage-precision by default
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np


def build(dtype: str):
    from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
    from cpmcu_tpu.engine.engine import Engine
    from cpmcu_tpu.models import llama, quantize

    cfg = ModelConfig(
        vocab_size=8192, num_layers=4, hidden_size=1024,
        intermediate_size=2048, num_heads=8, num_kv_heads=2, head_dim=128,
        rope=RopeConfig(), dtype=dtype, quant=True,
    )
    # identical quantized weights across dtypes: init in fp32, quantize once
    base = llama.init_params(
        dataclasses.replace(cfg, dtype="float32", quant=False),
        jax.random.PRNGKey(0),
    )
    qparams = quantize.quantize_params(base, cfg)
    # non-quantized leaves (norms, embeddings) carried in the engine dtype
    qparams = jax.tree.map(
        lambda x: x.astype(cfg.jnp_dtype)
        if hasattr(x, "dtype") and x.dtype in (np.float32, np.dtype("float32"))
        else x,
        qparams,
    )
    eng = Engine(cfg, EngineConfig(chunk_length=128, max_total_length=512),
                 qparams, attn_impl="xla")
    return eng


def main():
    from cpmcu_tpu.tools.logits_parity import capture_logits, compare_captures

    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 8192, size=96).tolist() for _ in range(4)]
    caps = {}
    for dtype in ("float32", "bfloat16", "float16"):
        try:
            eng = build(dtype)
            caps[dtype] = capture_logits(eng, prompts, generation_length=24)
            print(f"{dtype}: captured", flush=True)
        except Exception as e:  # fp16 may be unsupported by a CPU kernel path
            print(f"{dtype}: FAILED ({type(e).__name__}: {e})", flush=True)
    out = {}
    for dtype in ("bfloat16", "float16"):
        if dtype in caps and "float32" in caps:
            rep = compare_captures(caps["float32"], caps[dtype])
            out[f"f32_vs_{dtype}"] = rep
            print(f"f32 vs {dtype}: {json.dumps(rep)}", flush=True)
    if "bfloat16" in caps and "float16" in caps:
        rep = compare_captures(caps["bfloat16"], caps["float16"])
        out["bf16_vs_f16"] = rep
        print(f"bf16 vs f16: {json.dumps(rep)}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
