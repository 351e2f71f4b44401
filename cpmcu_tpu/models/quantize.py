"""Quantized param-pytree construction.

Two entry points:
  * ``quantize_params`` — quantize a dense pytree in place (synthetic
    benchmarks, tests; also the W4A16 QAT-export analog).
  * ``io.hf_loader.load_params`` handles real GPTQ checkpoints via
    ``ops.quant.repack_gptq``.

Which linears are quantized mirrors the reference's W4A16 model: all
per-layer projections (q/k/v/o/gate/up/down); embedding, norms and lm_head
stay in the activation dtype (src/model/w4a16_gptq_marlin/
w4a16_gptq_marlin_model.cuh keeps Embedding/RMSNorm/LMHead dense).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig
from ..ops.quant import GROUP_SIZE, SCALE_DTYPE, pack_rows, quantize_np

QUANT_LINEARS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_params(params: dict, cfg: ModelConfig) -> dict:
    """Dense stacked pytree -> W4A16 pytree ({'w'} -> {'q','s'} packs).

    With ``cfg.quant_lmhead`` the lm_head also quantizes, N-padded to the
    decode kernel's widest tile (pack_weights_padded); logits are sliced
    back to the vocab by layers.modules.lm_head."""
    layers = dict(params["layers"])
    for name in QUANT_LINEARS:
        p = dict(layers[name])
        w = np.asarray(p.pop("w"), np.float32)  # (L, K, N)
        L, K, N = w.shape
        qs, ss = [], []
        for l in range(L):
            q4, s = quantize_np(w[l], GROUP_SIZE)
            qs.append(pack_rows(q4))
            ss.append(s)
        p["q"] = jnp.asarray(np.stack(qs))
        p["s"] = jnp.asarray(np.stack(ss), SCALE_DTYPE)
        layers[name] = p
    out = {**params, "layers": layers}
    if cfg.quant_lmhead and "w" in params.get("lm_head", {}):
        from ..ops.quant import pack_weights_padded

        out["lm_head"] = pack_weights_padded(
            np.asarray(params["lm_head"]["w"], np.float32)
        )
    return out


def init_layers_quant(cfg: ModelConfig, key) -> dict:
    """Synthetic stacked W4A16 decoder layers in packed form (no embed /
    final norm / lm_head — also used for quantized drafter layers, matching
    the reference's W4A16 eagle/draft models, e.g.
    src/model/eagle_quant/eagle_base_quant.cuh)."""
    import jax

    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv = cfg.q_size, cfg.kv_size
    dt = cfg.jnp_dtype
    ks = iter(jax.random.split(key, 16))

    def pack(shape_kn):
        K, N = shape_kn
        q = jax.random.randint(next(ks), (L, K // 8, N), -(2**31), 2**31 - 1, jnp.int32)
        s = jnp.full((L, K // GROUP_SIZE, N), 0.02 / np.sqrt(K), SCALE_DTYPE)
        return {"q": q, "s": s}

    layers = {
        "attn_norm": jnp.ones((L, H), dt),
        "ffn_norm": jnp.ones((L, H), dt),
        "wq": pack((H, Hq)),
        "wk": pack((H, Hkv)),
        "wv": pack((H, Hkv)),
        "wo": pack((Hq, H)),
        "w_gate": pack((H, I)),
        "w_up": pack((H, I)),
        "w_down": pack((I, H)),
    }
    if cfg.use_qk_norm:
        layers["q_norm"] = jnp.ones((L, cfg.head_dim), dt)
        layers["k_norm"] = jnp.ones((L, cfg.head_dim), dt)
    return layers


def init_params_quant(cfg: ModelConfig, key) -> dict:
    """Synthetic W4A16 params straight in packed form (benchmarks only —
    avoids staging the fp32 model on host). Values are plausible-scale
    random weights; logits are meaningless but finite."""
    import jax

    H = cfg.hidden_size
    dt = cfg.jnp_dtype
    k_layers, k_embed, k_head = jax.random.split(key, 3)
    ks = iter(jax.random.split(k_head, 4))

    embed = (jax.random.normal(k_embed, (cfg.vocab_size, H), jnp.float32) * 0.02).astype(dt)
    layers = init_layers_quant(cfg, k_layers)
    if cfg.quant_lmhead:
        Vp = -(-cfg.vocab_size // 2048) * 2048  # kernel-tile-padded vocab
        q = jax.random.randint(next(ks), (H // 8, Vp), -(2**31), 2**31 - 1,
                               jnp.int32)
        s = jnp.full((H // GROUP_SIZE, Vp), 0.02 / np.sqrt(H), SCALE_DTYPE)
        lm_head = {"q": q, "s": s}
    else:
        lm = (jax.random.normal(next(ks), (H, cfg.vocab_size), jnp.float32)
              * 0.02).astype(dt)
        lm_head = {"w": lm}
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": jnp.ones((H,), dt),
        "lm_head": lm_head,
    }


def dequantize_params(params: dict) -> dict:
    """Inverse (testing): W4A16 pytree -> dense fp32 pytree."""
    from ..ops.quant import dequantize

    layers = dict(params["layers"])
    for name in QUANT_LINEARS:
        if "q" not in layers[name]:
            continue
        p = dict(layers[name])
        q, s = p.pop("q"), p.pop("s")
        L = q.shape[0]
        w = jnp.stack([dequantize(q[l], s[l]) for l in range(L)])
        p["w"] = w
        layers[name] = p
    return {**params, "layers": layers}
