"""Oracle drafter fixtures: best-case accept-rate endpoints for benches.

With synthetic (random) weights the EAGLE drafter is uninformed and every
spec round accepts ~1 token — the opposite endpoint of the reference's
measured ~2.5 accept on real checkpoints (reference README.md:102). The
oracle pair here makes greedy chains ALWAYS verify (accept == num_iter+1
each round) while keeping HBM traffic and compute IDENTICAL to the
random-weight config, so the two runs bracket any real checkpoint's
throughput. See tests/test_spec.py's bigram-oracle fixture for the
correctness-scale version.
"""

from __future__ import annotations

import numpy as np


def oracle_spec_pair(cfg, ecfg):
    """Base + EAGLE drafter whose greedy chains ALWAYS verify: base layers
    dequantize to exactly zero (nibble 8 == value 0), so logits are a
    deterministic bigram map of the current token; the drafter (fc1=I,
    zero layers, shared lm_head) reproduces the base argmax at every
    depth. Zero packs stream the same bytes as random packs, so the
    measured tok/s is the real best-case endpoint."""
    import jax
    import jax.numpy as jnp

    from ..models.quantize import init_params_quant
    from .eagle import init_eagle_params

    H = cfg.hidden_size
    zero_word = np.int32(np.uint32(0x88888888).astype(np.int64) - (1 << 32))

    def zero_layers(layers):
        return {
            k: ({**v, "q": jnp.full_like(v["q"], zero_word)}
                if isinstance(v, dict) and "q" in v else v)
            for k, v in layers.items()
        }

    params = init_params_quant(cfg, jax.random.PRNGKey(0))
    params["layers"] = zero_layers(params["layers"])
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(1))
    if "q" in eparams["layers"].get("wq", {}):
        eparams["layers"] = zero_layers(eparams["layers"])
    else:
        eparams["layers"] = jax.tree.map(
            lambda x: jnp.zeros_like(x), eparams["layers"]
        )
    eparams["fc1"] = {"w": jnp.eye(H, dtype=cfg.jnp_dtype),
                      "b": jnp.zeros((H,), cfg.jnp_dtype)}
    eparams["fc2"] = {"w": jnp.zeros((H, H), cfg.jnp_dtype)}
    # no FR head: draft_logits falls back to the base lm_head, which makes
    # the drafter argmax-identical to the base by construction
    eparams.pop("lm_head", None)
    eparams.pop("token_id_remap", None)
    return params, eparams

def oracle_hier_triple(cfg, draft_cfg, ecfg):
    """Base + chain draft model + inner EAGLE drafter whose greedy outputs
    ALWAYS agree — the hier analog of oracle_spec_pair, bracketing the
    engine's best-case (accept == max_chain+1 every outer round).

    Zero-valued layer packs make each model's logits a function of the
    current token only; tying each lm_head to that model's OWN embedding
    makes the function the SELF map (argmax_j e_j . norm(e_t) = t for
    random embeds: the self dot is ~64 sigma above cross terms, robust to
    the head's 4-bit quantization), so the big and small models' bigrams
    coincide by construction. HBM traffic stays that of the real config:
    zero packs stream the same bytes, and the tied head is packed/padded
    exactly like the headline's quant lm_head."""
    import jax
    import jax.numpy as jnp

    from ..models import llama
    from ..models.quantize import init_params_quant
    from ..ops.quant import pack_weights_padded
    from .eagle import init_eagle_params

    zero_word = np.int32(np.uint32(0x88888888).astype(np.int64) - (1 << 32))

    def zero_layers(layers):
        return {
            k: ({**v, "q": jnp.full_like(v["q"], zero_word)}
                if isinstance(v, dict) and "q" in v else v)
            for k, v in layers.items()
        }

    def tie_head(params, model_cfg):
        embed = np.asarray(params["embed"], np.float32)
        if model_cfg.quant_lmhead:
            params["lm_head"] = pack_weights_padded(embed.T)
        else:
            params["lm_head"] = {
                "w": jnp.asarray(embed.T, model_cfg.jnp_dtype)}
        return params

    params = init_params_quant(cfg, jax.random.PRNGKey(0))
    params["layers"] = zero_layers(params["layers"])
    params = tie_head(params, cfg)

    if draft_cfg.quant:
        dparams = init_params_quant(draft_cfg, jax.random.PRNGKey(1))
        dparams["layers"] = zero_layers(dparams["layers"])
    else:
        dparams = llama.init_params(draft_cfg, jax.random.PRNGKey(1))
        dparams["layers"] = jax.tree.map(
            lambda x: jnp.zeros_like(x), dparams["layers"])
        # norms must stay 1 (zeroing them kills the residual stream)
        H = draft_cfg.hidden_size
        dparams["layers"]["attn_norm"] = jnp.ones(
            (draft_cfg.num_layers, H), draft_cfg.jnp_dtype)
        dparams["layers"]["ffn_norm"] = jnp.ones(
            (draft_cfg.num_layers, H), draft_cfg.jnp_dtype)
    dparams = tie_head(dparams, draft_cfg)

    Hd = draft_cfg.hidden_size
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(2))
    if "q" in eparams["layers"].get("wq", {}):
        eparams["layers"] = zero_layers(eparams["layers"])
    else:
        eparams["layers"] = jax.tree.map(
            lambda x: jnp.zeros_like(x), eparams["layers"])
    eparams["fc1"] = {"w": jnp.eye(Hd, dtype=draft_cfg.jnp_dtype),
                      "b": jnp.zeros((Hd,), draft_cfg.jnp_dtype)}
    eparams["fc2"] = {"w": jnp.zeros((Hd, Hd), draft_cfg.jnp_dtype)}
    eparams.pop("lm_head", None)
    eparams.pop("token_id_remap", None)
    return params, dparams, eparams
