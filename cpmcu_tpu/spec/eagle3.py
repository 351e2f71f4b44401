"""EAGLE-3 tree drafter, TPU-native.

Functional re-design of the reference's Eagle3Impl
(src/model/eagle3/eagle3.cuh:79-860, layer_eagle3.cuh, attn_eagle3.cuh):

  * the drafter is ONE decoder layer whose attention input is the
    concatenation of the token embedding and a hidden state (2H wide;
    attn_eagle3.cuh:30,40);
  * the hidden input comes from base-model features tapped at three layers
    (e.g. {2, 16, 29} of 32 — model.cuh:51), concatenated to 3H and fused by
    a single ``fc`` (3H -> H, eagle3.cuh:209);
  * the drafter has its own lm_head over a smaller draft vocabulary plus a
    ``d2t`` draft->target id mapping (eagle3.cuh:96-100, vocab_mapping,
    tools_ealge3.cuh:45-60), and an output RMSNorm applied to the layer
    output before the head (eagle3.cuh:214, 503).

Two places where this follows the published EAGLE-3 (HF) semantics where
the CUDA port deviates, both documented here for the parity record:
  * the layer's ``input_layernorm`` normalizes the *embedding* half and
    ``hidden_norm`` the hidden half before concatenation (the reference
    applies a H-wide norm to the 2H concat buffer, attn_eagle3.cuh:132 —
    an out-of-bounds read of the arena);
  * candidate ids produced over the draft vocabulary are mapped through
    ``d2t`` *before* embedding lookups (the reference embeds raw draft ids
    with base embeddings, eagle3.cuh:668, which only matches when the two
    vocabularies coincide).
Like the reference, the FFN residual base is the *normalized* hidden
(layer_eagle3.cuh:81: ffn gets hidden_norm->output as the stream).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..cache.kv import KVCache, append_layer
from ..core.config import ModelConfig
from ..layers.modules import gated_ffn, linear, rms_norm
from ..layers.rotary import apply_rope
from ..ops.attention import mha
from .tree import ancestor_closure


@dataclasses.dataclass(frozen=True)
class Eagle3Config:
    """Drafter dims + speculation knobs.

    ``model`` carries the draft layer's head geometry (num_heads etc.) with
    hidden_size == the base hidden size; vocab_size is the DRAFT vocabulary.
    """

    model: ModelConfig
    num_iter: int = 2
    topk_per_iter: int = 10
    tree_size: int = 12
    window: int = 0
    tap_layers: Tuple[int, ...] = (2, 16, 29)

    def __post_init__(self):
        assert self.tree_size <= 64, "tree_size must be <= 64"
        assert self.topk_per_iter <= self.tree_size - 1

    @property
    def total_tried(self) -> int:
        k = self.topk_per_iter
        return k * k * (self.num_iter - 1) + k


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Eagle3State:
    """Drafter carry between spec rounds: accepted tokens' embeddings and
    their base-model tap features (already fc-fused happens per round)."""

    kv: KVCache  # single-layer draft KV
    prev_embed: jax.Array  # (tree_size, H)
    prev_taps: jax.Array  # (tree_size, 3H) accepted rows of the tap concat
    num_prev: jax.Array  # int32
    pos0: jax.Array  # int32


def init_eagle3_params(ecfg: Eagle3Config, key, scale: float = 0.02) -> dict:
    m = ecfg.model
    H, D = m.hidden_size, m.head_dim
    Hq, Hkv = m.q_size, m.kv_size
    I, Vd = m.intermediate_size, m.vocab_size
    dt = m.jnp_dtype
    ks = iter(jax.random.split(key, 12))

    def w(shape):
        return (jax.random.normal(next(ks), shape, jnp.float32) * scale).astype(dt)

    return {
        "fc": {"w": w((len(ecfg.tap_layers) * H, H))},
        "input_norm": jnp.ones((H,), dt),
        "hidden_norm": jnp.ones((H,), dt),
        "wq": {"w": w((2 * H, Hq))},
        "wk": {"w": w((2 * H, Hkv))},
        "wv": {"w": w((2 * H, Hkv))},
        "wo": {"w": w((Hq, H))},
        "ffn_norm": jnp.ones((H,), dt),
        "w_gate": {"w": w((H, I))},
        "w_up": {"w": w((H, I))},
        "w_down": {"w": w((I, H))},
        "output_norm": jnp.ones((H,), dt),
        "lm_head": {"w": w((H, Vd))},
        "d2t": jnp.arange(Vd, dtype=jnp.int32),
    }


# ---------------------------------------------------------------------------
# the single drafter layer
# ---------------------------------------------------------------------------


def eagle3_layer(
    ecfg: Eagle3Config,
    ep: dict,
    emb: jax.Array,  # (T, H) token embeddings (base table, base-scale)
    hidden: jax.Array,  # (T, H) fc output / previous round's layer output
    positions: jax.Array,  # (T,)
    kv: KVCache,  # (1, KVH, S, D)
    rope,
    prior,
    write_at,
    tree_mask=None,
    attn_impl: str = "auto",
):
    """One pass of the 2H-input decoder layer. Returns (normed_out, new kv).

    ``normed_out`` is output_norm(layer output) — what both the lm_head and
    the next round's hidden input consume (eagle3.cuh:502-507).
    """
    m = ecfg.model
    rope_cos, rope_sin = rope
    T = emb.shape[0]

    e = rms_norm(emb, ep["input_norm"], m.rms_norm_eps)
    hn = rms_norm(hidden, ep["hidden_norm"], m.rms_norm_eps)
    x = jnp.concatenate([e, hn], axis=-1)  # (T, 2H)

    q = linear(ep["wq"], x).reshape(T, m.num_heads, m.head_dim)
    k = linear(ep["wk"], x).reshape(T, m.num_kv_heads, m.head_dim)
    v = linear(ep["wv"], x).reshape(T, m.num_kv_heads, m.head_dim)
    q, k = apply_rope(q, k, rope_cos, rope_sin, positions)

    k_c, v_c = append_layer(kv.k[0], kv.v[0], k, v, write_at)
    out = mha(
        q, k_c, v_c, prior,
        tree_mask=tree_mask, window=ecfg.window, impl=attn_impl,
    )
    attn_out = linear(ep["wo"], out.reshape(T, m.q_size))

    # residual stream base = normalized hidden (layer_eagle3.cuh:81)
    h = hn + attn_out * jnp.asarray(m.scale_residual, hn.dtype)
    normed = rms_norm(h, ep["ffn_norm"], m.rms_norm_eps)
    h = h + gated_ffn(ep, normed) * jnp.asarray(m.scale_residual, h.dtype)

    normed_out = rms_norm(h, ep["output_norm"], m.rms_norm_eps)
    return normed_out, KVCache(k_c[None], v_c[None], kv.length)


def _draft_logits(ep: dict, h: jax.Array) -> jax.Array:
    return jax.nn.log_softmax(
        linear(ep["lm_head"], h).astype(jnp.float32), axis=-1
    )


def _d2t(ep: dict, ids: jax.Array) -> jax.Array:
    return jnp.take(ep["d2t"], ids, axis=0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# tree expansion
# ---------------------------------------------------------------------------


def eagle3_draft(
    ecfg: Eagle3Config,
    base_cfg: ModelConfig,
    ep: dict,
    base_params: dict,
    rope,
    ekv: KVCache,
    h_root: jax.Array,  # (H,) drafter normed output at the root token
    orig,  # int32 base cache length
    attn_impl: str = "auto",
):
    """Grow the draft tree (eagle3.cuh:619-737). Returns
    (tree_tokens, tree_pos, tree_mask (S,S), tree_parent, new draft kv);
    tree_tokens[0] is -1 (caller fills the root)."""
    K, S, NI, TT = (
        ecfg.topk_per_iter, ecfg.tree_size, ecfg.num_iter, ecfg.total_tried
    )
    m = ecfg.model
    H = m.hidden_size

    lp0 = _draft_logits(ep, h_root[None])[0]
    from .eagle import topk_wide
    val0, tok0 = topk_wide(lp0, K)  # draft-vocab ids

    tried_val = jnp.full((TT,), -jnp.inf, jnp.float32).at[:K].set(val0)
    tried_tok = jnp.zeros((TT,), jnp.int32).at[:K].set(tok0)
    parent_rec = jnp.zeros((max(NI - 1, 1) * K,), jnp.int32)

    frontier_tok = tok0
    frontier_val = val0
    frontier_hidden = jnp.broadcast_to(h_root, (K, H)).astype(h_root.dtype)
    emask = jnp.zeros((K, K * NI), jnp.bool_).at[
        jnp.arange(K), jnp.arange(K)
    ].set(True)

    for d in range(1, NI):
        real_ids = _d2t(ep, frontier_tok)
        from ..layers.modules import embedding

        emb = embedding(base_params["embed"], real_ids, base_cfg.scale_emb,
                        m.jnp_dtype)
        positions = jnp.full((K,), orig + (d - 1), jnp.int32)
        h, ekv = eagle3_layer(
            ecfg, ep, emb, frontier_hidden, positions, ekv, rope,
            prior=orig, write_at=orig + K * (d - 1),
            tree_mask=emask[:, : K * d], attn_impl=attn_impl,
        )
        lp = _draft_logits(ep, h)  # (K, Vd)
        val, tok = topk_wide(lp, K)
        joint = (val + frontier_val[:, None]).reshape(-1)
        toks_flat = tok.reshape(-1)

        off = K + (d - 1) * K * K
        tried_val = jax.lax.dynamic_update_slice(tried_val, joint, (off,))
        tried_tok = jax.lax.dynamic_update_slice(tried_tok, toks_flat, (off,))

        fval, fpos = jax.lax.top_k(joint, K)
        parent_rec = jax.lax.dynamic_update_slice(
            parent_rec, fpos + off, ((d - 1) * K,)
        )
        parent_row = fpos // K
        new_emask = emask[parent_row]
        new_emask = new_emask.at[jnp.arange(K), K * d + jnp.arange(K)].set(True)
        emask = new_emask
        frontier_hidden = h[parent_row]
        frontier_tok = toks_flat[fpos]
        frontier_val = fval

    _, sel = jax.lax.top_k(tried_val, S - 1)

    reverse = jnp.zeros((TT,), jnp.int32).at[sel].set(
        jnp.arange(1, S, dtype=jnp.int32)
    )

    def depth_of(p):
        return jnp.where(p < K, 1, (p - K) // (K * K) + 2)

    def parent_tried_of(p):
        pp = p - K
        d1 = pp // K
        dn = parent_rec[jnp.clip((pp - K * K) // K, 0, parent_rec.shape[0] - 1)]
        pt = jnp.where(pp < K * K, d1, dn)
        return jnp.where(p < K, -1, pt)

    depths = depth_of(sel)
    ptried = parent_tried_of(sel)
    parents = jnp.where(ptried < 0, 0, reverse[jnp.clip(ptried, 0, TT - 1)])

    tree_parent = jnp.concatenate([jnp.zeros((1,), jnp.int32), parents])
    tree_pos = jnp.concatenate(
        [jnp.asarray(orig, jnp.int32)[None], orig + depths.astype(jnp.int32)]
    )
    tree_mask = ancestor_closure(tree_parent)
    # map the selected draft ids to target ids for the base tree decode
    # (vocab_mapping, eagle3.cuh:724-729)
    tree_tokens = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), _d2t(ep, tried_tok[sel])]
    )
    return tree_tokens, tree_pos, tree_mask, tree_parent, ekv
