"""EAGLE-2 tree drafter, TPU-native.

Functional re-design of the reference's imperative draft loop
(src/model/eagle.cuh:430-492, src/model/minicpm4/minicpm4_eagle.cuh): the
iterative top-k tree expansion becomes a fixed-shape Python loop over
``num_iter`` (static) inside one jitted spec step — no per-depth host syncs,
no recompiles.

Semantics mirrored exactly:
  * draft input = fc1(embed) + fc2(hidden) with optional input RMSNorms
    (MiniCPM4 variant) — eagle.cuh:387-391, minicpm4_eagle.cuh:231-240;
  * draft decoder layers = base Layer graph with the base residual scale;
    layer0's attention norm replaced by identity when ``use_attn_norm`` is
    false (the vanilla-EAGLE ``Skip`` norm, eagle.cuh:320);
  * per-depth: embed frontier -> 1 masked decode over the draft KV with the
    growing slot mask -> log_softmax -> per-node top-k -> joint logprob
    cumsum -> global re-top-k over tried candidates (eagle.cuh:456-483);
  * final global top-(tree_size-1) over all tried candidates + vectorized
    ``build_dynamic_tree`` (parent recovery + ancestor-closure masks);
  * FR-Spec: draft lm_head over the frequency-ranked sub-vocabulary, ids
    remapped through ``token_id_remap`` before embedding / emission
    (minicpm4_eagle.cuh:220-224, 330-334, 383-398). The FR head applies no
    lm_head scale, matching the reference's plain Linear;
  * sliding-window draft attention (``eagle_window_size``) bounds draft KV
    reads for long contexts.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..cache.kv import KVCache
from ..core.config import ModelConfig
from ..layers.attention import attention_block
from ..layers.modules import gated_ffn, linear, rms_norm
from ..models.llama import rope_tables  # noqa: F401  (re-export convenience)


@dataclasses.dataclass(frozen=True)
class EagleConfig:
    """Draft-model dims + speculation knobs (cpmcu/common/args.py defaults)."""

    model: ModelConfig  # draft decoder dims; hidden_size == base hidden
    num_iter: int = 2
    topk_per_iter: int = 10
    tree_size: int = 12
    window: int = 0  # eagle_window_size (0 = full attention)
    frspec_vocab_size: int = 0  # 0 = full vocab
    use_input_norm: bool = False
    use_attn_norm: bool = True  # False -> layer0 attn norm is identity
    rotation: bool = False  # hier-spec rotation variant: an extra Linear
    # ("eagle.rms_norm_rotation") applied to prev_hidden before fc2
    # (hier_ea_w4a16_gm_rot_spec_w4a16_gm.cuh:22,294-310; selected via
    # rotation=True, hier_eagle_w4a16_gm_spec_w4a16_gm.py:44,94-95)

    def __post_init__(self):
        assert self.tree_size <= 64, "tree_size must be <= 64"
        assert self.topk_per_iter <= self.tree_size - 1

    @property
    def total_tried(self) -> int:
        k = self.topk_per_iter
        return k * k * (self.num_iter - 1) + k


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EagleState:
    """Drafter memory between spec steps (decode phase).

    ``prev_embed``/``prev_hidden`` hold the accepted tokens' embedding and
    post-final-norm base hidden rows (padded to tree_size); ``num_prev``
    valid; ``pos0`` = base position of row 0.
    """

    kv: KVCache
    prev_embed: jax.Array  # (tree_size, H)
    prev_hidden: jax.Array  # (tree_size, H)
    num_prev: jax.Array  # int32
    pos0: jax.Array  # int32


def init_eagle_params(ecfg: EagleConfig, key, scale: float = 0.02) -> dict:
    from ..models import llama

    m = ecfg.model
    H = m.hidden_size
    dt = m.jnp_dtype
    ks = iter(jax.random.split(key, 8))

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    if m.quant:
        # W4A16 drafter decoder layers (the reference headline quantizes
        # the eagle drafter too: src/model/eagle_quant/, entry.cu
        # eagle_base_quant). fc1/fc2 and the (FR) head stay dense, like the
        # reference's fp16 eagle.fc/lm_head.
        from ..models.quantize import init_layers_quant

        layers = init_layers_quant(m, next(ks))
    else:
        layers = llama.init_params(m, next(ks), scale)["layers"]
    p = {
        "fc1": {"w": w(next(ks), (H, H)), "b": jnp.zeros((H,), dt)},
        "fc2": {"w": w(next(ks), (H, H))},
        "layers": layers,
    }
    if ecfg.use_input_norm:
        p["input_norm1"] = jnp.ones((H,), dt)
        p["input_norm2"] = jnp.ones((H,), dt)
    if ecfg.rotation:
        p["rotation"] = {"w": w(next(ks), (H, H))}
    return p


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------


def eagle_fc(ecfg: EagleConfig, ep: dict, embed, hidden):
    m = ecfg.model
    e, h = embed, hidden
    if ecfg.use_input_norm:
        e = rms_norm(e, ep["input_norm1"], m.rms_norm_eps)
        h = rms_norm(h, ep["input_norm2"], m.rms_norm_eps)
    if ecfg.rotation:
        # hier rotation variant: prev_hidden passes through the
        # rms_norm_rotation Linear before fc2 (hier_ea..rot..cuh:294-310)
        h = linear(ep["rotation"], h)
    return linear(ep["fc1"], e) + linear(ep["fc2"], h)


def eagle_layers(
    ecfg: EagleConfig,
    ep: dict,
    x,  # (T, H) fc output
    positions,  # (T,) int32
    kv: KVCache,
    rope,
    prior,  # attention history boundary
    write_at,  # KV write offset
    tree_mask=None,
    attn_impl: str = "auto",
    kv_span=None,  # static span bucket (models/llama.py kv_span semantics)
):
    """Draft decoder layers over the draft KV; returns (hidden, new kv).

    Residual chain matches the base model (scan over stacked layers); the
    final hidden is the full residual stream (no final norm — the reference
    applies lm_head directly to it, eagle.cuh:447,467)."""
    m = ecfg.model
    rope_cos, rope_sin = rope
    # attention_block takes pre-sliced rope rows (layer-invariant gather)
    rope_cos = rope_cos[positions]
    rope_sin = rope_sin[positions]
    L = ep["layers"]["attn_norm"].shape[0]
    idxs = jnp.arange(L, dtype=jnp.int32)
    span = kv_span if kv_span and kv_span < kv.max_length else None
    kvk, kvv = kv.k, kv.v
    if span is not None:
        kvk = jax.lax.slice_in_dim(kvk, 0, span, axis=2)
        kvv = jax.lax.slice_in_dim(kvv, 0, span, axis=2)

    def body(hidden, xs):
        p, k_c, v_c, li = xs
        normed = rms_norm(hidden, p["attn_norm"], m.rms_norm_eps)
        if not ecfg.use_attn_norm:
            normed = jnp.where(li == 0, hidden, normed)  # layer0 Skip
        attn_out, k_c, v_c = attention_block(
            m, p, normed, positions, k_c, v_c, prior,
            rope_cos, rope_sin, tree_mask, ecfg.window, 0, attn_impl,
            write_at=write_at,
        )
        hidden = hidden + attn_out * jnp.asarray(m.scale_residual, hidden.dtype)
        normed = rms_norm(hidden, p["ffn_norm"], m.rms_norm_eps)
        ffn_out = gated_ffn(p, normed)
        hidden = hidden + ffn_out * jnp.asarray(m.scale_residual, hidden.dtype)
        return hidden, (k_c, v_c)

    h, (nk, nv) = jax.lax.scan(body, x, (ep["layers"], kvk, kvv, idxs))
    if span is not None:
        nk = jax.lax.dynamic_update_slice(kv.k, nk, (0, 0, 0, 0))
        nv = jax.lax.dynamic_update_slice(kv.v, nv, (0, 0, 0, 0))
    return h, KVCache(nk, nv, kv.length)


from ..ops.topk import topk_wide  # noqa: E402  (shared chunked exact top-k;
# ~0.35 ms/round saved over lax.top_k on the 32K-wide FR head, round-3 trace)


def draft_logits(ecfg: EagleConfig, ep: dict, base_params: dict, base_cfg: ModelConfig, h):
    """Draft lm_head -> fp32 log-softmax over the (possibly FR) vocab."""
    if "lm_head" in ep:
        # FR-Spec head: plain Linear, no lm_head scale (minicpm4_eagle.cuh:101).
        # A W4 pack ({'q','s'}, ops.quant.pack_weights_padded) dispatches
        # through the quant kernel; its N padding is sliced back here so the
        # zero-logit pad columns can't win the draft top-k.
        logits = linear(ep["lm_head"], h).astype(jnp.float32)
        # slice back any pack_weights_padded N-padding regardless of
        # FR-Spec: exact-zero pad logits would otherwise be eligible to
        # win the draft top-k whenever every real logit is negative
        true_vocab = (ecfg.frspec_vocab_size
                      or ecfg.model.vocab_size)
        if logits.shape[-1] > true_vocab:
            logits = logits[..., :true_vocab]
    else:
        from ..layers.modules import lm_head

        logits = lm_head(base_params["lm_head"], h, base_cfg.scale_lmhead,
                         n_out=base_cfg.vocab_size).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1)


def _fr_to_real(ecfg: EagleConfig, ep: dict, ids):
    if "token_id_remap" in ep:
        return jnp.take(ep["token_id_remap"], ids, axis=0).astype(jnp.int32)
    return ids


# ---------------------------------------------------------------------------
# draft (tree expansion)
# ---------------------------------------------------------------------------


def eagle_draft(
    ecfg: EagleConfig,
    base_cfg: ModelConfig,
    ep: dict,
    base_params: dict,
    rope,
    ekv: KVCache,
    h_root,  # (H,) draft hidden at the root (last accepted token)
    orig,  # int32: base cache length (tree root position)
    attn_impl: str = "auto",
    kv_span=None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, KVCache]:
    """Grow the draft tree. Returns (tree_tokens (S,), tree_pos (S,),
    tree_mask (S,S) bool, tree_parent (S,), new draft kv).

    tree_tokens[0] is left as -1 — the caller fills the root (last accepted
    token), matching tree_drafter.py:185-186."""
    K = ecfg.topk_per_iter
    S = ecfg.tree_size
    NI = ecfg.num_iter
    TT = ecfg.total_tried
    m = ecfg.model
    H = m.hidden_size

    # d = 0: root expansion (eagle.cuh:445-455)
    lp0 = draft_logits(ecfg, ep, base_params, base_cfg, h_root[None])[0]
    val0, tok0 = topk_wide(lp0, K)

    tried_val = jnp.full((TT,), -jnp.inf, jnp.float32).at[:K].set(val0)
    tried_tok = jnp.zeros((TT,), jnp.int32).at[:K].set(tok0)
    # recorded tried-index of each depth>=1 frontier node (set_parent analog)
    parent_rec = jnp.zeros((max(NI - 1, 1) * K,), jnp.int32)

    frontier_tok = tok0  # FR-space ids
    frontier_val = val0
    frontier_hidden = jnp.broadcast_to(h_root, (K, H)).astype(h_root.dtype)
    # slot mask over the K*NI expansion slots; row j starts as its own slot
    emask = jnp.zeros((K, K * NI), jnp.bool_).at[jnp.arange(K), jnp.arange(K)].set(True)

    for d in range(1, NI):
        real_ids = _fr_to_real(ecfg, ep, frontier_tok)
        from ..layers.modules import embedding

        emb = embedding(base_params["embed"], real_ids, base_cfg.scale_emb,
                        m.jnp_dtype)
        x = eagle_fc(ecfg, ep, emb, frontier_hidden)
        positions = jnp.full((K,), orig + (d - 1), jnp.int32)
        h, ekv = eagle_layers(
            ecfg, ep, x, positions, ekv, rope,
            prior=orig, write_at=orig + K * (d - 1),
            tree_mask=emask[:, : K * d], attn_impl=attn_impl,
            kv_span=kv_span,
        )
        lp = draft_logits(ecfg, ep, base_params, base_cfg, h)  # (K, Vfr)
        val, tok = topk_wide(lp, K)  # (K, K)
        joint = (val + frontier_val[:, None]).reshape(-1)  # (K*K,)
        toks_flat = tok.reshape(-1)

        off = K + (d - 1) * K * K
        tried_val = jax.lax.dynamic_update_slice(tried_val, joint, (off,))
        tried_tok = jax.lax.dynamic_update_slice(tried_tok, toks_flat, (off,))

        fval, fpos = jax.lax.top_k(joint, K)  # fpos in [0, K*K)
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

    tree_tokens, tree_pos, tree_mask, tree_parent = finalize_tree(
        ecfg, ep, tried_val, tried_tok, parent_rec, orig
    )
    return tree_tokens, tree_pos, tree_mask, tree_parent, ekv


def finalize_tree(ecfg: EagleConfig, ep: dict, tried_val, tried_tok,
                  parent_rec, orig):
    """Global re-top-k over the tried pool + vectorized build_dynamic_tree
    (eagle.cuh:485, 188-222). Single-slot shapes; spec.eagle_batch vmaps it
    per slot — ONE copy of the tree-recovery semantics.

    Returns (tree_tokens (S,) with row 0 = -1 for the caller's root fill,
    tree_pos (S,), tree_mask (S, S), tree_parent (S,))."""
    K = ecfg.topk_per_iter
    S = ecfg.tree_size
    TT = ecfg.total_tried
    _, sel = jax.lax.top_k(tried_val, S - 1)  # tried indices, value-ordered

    # tree node t+1 <- tried index sel[t]; node 0 = root
    reverse = jnp.zeros((TT,), jnp.int32).at[sel].set(
        jnp.arange(1, S, dtype=jnp.int32)
    )

    def depth_of(p):
        return jnp.where(p < K, 1, (p - K) // (K * K) + 2)

    def parent_tried_of(p):
        pp = p - K
        d1 = pp // K  # depth-1 parent: its tried index == frontier row
        dn = parent_rec[jnp.clip((pp - K * K) // K, 0, parent_rec.shape[0] - 1)]
        pt = jnp.where(pp < K * K, d1, dn)
        return jnp.where(p < K, -1, pt)

    depths = depth_of(sel)  # (S-1,)
    ptried = parent_tried_of(sel)
    parents = jnp.where(ptried < 0, 0, reverse[jnp.clip(ptried, 0, TT - 1)])

    tree_parent = jnp.concatenate([jnp.zeros((1,), jnp.int32), parents])
    tree_pos = jnp.concatenate(
        [jnp.asarray(orig, jnp.int32)[None], orig + depths.astype(jnp.int32)]
    )
    from .tree import ancestor_closure

    tree_mask = ancestor_closure(tree_parent)
    tree_tokens = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), _fr_to_real(ecfg, ep, tried_tok[sel])]
    )
    return tree_tokens, tree_pos, tree_mask, tree_parent
