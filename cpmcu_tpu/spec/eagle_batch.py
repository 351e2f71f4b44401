"""Batched EAGLE-2: per-slot tree drafting over continuous-batching arenas.

The lockstep analog of spec.eagle for the batch scheduler: every active
slot grows its own draft tree (same fixed-shape expansion as eagle_draft —
reference src/model/eagle.cuh:430-492), with all slots' drafter math fused
into M = B*K-row matmuls and the drafter's history attention running
through the slot-indexed flash kernel (ops.flash.flash_mha_slots, per-slot
history limits). The expansion region (K rows per depth) is carried in
registers and LSE-merged — it never round-trips the drafter arena, which
only persists each round's catch-up rows (next round's history).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from .eagle import (
    EagleConfig, _fr_to_real, draft_logits, eagle_fc, finalize_tree,
)


def eagle_batch_layers(
    ecfg: EagleConfig,
    ep: dict,
    x: jax.Array,  # (B, T, H) fc output rows
    positions: jax.Array,  # (B, T) absolute positions
    dk: jax.Array,  # (B, Ld, KVH, S, D) drafter slot arena
    dv: jax.Array,
    prior: jax.Array,  # (B,) per-slot drafter history limit
    rope,
    *,
    mask: jax.Array,  # (B, T, Tm0+T) visibility over [region rows, own rows]
    region: Optional[Tuple[jax.Array, jax.Array]] = None,  # carried
    # expansion rows ((B, Ld, KVH, Tm0, D) k, v); None => Tm0 == 0
    attn_impl: str,
):
    """Draft decoder layers, batched over slots. Returns (hidden (B, T, H),
    own_k, own_v (B, Ld, KVH, T, D) — this call's projected rows, for the
    caller to carry (expansion) or persist (catch-up). The arena is read
    in place (slot/layer-indexed); never written here."""
    import math

    from ..layers.modules import gated_ffn, linear, rms_norm
    from ..layers.rotary import apply_rope
    from ..ops.flash import flash_mha_slots, merge_attn

    m = ecfg.model
    B, T, Hid = x.shape
    KVH, G, D = m.num_kv_heads, m.num_heads // m.num_kv_heads, m.head_dim
    H = m.num_heads
    scale = 1.0 / math.sqrt(D)
    rope_cos, rope_sin = rope
    rc = rope_cos[positions].reshape(B * T, -1)
    rs = rope_sin[positions].reshape(B * T, -1)
    lp = ep["layers"]
    Ld = lp["attn_norm"].shape[0]
    res = jnp.asarray(m.scale_residual, x.dtype)
    h = x.reshape(B * T, Hid)
    Tm0 = 0 if region is None else region[0].shape[3]
    ks_own, vs_own = [], []

    for li in range(Ld):
        skip_norm = li == 0 and not ecfg.use_attn_norm
        nrm = None if skip_norm else (lp["attn_norm"][li], m.rms_norm_eps)
        if "wqkv" in lp:
            qkv = linear(lp["wqkv"], h, li, norm=nrm)
            q = qkv[:, : m.q_size].reshape(B * T, H, D)
            k = qkv[:, m.q_size : m.q_size + m.kv_size].reshape(B * T, KVH, D)
            v = qkv[:, m.q_size + m.kv_size :].reshape(B * T, KVH, D)
        else:
            q = linear(lp["wq"], h, li, norm=nrm).reshape(B * T, H, D)
            k = linear(lp["wk"], h, li, norm=nrm).reshape(B * T, KVH, D)
            v = linear(lp["wv"], h, li, norm=nrm).reshape(B * T, KVH, D)
        if m.use_qk_norm:
            q = rms_norm(q, lp["q_norm"][li], m.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"][li], m.rms_norm_eps)
        q, k = apply_rope(q, k, rc, rs)
        qb = q.reshape(B, T, H, D)
        kb = k.reshape(B, T, KVH, D)
        vb = v.reshape(B, T, KVH, D)

        # committed history via the slot kernel (per-slot limits)
        q_fold = (
            qb.reshape(B, T, KVH, G, D)
            .transpose(0, 2, 1, 3, 4)
            .reshape(B, KVH * T * G, D)
        )
        if attn_impl in ("flash", "auto") and (
            attn_impl == "flash" or jax.default_backend() == "tpu"
        ):
            out_h, lse_h = flash_mha_slots(
                q_fold, dk, dv, prior, layer=li, scale=scale
            )
        else:
            from ..ops.attention import mha_xla

            def hist(qs, ks, vs, lb):
                o, l = mha_xla(
                    qs[None], ks[li], vs[li], lb,
                    jnp.zeros((1, 1), jnp.bool_), None, return_lse=True,
                )
                return o[0], l[:, 0]

            out_h, lse_h = jax.vmap(hist)(q_fold, dk, dv, prior)
        out_h = (
            out_h.reshape(B, KVH, T, G, D).transpose(0, 2, 1, 3, 4)
            .reshape(B, T, H, D)
        )
        lse_h = (
            lse_h.reshape(B, KVH, T, G).transpose(0, 2, 1, 3).reshape(B, T, H)
        )

        # masked block over [carried region, own rows]
        if region is not None:
            reg_k = jnp.concatenate(
                [region[0][:, li].transpose(0, 2, 1, 3), kb], axis=1
            )  # (B, Tm0+T, KVH, D)
            reg_v = jnp.concatenate(
                [region[1][:, li].transpose(0, 2, 1, 3), vb], axis=1
            )
        else:
            reg_k, reg_v = kb, vb
        qf = qb.reshape(B, T, KVH, G, D).astype(jnp.float32)
        sc = jnp.einsum(
            "btkgd,bskd->bkgts", qf, reg_k.astype(jnp.float32)
        ) * scale  # (B, KVH, G, T, Tm0+T)
        sc = jnp.where(mask[:, None, None], sc, float("-inf"))
        mx = jnp.max(sc, axis=-1, keepdims=True)
        mx = jnp.maximum(mx, -1e30)  # rows with nothing visible stay finite
        e = jnp.exp(sc - mx)
        den = jnp.sum(e, axis=-1, keepdims=True)
        den_safe = jnp.where(den == 0.0, 1.0, den)
        out_c = jnp.einsum(
            "bkgts,bskd->btkgd", e / den_safe, reg_v.astype(jnp.float32)
        ).reshape(B, T, H, D)
        lse_c = jnp.where(
            den == 0.0, float("-inf"), mx + jnp.log(den_safe)
        ).squeeze(-1).transpose(0, 3, 1, 2).reshape(B, T, H)
        out = merge_attn(
            out_h.astype(jnp.float32), lse_h, out_c, lse_c
        ).astype(h.dtype)

        attn = linear(lp["wo"], out.reshape(B * T, m.q_size), li)
        h = h + attn * res
        nrm_f = (lp["ffn_norm"][li], m.rms_norm_eps)
        h = h + gated_ffn(lp, h, layer=li, norm=nrm_f) * res
        ks_own.append(kb)
        vs_own.append(vb)

    own_k = jnp.stack(ks_own, axis=1).transpose(0, 1, 3, 2, 4)
    own_v = jnp.stack(vs_own, axis=1).transpose(0, 1, 3, 2, 4)
    # no final norm: the draft lm_head reads the raw residual stream
    # (eagle.cuh:447,467)
    return h.reshape(B, T, Hid), own_k, own_v


# the tree build is shared with the single-sequence path: ONE copy of the
# reference's build_dynamic_tree semantics (spec.eagle.finalize_tree)


def eagle_batch_draft(
    ecfg: EagleConfig,
    base_cfg: ModelConfig,
    ep: dict,
    base_params: dict,
    rope,
    dk: jax.Array,  # (B, Ld, KVH, S, D) drafter arena (catch-up rows in)
    dv: jax.Array,
    h_root: jax.Array,  # (B, H) draft hidden at each slot's root
    orig: jax.Array,  # (B,) base lengths (per-slot tree root position)
    *,
    attn_impl: str,
):
    """Grow every slot's draft tree in lockstep. Returns per-slot
    (tree_tokens (B, S) with row 0 = -1 for the caller's root fill,
    tree_pos (B, S), tree_mask (B, S, S), tree_parent (B, S))."""
    from ..layers.modules import embedding

    K = ecfg.topk_per_iter
    S = ecfg.tree_size
    NI = ecfg.num_iter
    TT = ecfg.total_tried
    m = ecfg.model
    B, H = h_root.shape
    KVH, D = m.num_kv_heads, m.head_dim
    Ld = ep["layers"]["attn_norm"].shape[0]

    lp0 = draft_logits(ecfg, ep, base_params, base_cfg, h_root)  # (B, Vfr)
    from .eagle import topk_wide
    val0, tok0 = topk_wide(lp0, K)  # (B, K)

    tried_val = jnp.full((B, TT), -jnp.inf, jnp.float32).at[:, :K].set(val0)
    tried_tok = jnp.zeros((B, TT), jnp.int32).at[:, :K].set(tok0)
    parent_rec = jnp.zeros((B, max(NI - 1, 1) * K), jnp.int32)

    frontier_tok = tok0
    frontier_val = val0
    frontier_hidden = jnp.broadcast_to(h_root[:, None], (B, K, H))
    emask = jnp.zeros((B, K, K * NI), jnp.bool_).at[
        :, jnp.arange(K), jnp.arange(K)
    ].set(True)
    carry_k = jnp.zeros((B, Ld, KVH, K * NI, D), m.jnp_dtype)
    carry_v = jnp.zeros_like(carry_k)

    for d in range(1, NI):
        real_ids = _fr_to_real(ecfg, ep, frontier_tok)  # (B, K)
        emb = embedding(
            base_params["embed"], real_ids.reshape(-1), base_cfg.scale_emb,
            m.jnp_dtype,
        ).reshape(B, K, H)
        x = eagle_fc(ecfg, ep, emb, frontier_hidden)
        positions = jnp.broadcast_to(
            (orig + (d - 1))[:, None], (B, K)
        ).astype(jnp.int32)
        region = (
            (carry_k[:, :, :, : K * (d - 1)], carry_v[:, :, :, : K * (d - 1)])
            if d > 1 else None
        )
        h, own_k, own_v = eagle_batch_layers(
            ecfg, ep, x, positions, dk, dv, orig, rope,
            mask=emask[:, :, : K * d], region=region, attn_impl=attn_impl,
        )
        carry_k = jax.lax.dynamic_update_slice(
            carry_k, own_k, (0, 0, 0, K * (d - 1), 0)
        )
        carry_v = jax.lax.dynamic_update_slice(
            carry_v, own_v, (0, 0, 0, K * (d - 1), 0)
        )
        lp = draft_logits(
            ecfg, ep, base_params, base_cfg, h.reshape(B * K, H)
        ).reshape(B, K, -1)
        val, tok = topk_wide(lp, K)  # (B, K, K)
        joint = (val + frontier_val[..., None]).reshape(B, K * K)
        toks_flat = tok.reshape(B, K * K)
        off = K + (d - 1) * K * K
        tried_val = tried_val.at[:, off : off + K * K].set(joint)
        tried_tok = tried_tok.at[:, off : off + K * K].set(toks_flat)

        fval, fpos = jax.lax.top_k(joint, K)  # (B, K)
        parent_rec = parent_rec.at[:, (d - 1) * K : d * K].set(fpos + off)
        parent_row = fpos // K  # (B, K)
        new_emask = jnp.take_along_axis(
            emask, parent_row[..., None], axis=1
        )
        new_emask = new_emask.at[:, jnp.arange(K), K * d + jnp.arange(K)].set(
            True
        )
        emask = new_emask
        frontier_hidden = jnp.take_along_axis(h, parent_row[..., None], axis=1)
        frontier_tok = jnp.take_along_axis(toks_flat, fpos, axis=1)
        frontier_val = fval

    fin = functools.partial(finalize_tree, ecfg, ep)
    return jax.vmap(fin)(tried_val, tried_tok, parent_rec, orig)
