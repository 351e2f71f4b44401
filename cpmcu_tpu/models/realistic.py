"""Correlated synthetic checkpoint: structured random weights that put the
engine in the *realistic operating regime* without a real checkpoint.

Plain random weights break two things the reference measures on real
MiniCPM4 checkpoints (reference README.md:93-105):

  * **Sparse selection saturates.** InfLLM-v2 prefill shares one stage-1
    top-k selection per query tile; with i.i.d. weights the per-row
    selections are uncorrelated and their union covers ~all KV tiles
    (PERF.md sim: corr 0 -> 192/192 tiles) — sparse prefill degenerates to
    dense-plus-overhead. Real attention concentrates on shared salient
    regions, so unions stay near the per-row top-k size.
  * **Spec accept is ~1.** An uninformed drafter never agrees with the
    base, so speculative throughput measures only round overhead; the
    reference measures ~2.5 mean accept (README.md:102).

Construction (knobs are measured, not assumed — benchmark/exp_realistic.py
prints the achieved union fraction and accept length):

  * Embeddings: ``embed[v] = A*m + sigma*n_v`` — a shared unit direction
    ``m`` plus per-token identity noise, equal energy. RMSNorm preserves
    direction, so every normed hidden is ``~m``-aligned (cos ~ 0.7).
  * ``wq`` per head: random + ``C_q * (m outer q0_h)``. Queries become
    ``gamma_t * q0_h + eps_t`` with ``gamma_t = x_t . m > 0`` (no sign
    flips); ``q_ratio`` sets |shared| / |eps| ~ how correlated the score
    rankings are across query rows.
  * ``wk`` per kv head: random + ``C_k * (g_k outer d_h)`` with ``g_k``
    orthogonal to ``m`` — key salience ``beta_s = x_s . g_k`` varies by
    token. Scores factor as ``gamma_t * (q0 . R(s) k_s)``: a
    query-INDEPENDENT salience ``b(s)`` (rope adds positional texture)
    plus a per-query part. Per-row top-k selections overlap heavily ->
    non-saturated unions, the real-checkpoint regime.
  * ``wo`` / ``w_down`` output std shrunk to ``layer_out_scale`` per dim:
    the residual stream stays embedding-dominated, so base logits are
    approximately a deterministic map of the current token (a "mostly
    Markovian" model — how much the 32 layers perturb it is the drafter
    difficulty). The lm_head is random with columns orthogonal to ``m``
    (the shared direction must not bias the argmax), so generation wanders
    a pseudo-random token graph instead of repeating one token.
  * FR-Spec realism: lm_head columns for ids >= ``fr_vocab`` are
    attenuated, so the base argmax lands inside the frequency-ranked
    sub-vocabulary almost always (real FR-Spec covers ~98% of decoded
    tokens, reference scripts/gen_fr_index).
  * Drafter (``init_eagle_params_realistic``): ``fc1 ~ I`` on the
    embedding input, small fc2 / decoder layers, lm_head SHARED with the
    base (sliced to the FR sub-vocab). Depth-1 drafts see the same
    embedding the base will see, so agreement is high but imperfect (the
    base adds its attention/FFN delta); ``drafter_noise`` dials the
    per-step agreement p, giving mean accepts strictly between 1 and
    num_iter+1.

Everything is deterministic in ``seed`` (independent named substreams, so
the drafter can re-derive the shared head without replaying the 4 GB of
layer draws) and generated layer-by-layer in numpy.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.config import ModelConfig
from ..ops.quant import GROUP_SIZE, SCALE_DTYPE, pack_rows, quantize_np

# substream tags (SeedSequence([seed, TAG]))
_T_M, _T_GK, _T_EMBED, _T_LAYERS, _T_HEAD = 0, 1, 2, 3, 4


def _rng(seed: int, tag: int):
    return np.random.default_rng(np.random.SeedSequence([seed, tag]))


def _unit(rng, n):
    v = rng.standard_normal(n).astype(np.float32)
    return v / np.linalg.norm(v)


def _shared_dirs(seed: int, H: int):
    m = _unit(_rng(seed, _T_M), H)
    g = _rng(seed, _T_GK).standard_normal(H).astype(np.float32)
    g -= (g @ m) * m
    return m, g / np.linalg.norm(g)


def _head_np(seed: int, cfg: ModelConfig, fr_vocab: int, scale: float):
    H, V = cfg.hidden_size, cfg.vocab_size
    m, _ = _shared_dirs(seed, H)
    head = _rng(seed, _T_HEAD).standard_normal((H, V)).astype(np.float32)
    head *= scale
    head -= np.outer(m, m @ head)
    if 0 < fr_vocab < V:
        head[:, fr_vocab:] *= 0.5
    return head


def _slow_rope_mask(D: int, slow_frac: float) -> np.ndarray:
    """Boolean (D,) mask of the slowest-rotating rope dims: the
    non-interleaved half-rotate pairs (i, i+D/2) with the largest freq
    index i (inv_freq = theta^{-2i/D} — layers/rotary.py). The structured
    attention directions live here so positional rotation does not scramble
    the shared salience ranking within a query tile (real checkpoints
    likewise carry long-range semantic attention in the slow channels)."""
    half = D // 2
    i0 = int(np.ceil(half * (1.0 - slow_frac)))
    mask = np.zeros(D, np.bool_)
    mask[i0:half] = True
    mask[half + i0:] = True
    return mask


def _structured_proj(rng, H, N, D, g, C, base, slow_mask=None):
    """(H, N) = base * randn + C * (g outer unit_d) per D-wide head block;
    ``unit_d`` supported on ``slow_mask`` dims when given."""
    W = rng.standard_normal((H, N)).astype(np.float32) * base
    for h in range(N // D):
        d = rng.standard_normal(D).astype(np.float32)
        if slow_mask is not None:
            d = np.where(slow_mask, d, 0.0)
        d /= np.linalg.norm(d)
        W[:, h * D:(h + 1) * D] += np.outer(g, d) * C
    return W


def _quant_or_dense(w, quant: bool):
    if not quant:
        return {"w": w}
    q4, s = quantize_np(w, GROUP_SIZE)
    return {"q": pack_rows(q4), "s": s}


def init_params_realistic(
    cfg: ModelConfig,
    seed: int = 0,
    *,
    q_ratio: float = 12.0,  # |shared q| / |per-token q| (score-rank corr)
    k_ratio: float = 1.5,  # |salience k| / |random k| (b(s) peakedness)
    qk_scale: float = 0.35,  # overall q/k magnitude (keeps logits O(10))
    slow_frac: float = 0.4,  # structured dirs live in the slowest rope dims
    layer_out_scale: float = 0.05,  # TOTAL layer-delta energy relative to
    # the embedding identity signal (summed over all layers' attn+ffn
    # residual contributions) — the base-vs-drafter logit decorrelation
    fr_vocab: int = 32768,
    scale: float = 0.02,
) -> dict:
    """Structured synthetic checkpoint (see module docstring). Same pytree
    layout as llama.init_params / quantize.init_params_quant (stacked
    per-layer leaves; W4A16 packs when cfg.quant)."""
    L, H, I, V = (cfg.num_layers, cfg.hidden_size, cfg.intermediate_size,
                  cfg.vocab_size)
    Hq, Hkv, D = cfg.q_size, cfg.kv_size, cfg.head_dim
    dt = cfg.jnp_dtype
    m, g_k = _shared_dirs(seed, H)

    embed = _rng(seed, _T_EMBED).standard_normal((V, H)).astype(np.float32)
    embed *= scale
    embed += m[None, :] * (scale * np.sqrt(H))  # shared ~ |noise| energy

    # normed hidden x: ||x|| = sqrt(H), cos(x, m) ~ 0.7 =>
    #   x.m ~ 0.7*sqrt(H)   (coherent, positive)
    #   x.g_k ~ N(0, 0.7^2) (incoherent, sign-varying salience)
    base_qk = scale * qk_scale
    rand_norm = base_qk * np.sqrt(H * D)  # |random-part q or k|
    C_q = q_ratio * rand_norm / (0.7 * np.sqrt(H))
    C_k = k_ratio * rand_norm / 0.7

    rng_l = _rng(seed, _T_LAYERS)
    slow = _slow_rope_mask(D, slow_frac)

    # per-layer output std so that the TOTAL residual delta (2L sublayer
    # contributions, each scaled by cfg.scale_residual, incoherent sum) is
    # ``layer_out_scale`` x the embedding identity signal (per-dim ``scale``):
    #   delta = layer_out_scale*scale / (scale_residual*sqrt(2L))
    # wo input: attn mix of v rows, per-dim std ~ scale*sqrt(H);
    # w_down input: silu(g)*u with per-dim std ~ c_f*scale^2*H (c_f ~ 0.8)
    delta = layer_out_scale * scale / (cfg.scale_residual * np.sqrt(2 * L))
    wo_std = delta / (scale * np.sqrt(H) * np.sqrt(Hq))
    wd_std = delta / (0.8 * scale * scale * H * np.sqrt(I))

    def layer_mats():
        wq = _structured_proj(rng_l, H, Hq, D, m, C_q, base_qk, slow)
        wk = _structured_proj(rng_l, H, Hkv, D, g_k, C_k, base_qk, slow)
        wv = rng_l.standard_normal((H, Hkv)).astype(np.float32) * scale
        wo = rng_l.standard_normal((Hq, H)).astype(np.float32) * wo_std
        wg = rng_l.standard_normal((H, I)).astype(np.float32) * scale
        wu = rng_l.standard_normal((H, I)).astype(np.float32) * scale
        wd = rng_l.standard_normal((I, H)).astype(np.float32) * wd_std
        return wq, wk, wv, wo, wg, wu, wd

    names = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
    acc = {n: [] for n in names}
    for _ in range(L):
        for n, w in zip(names, layer_mats()):
            acc[n].append(_quant_or_dense(w, cfg.quant))

    def stack(name):
        leaves = acc[name]
        out = {}
        for k in leaves[0]:
            arr = np.stack([p[k] for p in leaves])
            if k == "q":
                out[k] = jnp.asarray(arr)  # int32 packs
            elif k == "s":
                out[k] = jnp.asarray(arr, SCALE_DTYPE)
            else:
                out[k] = jnp.asarray(arr, dt)
        return out

    layers = {n: stack(n) for n in names}
    layers["attn_norm"] = jnp.ones((L, H), dt)
    layers["ffn_norm"] = jnp.ones((L, H), dt)
    if cfg.use_qk_norm:
        layers["q_norm"] = jnp.ones((L, D), dt)
        layers["k_norm"] = jnp.ones((L, D), dt)

    head = _head_np(seed, cfg, fr_vocab, scale)
    params = {
        "embed": jnp.asarray(embed, dt),
        "layers": layers,
        "final_norm": jnp.ones((H,), dt),
    }
    if cfg.quant and cfg.quant_lmhead:
        from ..ops.quant import pack_weights_padded

        params["lm_head"] = pack_weights_padded(head)
    else:
        params["lm_head"] = {"w": jnp.asarray(head, dt)}
    return params


def init_eagle_params_realistic(
    ecfg,
    cfg: ModelConfig,
    seed: int = 0,
    *,
    drafter_noise: float = 0.35,
    fr_vocab: int = 32768,
    scale: float = 0.02,
    quant_head: bool = False,  # W4 FR head (268 MB bf16 -> 67 MB, read
    # num_iter x/round; the int4 step only perturbs DRAFT quality —
    # verification keeps generation lossless)
) -> dict:
    """Drafter 'distilled' from the realistic base: fc1 ~ identity on the
    embedding input (+- drafter_noise), small fc2 / decoder layers, and the
    BASE's lm_head sliced to the FR sub-vocabulary. Per-step agreement with
    the base argmax (hence mean accept) falls as drafter_noise grows."""
    import jax

    from ..spec.eagle import init_eagle_params

    m = ecfg.model
    H = m.hidden_size
    dt = m.jnp_dtype
    rng = _rng(seed, 1001)

    p = init_eagle_params(ecfg, jax.random.PRNGKey(seed + 202), scale=scale)
    # the drafter's decoder layers must be output-shrunk like the base's —
    # a plain random layer's O(1) contributions drown the embedding signal
    # the head reads (accept would collapse back to ~1)
    p["layers"] = init_params_realistic(m, seed + 1)["layers"]
    fc1 = np.eye(H, dtype=np.float32)
    fc1 += rng.standard_normal((H, H)).astype(np.float32) * (
        drafter_noise / np.sqrt(H))
    p["fc1"] = {"w": jnp.asarray(fc1, dt), "b": jnp.zeros((H,), dt)}
    # fc2 reads the base hidden (||h|| ~ sqrt(H) after final norm); keep its
    # per-dim output well under the embedding identity signal (~scale) or
    # it drowns the drafter's prediction
    p["fc2"] = {"w": jnp.asarray(
        rng.standard_normal((H, H)).astype(np.float32)
        * (0.1 * scale / np.sqrt(H)), dt)}

    head = _head_np(seed, cfg, fr_vocab, scale)
    vfr = ecfg.frspec_vocab_size or 0
    hw = head[:, :vfr] if vfr else head
    if quant_head:
        from ..ops.quant import pack_weights_padded

        p["lm_head"] = pack_weights_padded(hw)
    else:
        p["lm_head"] = {"w": jnp.asarray(hw, dt)}
    if vfr:
        p["token_id_remap"] = jnp.arange(vfr, dtype=jnp.int32)
    return p


def init_eagle_params_distilled(
    ecfg,
    cfg: ModelConfig,
    npz_path: str,
    seed: int = 0,
    *,
    quant_head: bool = False,
) -> dict:
    """Drafter whose fc1/fc2 are the ridge-regression distillation optimum
    fitted on teacher-forced base streams (tools/distill_drafter.py) — the
    accept length is then an OUTPUT of distillation, with no noise knob
    (VERDICT r3 task 3). Everything else (output-shrunk decoder layer,
    shared FR head) matches init_eagle_params_realistic."""
    import jax.numpy as jnp  # noqa: F811  (module-level import exists)

    p = init_eagle_params_realistic(ecfg, cfg, seed=seed,
                                    quant_head=quant_head)
    z = np.load(npz_path)
    dt = ecfg.model.jnp_dtype
    p["fc1"] = {"w": jnp.asarray(z["fc1_w"], dt),
                "b": jnp.asarray(z["fc1_b"], dt)}
    p["fc2"] = {"w": jnp.asarray(z["fc2_w"], dt)}
    return p


# ---------------------------------------------------------------------------
# disk cache: the 8B takes ~4 min of numpy generation+quantization — too
# long inside the driver's bench timeout. Leaves are stored flat (path ->
# array) with bf16 viewed as uint16 (np.save round-trips ml_dtypes
# unreliably); cache key = model dims + generator knobs.
# ---------------------------------------------------------------------------

_CACHE_VERSION = 1


def _flatten(prefix, tree, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}.{k}" if prefix else k, v, out)
    else:
        out[prefix] = tree
    return out


def params_cache_key(cfg, seed, **knobs):
    import hashlib
    import inspect
    import json

    # resolve the FULL knob set (generator defaults merged under explicit
    # overrides) so editing a default in init_params_realistic invalidates
    # the cache without a manual _CACHE_VERSION bump (ADVICE r3)
    sig = inspect.signature(init_params_realistic)
    defaults = {n: p.default for n, p in sig.parameters.items()
                if p.default is not inspect.Parameter.empty
                and n != "seed"}  # seed is hashed explicitly below
    knobs = {**defaults, **knobs}
    desc = dict(v=_CACHE_VERSION, seed=seed, quant=cfg.quant,
                quant_lmhead=cfg.quant_lmhead, L=cfg.num_layers,
                H=cfg.hidden_size, I=cfg.intermediate_size,
                V=cfg.vocab_size, heads=cfg.num_heads, kv=cfg.num_kv_heads,
                D=cfg.head_dim, dtype=cfg.dtype, **knobs)
    return hashlib.sha1(json.dumps(desc, sort_keys=True).encode()).hexdigest()[:16]


def init_params_realistic_cached(cfg, seed: int = 0, cache_dir: str = "",
                                 **knobs) -> dict:
    """init_params_realistic with a flat-npz disk cache (see above)."""
    import os

    import jax

    if not cache_dir:
        return init_params_realistic(cfg, seed, **knobs)
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir,
                        f"real_{params_cache_key(cfg, seed, **knobs)}.npz")
    if os.path.exists(path):
        z = np.load(path)
        params: dict = {}
        for key in z.files:
            arr = z[key]
            pth, tag = key.rsplit("|", 1)
            if tag == "bf16":
                arr = arr.view(jnp.bfloat16.dtype)
            node = params
            parts = pth.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(arr)
        return params

    params = init_params_realistic(cfg, seed, **knobs)
    flat = _flatten("", params, {})
    save = {}
    for k, v in flat.items():
        arr = np.asarray(v)
        if arr.dtype == jnp.bfloat16.dtype:
            save[f"{k}|bf16"] = arr.view(np.uint16)
        else:
            save[f"{k}|raw"] = arr
    tmp = path + ".tmp.npz"
    np.savez(tmp, **save)
    os.replace(tmp, path)
    return params
