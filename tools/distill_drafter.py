"""Distill the EAGLE drafter from the realistic base — accept becomes an
OUTPUT of distillation, not a noise knob (VERDICT r3 task 3).

Fit: the drafter's fc1/fc2 are the exact ridge-regression optimum for the
EAGLE feature-regression objective on teacher-forced base streams
(tools/gen_distill_corpus.py):

    fc1(rms(e_{t+1})) + fc2(rms(h_t))  ≈  h_{t+1}

where ``e`` is the base token embedding (scale_emb applied) and ``h`` the
base post-final-norm hidden — exactly the drafter's runtime inputs
(engine/spec_engine.py spec_prefill_chunk: pend_embed is the chunk shifted
by one, pend_hidden the chunk's normed hiddens) and the shared FR head maps
the regression target to base logits. The drafter's single decoder layer
keeps its output-shrunk realistic init (its residual delta is small by the
same construction as the base's); real EAGLE training would also fit it,
so the ridge fit is a conservative (weaker-drafter) distillation.

Eval: depth-wise argmax agreement on a held-out self-generated stream,
with the depth-2 step fed the drafter's OWN depth-1 hidden (the rollout
feedback path). Chain accept proxy = 1 + p1 + p12 — a LOWER bound on the
engine's tree accept (the tree carries top-k alternatives per depth).
The true accept is measured by bench.py --realistic on TPU.

Run (CPU): python tools/distill_drafter.py [--corpus benchmark/.distill]
"""

import argparse
import dataclasses
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rms_np(x, eps=1e-5):
    return x / np.sqrt((x.astype(np.float32) ** 2).mean(-1, keepdims=True) + eps)


def load_corpus(path):
    z = np.load(path)
    toks = z["tokens"]  # (Ns, T)
    # hidden is stored as bf16 bit patterns (uint16); widen to f32
    hid = (z["hidden"].astype(np.uint32) << 16).view(np.float32)
    return toks, hid, float(z["layer_out_scale"])


def fit_ridge(embed, toks, hid, streams, lam_rel=1e-3):
    """Closed-form ridge for [fc1 | fc2 | bias] on pairs
    (rms(e_{t+1}), rms(h_t)) -> h_{t+1} pooled over ``streams``."""
    X_parts, Y_parts = [], []
    for s in streams:
        t = toks[s]
        h = hid[s]
        e = embed[t[1:]]  # e_{t+1} for t = 0..T-2
        X_parts.append(np.concatenate(
            [rms_np(e), rms_np(h[:-1])], axis=1))
        Y_parts.append(h[1:])
    X = np.concatenate(X_parts, 0).astype(np.float32)
    Y = np.concatenate(Y_parts, 0).astype(np.float32)
    N, F = X.shape
    Xb = np.concatenate([X, np.ones((N, 1), np.float32)], 1)
    A = (Xb.T @ Xb).astype(np.float64)
    lam = lam_rel * np.trace(A) / (F + 1)
    A[np.diag_indices_from(A)] += lam
    B = (Xb.T @ Y).astype(np.float64)
    W = np.linalg.solve(A, B).astype(np.float32)  # (2H+1, H)
    resid = Y - Xb @ W
    r2 = 1.0 - (resid ** 2).sum() / ((Y - Y.mean(0)) ** 2).sum()
    return W, float(r2), N


def drafter_pass(ecfg, ep, x_np):
    """Full-sequence causal drafter decoder pass (positions 0..T-1)."""
    import jax.numpy as jnp

    from cpmcu_tpu.cache.kv import KVCache
    from cpmcu_tpu.models import llama
    from cpmcu_tpu.spec.eagle import eagle_layers

    T = x_np.shape[0]
    Tp = (T + 127) // 128 * 128
    kv = KVCache.create(ecfg.model, Tp)
    rope = llama.make_rope(ecfg.model, Tp)
    x = jnp.asarray(x_np, ecfg.model.jnp_dtype)
    pos = jnp.arange(T, dtype=jnp.int32)
    h, _ = eagle_layers(ecfg, ep, x, pos, kv, rope,
                        prior=jnp.int32(0), write_at=jnp.int32(0))
    return np.asarray(h, np.float32)


def evaluate(cfg, ecfg, ep, embed, head_fr, toks, hid, stream):
    """Depth-wise agreement on a held-out stream; returns stats dict."""
    import jax.numpy as jnp

    from cpmcu_tpu.spec.eagle import eagle_fc

    t = toks[stream]
    h = hid[stream]
    T = len(t)
    vfr = head_fr.shape[1]

    # pass 1 (teacher-forced): input (e_{i+1}, h_i) at row i -> predicts t[i+2]
    e_in = embed[t[1:]]
    x1 = np.asarray(eagle_fc(ecfg, ep, jnp.asarray(e_in, cfg.jnp_dtype),
                             jnp.asarray(h[:-1], cfg.jnp_dtype)), np.float32)
    hd1 = drafter_pass(ecfg, ep, x1)  # (T-1, H)
    lg1 = hd1 @ head_fr  # (T-1, Vfr)
    pred1 = lg1.argmax(-1)
    tgt1 = t[2:]  # token after the embedded one
    valid = tgt1 < vfr
    hit1 = (pred1[:-1] == tgt1) & valid
    top10_1 = np.any(
        np.argpartition(-lg1[:-1], 10, axis=-1)[:, :10] == tgt1[:, None], -1
    ) & valid

    # pass 2 (rollout feedback): input (e_{i+2}, hd1_i) -> predicts t[i+3]
    e_in2 = embed[t[2:]]
    x2 = np.asarray(eagle_fc(ecfg, ep, jnp.asarray(e_in2, cfg.jnp_dtype),
                             jnp.asarray(hd1[:-1], cfg.jnp_dtype)), np.float32)
    hd2 = drafter_pass(ecfg, ep, x2)
    lg2 = hd2 @ head_fr
    pred2 = lg2.argmax(-1)
    tgt2 = t[3:]
    hit2 = (pred2[:-1] == tgt2) & (tgt2 < vfr)

    n = len(tgt2)
    p1 = float(hit1[:n].mean())
    p12 = float((hit1[:n] & hit2).mean())
    return {
        "p1_top1": round(p1, 4),
        "p1_top10": round(float(top10_1[:n].mean()), 4),
        "p12_chain": round(p12, 4),
        "chain_accept_proxy": round(1.0 + p1 + p12, 3),
        "fr_coverage": round(float((t[2:] < vfr).mean()), 4),
        "eval_positions": n,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=os.path.join(REPO, "benchmark",
                                                     ".distill"))
    ap.add_argument("--lam", type=float, default=1e-3)
    ap.add_argument("--eval-stream", type=int, default=-1,
                    help="held-out stream index (default: last)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from cpmcu_tpu.core.config import MINICPM4_8B
    from cpmcu_tpu.models.realistic import (_head_np,
                                            init_eagle_params_realistic,
                                            params_cache_key)
    from cpmcu_tpu.spec.eagle import EagleConfig

    cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True)

    # base embedding table from the realistic cache (any layer_out_scale
    # shares embed: it is generated from scale/seed only)
    cache_files = sorted(glob.glob(os.path.join(REPO, ".realistic_cache",
                                                "real_*.npz")))
    assert cache_files, "run bench --realistic (or the warm script) first"
    z = np.load(cache_files[0])
    embed = (z["embed|bf16"].astype(np.uint32) << 16).view(np.float32)
    embed = embed * cfg.scale_emb  # layers/modules.embedding applies scale

    vfr = 32768
    head_fr = _head_np(0, cfg, vfr, 0.02)[:, :vfr].astype(np.float32)

    draft_cfg = dataclasses.replace(cfg, num_layers=1, quant=False,
                                    quant_lmhead=False)
    ecfg = EagleConfig(model=draft_cfg, num_iter=2, topk_per_iter=10,
                       tree_size=12, window=1024, use_input_norm=True,
                       use_attn_norm=True, frspec_vocab_size=vfr)

    H = cfg.hidden_size
    paths = [p for p in sorted(glob.glob(
        os.path.join(args.corpus, "corpus_*.npz"))) if "_stream" not in p]
    for path in paths:
        toks, hid, scale = load_corpus(path)
        Ns = toks.shape[0]
        ev = args.eval_stream if args.eval_stream >= 0 else Ns - 1
        train = [i for i in range(Ns) if i != ev]
        W, r2, N = fit_ridge(embed, toks, hid, train, lam_rel=args.lam)

        ep = init_eagle_params_realistic(ecfg, cfg, seed=0)
        import jax.numpy as jnp

        dt = cfg.jnp_dtype
        ep["fc1"] = {"w": jnp.asarray(W[:H], dt),
                     "b": jnp.asarray(W[2 * H], dt)}
        ep["fc2"] = {"w": jnp.asarray(W[H:2 * H], dt)}

        stats = evaluate(cfg, ecfg, ep, embed, head_fr, toks, hid, ev)
        out = os.path.join(args.corpus, f"drafter_s{scale:g}.npz")
        np.savez(out, fc1_w=W[:H], fc1_b=W[2 * H], fc2_w=W[H:2 * H],
                 layer_out_scale=np.float64(scale), ridge_lambda=args.lam,
                 train_samples=N, r2=r2,
                 chain_accept_proxy=stats["chain_accept_proxy"])
        print(json.dumps({"corpus": os.path.basename(path),
                          "layer_out_scale": scale, "train_n": N,
                          "r2": round(r2, 4), **stats, "saved": out}),
              flush=True)


if __name__ == "__main__":
    main()
