"""Ablate the InfLLM-v2 decode pipeline at 96K context.

Round 2 of the ablation: round 1 showed stage1/pool/topk are ~free and the
base-floor gap (~2.4ms) is tile DMA in the attention kernel. This round
dissects the 34ms floor itself: sparse commit, visit-table prologue, and
the sparse-kernel structure vs a dense span kernel.

Each variant patches module attrs and re-jits with a fresh function object
plus jax.clear_caches() (the global pjit cache is keyed on the wrapped
function object — without this every variant replays the first executable).

Run on the real chip:  timeout 4500 python benchmark/exp_sparse_ablate.py
"""

import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import cpmcu_tpu.cache.sparse_kv as skv_mod
import cpmcu_tpu.ops.sparse as sparse_mod
import cpmcu_tpu.ops.sparse_flash as sf_mod
from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig
from cpmcu_tpu.engine.engine import Engine, decode_segment

PROMPT = 96 * 1024
SEG = 8
WARM_SEGS = 1
TIMED_SEGS = 4

REAL = {
    "stage1": sparse_mod.stage1_scores,
    "select": sparse_mod.select_blocks,
    "commit": skv_mod.commit,
    "visit": sf_mod.build_visit_tables,
}


def zero_stage1(q, c1, c2, c1_len, c2_len, **kw):
    return jnp.zeros((c1.shape[0], q.shape[0], c1.shape[1]), jnp.float32)


def fixed_select(p, positions, history_len, *, topk, init_blocks=1, local_blocks=8):
    KVH, T, S1 = p.shape
    NB = S1 // 4
    k = min(topk, NB)
    idx = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (KVH, T, k))
    return idx, jnp.ones((KVH, T, k), jnp.bool_), jnp.zeros((KVH, T, NB), jnp.float32)


def no_commit(cache, n, max_new=1):
    return cache.with_length(cache.length + n)


def fixed_visit(topk_idx, topk_valid, positions, limit, nb, bt, *,
                local_blocks, bk=sf_mod.BK):
    KVH, T, K = topk_idx.shape
    nq = (T + bt - 1) // bt
    sub = bk // sf_mod.BLOCK
    nbk = (nb + sub - 1) // sub
    t_idx = jnp.arange(nbk, dtype=jnp.int32)
    visited = (t_idx < 11).astype(jnp.int32)
    load_idx = jnp.minimum(t_idx, 10)
    shape = (KVH, nq, nbk)
    blockvis = jnp.full((KVH, nq, bt, nbk), 255, jnp.int32)
    return (
        jnp.broadcast_to(load_idx, shape),
        jnp.broadcast_to(visited, shape),
        blockvis,
    )


# name -> (patches {key: fn}, sparse_select)
VARIANTS = {
    "base": ({}, True),
    "floor": ({"stage1": zero_stage1, "select": fixed_select}, True),
    "floor-nocommit": (
        {"stage1": zero_stage1, "select": fixed_select, "commit": no_commit},
        True,
    ),
    "floor-novisit": (
        {"stage1": zero_stage1, "select": fixed_select, "visit": fixed_visit},
        True,
    ),
    "densattn": ({}, False),  # dense flash over the full 96K span; commit on
}


def apply_patches(patches):
    sparse_mod.stage1_scores = patches.get("stage1", REAL["stage1"])
    sparse_mod.select_blocks = patches.get("select", REAL["select"])
    skv_mod.commit = patches.get("commit", REAL["commit"])
    sf_mod.build_visit_tables = patches.get("visit", REAL["visit"])


def main():
    cfg = dataclasses.replace(MINICPM4_8B, quant=True, apply_sparse=True)
    eng = EngineConfig(chunk_length=2048, max_total_length=PROMPT + 2048)
    from bench import make_params

    params = make_params(cfg, jax.random.PRNGKey(0))
    engine = Engine(cfg, eng, params)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()
    t0 = time.time()
    engine.prefill(ids)
    print(f"prefill {PROMPT} tok in {time.time() - t0:.1f}s", flush=True)

    results = {}
    pos0 = PROMPT
    for name, (patches, sparse_sel) in VARIANTS.items():
        apply_patches(patches)
        jax.clear_caches()

        def _fresh(cfg, params, rope, cache, token, pos, key, **kw):
            return decode_segment.__wrapped__(
                cfg, params, rope, cache, token, pos, key, **kw
            )

        ds = jax.jit(
            _fresh,
            static_argnames=(
                "cfg", "k", "temperature", "top_k", "top_p", "attn_impl",
                "sparse_select", "kv_span", "unroll",
            ),
            donate_argnames=("cache",),
        )

        def run(nsegs, tok, pos):
            for _ in range(nsegs):
                engine.cache, toks, engine.key = ds(
                    cfg, engine.params, engine.rope, engine.cache, tok, pos,
                    engine.key, k=SEG, temperature=0.0, top_k=0, top_p=1.0,
                    attn_impl=engine.attn_impl, sparse_select=sparse_sel,
                    kv_span=None, unroll=True,
                )
                tok = toks[-1]
                pos = pos + SEG
                engine.host_len += SEG
            np.asarray(toks)  # tunnel-safe sync
            return tok, pos

        tok = jnp.asarray(1, jnp.int32)
        pos = jnp.asarray(pos0, jnp.int32)
        tc = time.time()
        tok, pos = run(WARM_SEGS, tok, pos)
        compile_s = time.time() - tc
        t0 = time.time()
        tok, pos = run(TIMED_SEGS, tok, pos)
        dt = time.time() - t0
        pos0 += (WARM_SEGS + TIMED_SEGS) * SEG
        toks_done = TIMED_SEGS * SEG
        results[name] = dict(tok_s=round(toks_done / dt, 2),
                             ms_per_tok=round(1e3 * dt / toks_done, 2),
                             compile_s=round(compile_s, 1))
        print(json.dumps({name: results[name]}), flush=True)

    apply_patches({})
    print(json.dumps(results))


if __name__ == "__main__":
    main()
