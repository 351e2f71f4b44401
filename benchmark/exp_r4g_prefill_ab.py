"""Realistic 96K sparse-prefill lever A/B (VERDICT r3 task 4).

One process, ONE 94K realistic prefill, then each kernel-tuning variant
re-traces (TUNE is read at trace time; jax.clear_caches between variants)
and times the SAME un-committed 2048-token chunk at full context:

  * gs (g-split): share one visit-table union across gs-fold more query
    rows at the same MXU rows — fewer total grid steps when adjacent
    queries select overlapping blocks (realistic checkpoints; under the
    synthetic saturation it measured neutral, so it was parked at 1).
  * bt (q-tile rows): wider tiles -> fewer per-tile unions (sublinear
    union growth under correlated attention).
  * stage1 pallas: the two-pass scorer (ops/sparse_stage1.py) vs the XLA
    einsum path — parked "within noise" under synthetic saturation only.

Run: CPMCU_REALISTIC=1 timeout 2400 python benchmark/exp_r4g_prefill_ab.py
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("CPMCU_REALISTIC", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig

CTX = int(os.environ.get("R4G_CTX", 94208))
CHUNK = int(os.environ.get("R4G_CHUNK", 2048))

# r5 variant set: the r4g gs4/bt512/bt1024 rows each crashed the remote
# compile helper (HTTP 500, subprocess exit 1) within ~15 s while bt256
# variants before AND after compiled fine — the crash is specific to
# those kernel shapes. r5 drops them for (a) one retry row to confirm
# reproducibility, (b) milder gs2/bt384, and (c) the never-measured
# prefill_pair lever: pair fine 128-row sub-tiles per grid step at the
# coarse step count — at 96K the block union is ~0.3 but the 512-row
# tile union saturates ~0.9, so fine tiles cut sparse_flash tile-DMA
# bytes ~45% (the dominant 364 ms/chunk term, r4g_profile_postfix §A).
VARIANTS = [
    {"name": "base_gs1_bt256", "gs": 1, "bt": 256, "stage1": "xla"},
    {"name": "ppair2", "gs": 1, "bt": 256, "stage1": "xla", "pp": 2},
    {"name": "ppair4", "gs": 1, "bt": 256, "stage1": "xla", "pp": 4},
    {"name": "gs2_bt256", "gs": 2, "bt": 256, "stage1": "xla"},
    {"name": "gs1_bt384", "gs": 1, "bt": 384, "stage1": "xla"},
    {"name": "bt512_retry", "gs": 1, "bt": 512, "stage1": "xla"},
    {"name": "ppair4_stage1_pallas", "gs": 1, "bt": 256,
     "stage1": "pallas", "pp": 4},
    # bf16 stage-1 score temporaries: halves the HBM-bound exp/where/sum
    # passes (223 ms of the 1.03 s late chunk, r4g_profile_postfix §A)
    {"name": "stage1_bf16", "gs": 1, "bt": 256, "stage1": "xla",
     "s1dtype": "bf16"},
    {"name": "stage1_bf16_ppair4", "gs": 1, "bt": 256, "stage1": "xla",
     "s1dtype": "bf16", "pp": 4},
]


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import cpmcu_tpu.ops.sparse as SP
    from cpmcu_tpu.ops import sparse_flash as sf

    cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True,
                              apply_sparse=True)
    eng = EngineConfig(chunk_length=CHUNK, max_total_length=CTX + 4 * CHUNK)
    from bench import make_params
    from cpmcu_tpu.engine.engine import Engine

    params = make_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    engine = Engine(cfg, eng, params)
    ids = rng.integers(0, cfg.vocab_size, size=CTX).tolist()
    t0 = time.time()
    engine.prefill(ids)
    print(json.dumps({"context_prefill_s": round(time.time() - t0, 1),
                      "ctx": CTX}), flush=True)

    chunk = jnp.asarray(rng.integers(0, cfg.vocab_size, size=CHUNK),
                        jnp.int32)
    pos = jnp.asarray(np.arange(CTX, CTX + CHUNK, dtype=np.int32))

    for v in VARIANTS:
        sf.TUNE["prefill_gs"] = v["gs"]
        sf.TUNE["prefill_bt"] = v["bt"]
        sf.TUNE["prefill_pair"] = v.get("pp", 1)
        SP.STAGE1_PREFILL_IMPL = v["stage1"]
        SP.STAGE1_P_DTYPE = v.get("s1dtype", "f32")
        jax.clear_caches()
        try:
            # un-committed forwards: same chunk, same positions each rep
            # (the first rep compiles)
            t = []
            for _ in range(3):
                t1 = time.time()
                logits = engine._forward(
                    chunk, pos,
                    logits_idx=jnp.asarray(CHUNK - 1, jnp.int32),
                    logits_mode="index",
                )
                np.asarray(logits)
                t.append(time.time() - t1)
            best = min(t[1:])
            print(json.dumps({
                "variant": v["name"], "chunk_ms": round(1e3 * best, 1),
                "prefill_tok_s": round(CHUNK / best, 1),
                "compile_s": round(t[0], 1),
            }), flush=True)
        except Exception as e:  # keep later variants alive
            print(json.dumps({"variant": v["name"],
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
    sf.TUNE["prefill_gs"] = 1
    sf.TUNE["prefill_bt"] = 256
    sf.TUNE["prefill_pair"] = 1
    SP.STAGE1_PREFILL_IMPL = "xla"
    SP.STAGE1_P_DTYPE = "f32"


if __name__ == "__main__":
    main()
