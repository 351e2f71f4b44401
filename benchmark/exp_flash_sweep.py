"""Sweep flash kernel tile sizes at prefill shapes (relative timing).

Per-op microbenchmarks carry a constant non-donated-input tax on the
tunnel, so only RELATIVE ordering matters here.

Run: timeout 1800 python benchmark/exp_flash_sweep.py
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from cpmcu_tpu.ops.flash import flash_mha

T, H, D, KVH, S = 2048, 32, 128, 2, 9216
REPS = 8


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((KVH, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((KVH, S, D)), jnp.bfloat16)
    prior = jnp.asarray(S - T - 512, jnp.int32)

    results = {}
    for bqt, bk in itertools.product((16, 32, 64, 128), (256, 512, 1024)):
        try:
            out = flash_mha(q, k, v, prior, causal=True, bqt=bqt, bk=bk)
            np.asarray(out)  # compile+sync
            t0 = time.time()
            for _ in range(REPS):
                out = flash_mha(q, k, v, prior, causal=True, bqt=bqt, bk=bk)
            np.asarray(out)
            ms = (time.time() - t0) / REPS * 1e3
            results[f"bqt{bqt}-bk{bk}"] = round(ms, 2)
            print(json.dumps({f"bqt{bqt}-bk{bk}": round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({f"bqt{bqt}-bk{bk}": f"{type(e).__name__}"}),
                  flush=True)
    best = min(results, key=results.get)
    print(json.dumps({"best": best, "ms": results[best]}))


if __name__ == "__main__":
    main()
