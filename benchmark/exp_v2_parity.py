"""Device parity check of the v2 quant pack (pltpu.bitcast semantics).

Run: timeout 600 python benchmark/exp_v2_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from cpmcu_tpu.ops.quant import dequantize, pack_weights, quant_matmul_pallas


def main():
    rng = np.random.default_rng(7)
    for (M, K, N) in [(1, 1024, 512), (8, 4096, 1024), (256, 2048, 512)]:
        w = rng.standard_normal((K, N)).astype(np.float32)
        x = jnp.asarray(
            rng.standard_normal((M, K)).astype(np.float32), jnp.bfloat16
        )
        pack = pack_weights(w)
        out = quant_matmul_pallas(x, pack["q"], pack["s"], interpret=False)
        itp = quant_matmul_pallas(x, pack["q"], pack["s"], interpret=True)
        # oracle IN NUMPY (a jnp f32 matmul on TPU runs at default low
        # matmul precision). The decode kernel never rounds weights to
        # bf16 -> f32 oracle; the prefill kernel (M>64) dequantizes to a
        # bf16 scratch -> bf16-weight oracle.
        deq_dtype = jnp.float32 if M <= 64 else jnp.bfloat16
        ref = np.asarray(x, np.float32) @ np.asarray(
            dequantize(pack["q"], pack["s"], dtype=deq_dtype), np.float32
        )
        o, r = np.asarray(out, np.float32), ref
        # device must equal the interpret kernel exactly (bitcast semantics)
        assert np.array_equal(o, np.asarray(itp, np.float32)), "dev != interpret"
        rel = np.abs(o - r) / (np.abs(r) + 1.0)
        print(f"M={M} K={K} N={N} max_rel={rel.max():.4f}", flush=True)
        assert rel.max() < 0.05, "v2 pack device parity FAILED"
    # stacked layer mode
    L, K, N = 3, 2048, 512
    qs = [pack_weights(rng.standard_normal((K, N)).astype(np.float32))
          for _ in range(L)]
    q = jnp.stack([p["q"] for p in qs])
    s = jnp.stack([p["s"] for p in qs])
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32), jnp.bfloat16)
    for li in range(L):
        out = quant_matmul_pallas(x, q, s, layer=li, interpret=False)
        ref = np.asarray(x, np.float32) @ np.asarray(
            dequantize(qs[li]["q"], qs[li]["s"]), np.float32
        )
        o, r = np.asarray(out, np.float32), ref
        rel = np.abs(o - r) / (np.abs(r) + 1.0)
        print(f"layer={li} max_rel={rel.max():.4f}", flush=True)
        assert rel.max() < 0.05, "layer-mode parity FAILED"
    print("v2 device parity OK")


if __name__ == "__main__":
    main()
