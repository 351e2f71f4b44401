"""TPU lowering smoke test for the sparse kernels (fast fail-finder).

CPU tests run Pallas in interpret mode, which skips Mosaic's lowering
constraints (last-two-dims block rules, unimplemented primitives, ...).
This script compiles + runs every sparse_flash entry shape the benches
use, on the real chip, in a few minutes — run it after ANY sparse-kernel
edit BEFORE queueing bench sweeps (the r4d sweep burned 4 rows x 20 min
on two lowering errors the CPU suite could not see).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()
dev = jax.devices()[0]
print(f"backend={jax.default_backend()} dev={dev}", flush=True)
# tiny probe first (CLAUDE.md: never assume the tunnel is healthy)
x = jnp.ones((256, 256), jnp.bfloat16)
np.asarray(jax.jit(lambda a: a @ a)(x))
print(f"probe ok ({time.time() - t0:.1f}s)", flush=True)

from cpmcu_tpu.ops import sparse_flash as sf

KVH, G, D = 2, 16, 128
H = KVH * G
S = 16384
NB = S // sf.BLOCK
K = 16
rng = np.random.default_rng(0)


def mk(T, prior, k_sel):
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((KVH, S, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((KVH, S, D)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, max(prior // sf.BLOCK, 1),
                                   (KVH, T, k_sel)), jnp.int32)
    valid = jnp.ones((KVH, T, k_sel), bool)
    pos = jnp.arange(prior, prior + T, dtype=jnp.int32)
    return q, kc, vc, idx, valid, pos


def run(name, **kw):
    t = time.time()
    T = kw.pop("T")
    prior = kw.pop("prior")
    q, kc, vc, idx, valid, pos = mk(T, prior, K)
    out = sf.sparse_flash_mha(
        q, kc, vc, jnp.int32(prior), idx, valid, pos,
        local_blocks=2, interpret=False, **kw)
    if isinstance(out, tuple):
        out = out[0]
    np.asarray(out)
    print(f"{name}: ok ({time.time() - t:.1f}s)", flush=True)


for pair in (1, 4):
    sf.TUNE["decode_pair"] = pair
    run(f"decode T=2 pair={pair}", T=2, prior=8192, include_new=True)
    run(f"tree T=16 pair={pair} (history+lse)", T=16, prior=8192,
        include_new=False, return_lse=True)
for tpair in (2,):
    # coarse tree pairing: pair x 512-row sub-tiles per grid step
    sf.TUNE["tree_pair"] = tpair
    run(f"tree T=16 tree_pair={tpair} (history+lse)", T=16, prior=8192,
        include_new=False, return_lse=True)
sf.TUNE["tree_pair"] = 1
for ppair in (1, 4):
    sf.TUNE["prefill_pair"] = ppair
    run(f"prefill T=2048 ppair={ppair}", T=2048, prior=4096,
        include_new=True)
sf.TUNE["prefill_pair"] = 1

# batched slots variant (decode_pair path)
for pair in (1, 4):
    sf.TUNE["decode_pair"] = pair
    B, T = 4, 2
    L = 2
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((B, L, KVH, S, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((B, L, KVH, S, D)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, 64, (B, KVH, T, K)), jnp.int32)
    valid = jnp.ones((B, KVH, T, K), bool)
    lens = jnp.full((B,), 8192, jnp.int32)
    pos = jnp.full((B, T), 8192, jnp.int32) + jnp.arange(T, dtype=jnp.int32)[None]
    t = time.time()
    out, lse = sf.sparse_flash_mha_slots(
        q, kc, vc, lens, idx, valid, pos,
        layer=1, local_blocks=2, interpret=False)
    np.asarray(out)
    print(f"slots B=4 pair={pair}: ok ({time.time() - t:.1f}s)", flush=True)

sf.TUNE["decode_pair"] = 4

# big-M quant kernel with a stacked static-layer BlockSpec (the
# tree-verify / batch-spec M>64 path; parity-tested in interpret mode,
# this compiles+runs it on the chip) — both the divisible-N and the
# bn-shrunk ragged-N tilings
from cpmcu_tpu.ops.quant import quant_matmul_pallas

Lq, M, Kq = 2, 96, 2048
for Nq in (1024, 640):
    t = time.time()
    qs = jnp.asarray(rng.integers(0, 2**31, (Lq, Kq // 8, Nq)), jnp.int32)
    ss = jnp.asarray(rng.standard_normal((Lq, Kq // 128, Nq)),
                     jnp.float32)
    xq = jnp.asarray(rng.standard_normal((M, Kq)), jnp.bfloat16)
    a = quant_matmul_pallas(xq, qs, ss, layer=1, interpret=False)
    b = quant_matmul_pallas(xq, qs[1], ss[1], interpret=False)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))
    c = quant_matmul_pallas(xq, qs, ss, None, jnp.int32(1),
                            interpret=False)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(c, np.float32))
    print(f"quant big-M stacked N={Nq} (static+dyn): ok "
          f"({time.time() - t:.1f}s)", flush=True)

print(f"ALL OK ({time.time() - t0:.1f}s total)", flush=True)
