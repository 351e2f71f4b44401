"""Norm-fused dense (bf16/f32) decode matmul.

The unquantized analog of ops.quant's fused-norm decode kernel
(_qmm_kernel_small_norm): at decode shapes every separate RMSNorm op costs
~8 us of dispatch latency on the tunneled device (~0.5 ms/token over the
0.5B's ~60 norms — the gap between its measured 568 tok/s and its ~1.15 ms
weight-stream floor), so ``rms_norm(x) * nw`` computes INSIDE the matmul
kernel at the first grid step and the normed activations are re-read from
a VMEM scratch by every (n, k) step. Weights stream in place via a
layer-indexed BlockSpec, exactly like the quant kernel (no per-layer slice
copy of stacked params).

Replaces: reference fused norm+GEMM epilogue (src/model/norm.cuh +
linear.cuh); on TPU the win is purely fewer kernel dispatches.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BK = 512  # K rows per grid step


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dmm_kernel_norm(
    x_ref,  # (BM, K) raw activations (full-K block)
    w_ref,  # (1?, BK, BN) weight tile ((L, BK, BN) blocks with ``layer``)
    nw_ref,  # (K,) norm weight
    o_ref,  # (BM, BN)
    acc_ref,  # (BM, BN) f32 scratch
    xn_ref,  # (nk, BM, BK) normed activations scratch
    *,
    nk: int,
    out_dtype,
    eps: float,
):
    n = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((n == 0) & (k == 0))
    def _norm():
        xf = x_ref[:].astype(jnp.float32)  # (BM, K)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = xf * jax.lax.rsqrt(var + eps) * nw_ref[:].astype(jnp.float32)
        xn = xn.astype(xn_ref.dtype)
        for kk in range(nk):  # static lane slices
            xn_ref[kk] = xn[:, kk * BK : (kk + 1) * BK]

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[...].reshape(w_ref.shape[-2], w_ref.shape[-1])
    acc_ref[:] += jax.lax.dot_general(
        xn_ref[k], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("norm_eps", "out_dtype", "bn", "layer", "interpret"),
)
def dense_matmul_norm(
    x: jax.Array,  # (M, K), M <= 64 (decode shapes)
    w: jax.Array,  # (K, N) — or (L, K, N) with ``layer``
    norm_w: jax.Array,  # (K,)
    *,
    norm_eps: float = 1e-6,
    out_dtype=None,
    bn: Optional[int] = None,
    layer: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Fused ``rms_norm(x) * norm_w @ w`` for decode-shaped dense weights."""
    if interpret is None:
        interpret = _interpret_default()
    M, K = x.shape
    N = w.shape[-1]
    assert K % BK == 0, f"K={K} must be a multiple of {BK}"
    out_dtype = out_dtype or x.dtype
    if bn is None:
        bn = next((b for b in (2048, 1536, 1024, 512) if N % b == 0), N)
    nk = K // BK
    nn = pl.cdiv(N, bn)
    bm = _round_up(M, 8)
    Mp = bm
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    if layer is None:
        w_spec = pl.BlockSpec((BK, bn), lambda m, n, k: (k, n))
    else:
        w_spec = pl.BlockSpec((1, BK, bn), lambda m, n, k: (layer, k, n))

    out = pl.pallas_call(
        functools.partial(
            _dmm_kernel_norm, nk=nk, out_dtype=out_dtype, eps=norm_eps
        ),
        grid=(1, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, K), lambda m, n, k: (0, 0)),
            w_spec,
            pl.BlockSpec((K,), lambda m, n, k: (0,)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (0, n)),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((nk, bm, BK), x.dtype),
        ],
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        interpret=interpret,
    )(x, w, norm_w)
    return out[:M]
