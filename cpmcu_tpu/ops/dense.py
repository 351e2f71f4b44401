"""Decode-shaped dense (bf16/f32) matmul kernels: norm-fused + layer-indexed.

The unquantized analogs of ops.quant's decode kernels, for bf16 models
(MiniCPM4-0.5B ladder) whose decode is dispatch- and copy-bound rather than
dequant-bound:

  * ``dense_matmul_norm`` — ``rms_norm(x) * nw @ w`` in ONE kernel: at
    decode shapes every separate RMSNorm op costs ~8 us of dispatch latency
    on the tunneled device (~0.5 ms/token over the 0.5B's ~60 norms), so
    the norm computes inside the matmul at the first grid step and the
    normed activations are re-read from a VMEM scratch by every (n, k)
    step.
  * ``dense_matmul`` — the no-norm variant for the decode path's
    layer-indexed wo / w_down calls, whose only job is reading stacked
    (L, K, N) weights IN PLACE via a layer-indexed BlockSpec: ``w[layer]``
    slicing copies the weight every step (the CLAUDE.md weight-copy trap;
    ~240 MB/token on the 0.5B).

Replaces: reference fused norm+GEMM epilogue (src/model/norm.cuh +
linear.cuh); on TPU the win is fewer dispatches and zero weight copies.

Both kernels are decode-only: ``decode_supported`` is the single dispatch
gate (layers.modules.linear consults it, so the shape constraints live
here, next to the kernel that imposes them).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BK = 512  # K rows per grid step

# A/B toggle (bench --no-dense-fusion; ablation scripts mutate +
# jax.clear_caches()): enable=False sends every dense linear down the XLA
# path — hedges the first real-TPU run of these kernels.
TUNE = {"enable": True}


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def decode_supported(M: int, K: int, N: int) -> bool:
    """Shapes these kernels handle (everything else: XLA path)."""
    return TUNE["enable"] and M <= 64 and K % BK == 0 and N % 128 == 0


def _pick_bn(N: int) -> int:
    return next((b for b in (2048, 1536, 1024, 512) if N % b == 0), N)


def _dmm_kernel_norm(
    x_ref,  # (BM, K) raw activations (full-K block)
    w_ref,  # (1?, BK, BN) weight tile ((L, BK, BN) blocks with ``layer``)
    nw_ref,  # (1, K) norm weight
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
        xn = xf * jax.lax.rsqrt(var + eps) * nw_ref[0].astype(jnp.float32)
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


def _dmm_kernel(
    x_ref,  # (BM, BK) activation tile (k-indexed block)
    w_ref,  # (1?, BK, BN) weight tile
    o_ref,  # (BM, BN)
    acc_ref,  # (BM, BN) f32 scratch
    *,
    nk: int,
    out_dtype,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[...].reshape(w_ref.shape[-2], w_ref.shape[-1])
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _w_spec(layer: Optional[int], bn: int):
    if layer is None:
        return pl.BlockSpec((BK, bn), lambda m, n, k: (k, n))
    return pl.BlockSpec((1, BK, bn), lambda m, n, k: (layer, k, n))


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
    assert decode_supported(M, K, N), (M, K, N)
    out_dtype = out_dtype or x.dtype
    bn = bn or _pick_bn(N)
    nk = K // BK
    nn = pl.cdiv(N, bn)
    bm = _round_up(M, 8)
    Mp = bm
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _dmm_kernel_norm, nk=nk, out_dtype=out_dtype, eps=norm_eps
        ),
        grid=(1, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, K), lambda m, n, k: (0, 0)),
            _w_spec(layer, bn),
            pl.BlockSpec((1, K), lambda m, n, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (0, n)),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((nk, bm, BK), x.dtype),
        ],
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        interpret=interpret,
    )(x, w, norm_w.reshape(1, K))
    return out[:M]


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bn", "layer", "interpret")
)
def dense_matmul(
    x: jax.Array,  # (M, K), M <= 64 (decode shapes)
    w: jax.Array,  # (K, N) — or (L, K, N) with ``layer``
    *,
    out_dtype=None,
    bn: Optional[int] = None,
    layer: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """``x @ w`` with stacked weights read in place (no ``w[layer]`` copy)."""
    if interpret is None:
        interpret = _interpret_default()
    M, K = x.shape
    N = w.shape[-1]
    assert decode_supported(M, K, N), (M, K, N)
    out_dtype = out_dtype or x.dtype
    bn = bn or _pick_bn(N)
    nk = K // BK
    nn = pl.cdiv(N, bn)
    bm = _round_up(M, 8)
    Mp = bm
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_dmm_kernel, nk=nk, out_dtype=out_dtype),
        grid=(1, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, BK), lambda m, n, k: (0, k)),
            _w_spec(layer, bn),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (0, n)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        interpret=interpret,
    )(x, w)
    return out[:M]
