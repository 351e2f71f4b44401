"""W4A16 fused dequant-matmul (the Marlin-class kernel, TPU-native).

Replaces the reference's vendored GPTQ-Marlin CUDA kernel
(src/qgemm/gptq_marlin/, SURVEY.md §2.4) with a Pallas kernel and a packing
designed for the TPU memory system — NOT Marlin's tensor-core permutation:

**Pack layout (v2, bf16-pair construction).** Weights W (K, N), symmetric
int4, group_size g=128. K is processed in chunks of 1024 unpacked rows.
Within chunk ``c``, packed word ``(r, n)`` (int32) holds 8 nibbles in 4
*plane pairs*: bits ``[4j, 4j+4)`` = ``W[c*1024 + j*256 + 2r, n]`` and bits
``[4j+16, 4j+20)`` = ``W[c*1024 + j*256 + 2r+1, n]`` for ``j in 0..3``.
Why this shape: one shift+and+or per plane turns the word vector into TWO
packed bf16 values ``1 + nib/16`` (``0x3F80 | nib<<3`` in each 16-bit
half), and a sublane bitcast (``pltpu.bitcast`` i32->bf16, low half ->
even row) yields a (256, BN) bf16 tile — 1.5 VPU ops per weight instead of
the 3 (shift, and, convert) of the plane-per-nibble v1 layout, in a
decode path that is VPU-dequant-bound. The affine fix-up
``w = s*(16*v - 24)`` (exact: 16(1+n/16)-24 = n-8) moves past the dot at
decode (one tiny (BM,BN) op per scale group) and into the scratch write at
prefill. Still by construction:

  * each 128-row half of a plane pair is exactly **one scale group**;
  * a (128, BN) int32 block dequantizes to 1024 K-rows -> 4-bit HBM
    traffic, which is what makes batch-1 decode ~4x faster than bf16
    weights.

Storage: ``q`` int32 (K/8, N), ``s`` SCALE_DTYPE (K/g, N). Requires K % 1024 == 0
and g == 128 (the reference's converter imposes the same: 4-bit, g=128, sym,
desc_act=False — scripts/model_convert/gptq2marlin.py:86-95); other shapes
fall back to the XLA dequant path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP_SIZE = 128
KCHUNK = 1024  # unpacked K rows per packed 128-row block

# Group-scale storage dtype. bf16 halves the scale stream (1/32 of the
# weight bytes) and measured -0.22 ms/token on the 8B decode
# (benchmark/exp_scales_dtype.py); the scale rounding (<=0.4% relative) is
# an order of magnitude below the int4 quantization step. The kernels and
# the dequant oracle cast scales to f32 at use, so any float dtype works —
# set to jnp.float32 to store exact GPTQ fp16 scale values.
SCALE_DTYPE = jnp.bfloat16

# Decode-kernel tuning knobs (ablation scripts mutate + jax.clear_caches()):
#   ku        — unpacked KCHUNKs per grid step (fatter, fewer steps)
#   bn_ladder — widest-first N tile candidates for decode shapes
#   v3_extract — plane pair 0 masked in place at mantissa [0,4) (value
#       1+n/128, fixup 128v-136) instead of shifted to [3,7): drops the
#       j=0 shift, 12 -> 11 VPU ops per word (1.375/weight). Same pack
#       layout; the prefill scratch dequant stays bit-exact (128+n and
#       n-8 are exact in bf16), while the decode path's post-dot fixup
#       scales pair 0's fp32 dot-accumulation rounding by 128 instead of
#       16 (~8x — still orders of magnitude under the int4 quantization
#       step; parity-tested, and A/B-able via bench --v3-extract).
#       MEASURED 2026-08-18 (same chip, same day): v3 149.9 tok/s vs v2
#       155.5 on the 8B dense decode — the op-count win does not realize
#       on the VPU (the in-place mask breaks the common shift+and subword
#       pattern Mosaic fuses), so v2 stays the default.
TUNE = {"ku": 1, "bn_ladder": (2048, 1536, 1024, 512), "v3_extract": False}


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# packing (host-side, numpy)
# ---------------------------------------------------------------------------

def quantize_np(w: np.ndarray, group_size: int = GROUP_SIZE) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-group int4 quantization of W (K, N) -> (int4 values in
    [0,15] with implicit zero-point 8, scales (K/g, N) f32).

    Matches GPTQ sym semantics: w ≈ (q - 8) * s.
    """
    K, N = w.shape
    assert K % group_size == 0
    wg = w.reshape(K // group_size, group_size, N).astype(np.float32)
    maxabs = np.abs(wg).max(axis=1)  # (K/g, N)
    s = np.where(maxabs == 0, 1.0, maxabs / 7.0).astype(np.float32)
    q = np.clip(np.round(wg / s[:, None, :]) + 8, 0, 15).astype(np.int32)
    return q.reshape(K, N), s


def pack_rows(q4: np.ndarray) -> np.ndarray:
    """Pack int4 values (K, N) (range 0..15) into the v2 kernel layout
    int32 (K/8, N) described in the module docstring."""
    K, N = q4.shape
    assert K % KCHUNK == 0, f"K={K} must be a multiple of {KCHUNK}"
    # (c, j, r, p, n): unpacked row = c*1024 + j*256 + 2r + p
    v = q4.reshape(K // KCHUNK, 4, 128, 2, N).astype(np.uint32)
    word = np.zeros((K // KCHUNK, 128, N), np.uint32)
    for j in range(4):
        word |= v[:, j, :, 0] << (4 * j)
        word |= v[:, j, :, 1] << (4 * j + 16)
    return word.reshape(K // 8, N).astype(np.int32)


def unpack_rows(qpacked: np.ndarray) -> np.ndarray:
    """Inverse of pack_rows: int32 (K/8, N) -> int4 values (K, N)."""
    K8, N = qpacked.shape
    K = K8 * 8
    word = qpacked.astype(np.uint32).reshape(K // KCHUNK, 128, N)
    q4 = np.zeros((K // KCHUNK, 4, 128, 2, N), np.int32)
    for j in range(4):
        q4[:, j, :, 0] = (word >> (4 * j)) & 0xF
        q4[:, j, :, 1] = (word >> (4 * j + 16)) & 0xF
    return q4.reshape(K, N)


def pack_weights(w: np.ndarray, group_size: int = GROUP_SIZE) -> dict:
    """Quantize + pack a dense fp weight (K, N) -> {'q','s'} pack."""
    q4, s = quantize_np(np.asarray(w, np.float32), group_size)
    return {"q": jnp.asarray(pack_rows(q4)),
            "s": jnp.asarray(s, SCALE_DTYPE)}


def pack_weights_padded(
    w: np.ndarray, n_align: int = 2048, group_size: int = GROUP_SIZE
) -> dict:
    """Quantize + pack with N zero-padded to a multiple of ``n_align``.

    Used for the W4 lm_head (V=73448 is not tile-friendly): padding at pack
    time keeps the kernel's wide-bn decode path and avoids the per-call
    ``jnp.pad`` copy of the 150MB pack. Pad columns dequantize to exactly 0;
    callers slice logits back to the true vocab (layers.modules.lm_head)."""
    w = np.asarray(w, np.float32)
    K, N = w.shape
    Np = _round_up(N, n_align)
    if Np != N:
        w = np.concatenate([w, np.zeros((K, Np - N), np.float32)], axis=1)
    return pack_weights(w, group_size)


def repack_gptq(
    qweight: np.ndarray,  # GPTQ int32 (K/8, N), 8 consecutive K rows per word
    scales: np.ndarray,  # (K/g, N) fp16
    qzeros: Optional[np.ndarray] = None,  # (K/g, N/8) int32; sym => all 8
    g_idx: Optional[np.ndarray] = None,
) -> dict:
    """Repack a GPTQ checkpoint tensor set into the TPU kernel layout.

    The TPU analog of scripts/model_convert/gptq2marlin.py (which applies
    Marlin's tensor-core permutation instead). Validates the same
    restrictions: 4-bit, sym (zero point 8), no act-order.
    """
    K8, N = qweight.shape
    K = K8 * 8
    if g_idx is not None:
        expected = np.repeat(np.arange(K // GROUP_SIZE), GROUP_SIZE)
        if not np.array_equal(np.asarray(g_idx).ravel(), expected):
            raise ValueError("act-order (desc_act) GPTQ checkpoints not supported")
    # unpack GPTQ layout: nibble j of word k8 = row k8*8 + j
    q4 = None
    try:
        # multi-threaded native repack (csrc/stloader.cc) does unpack+pack
        # in one pass; the numpy fallback below needs 16 full-array sweeps
        from ..io.native import repack_gptq_native

        packed = repack_gptq_native(np.asarray(qweight, np.int32))
    except Exception:
        packed = None
    if packed is None:
        w = qweight.astype(np.uint32)
        q4 = np.zeros((K, N), np.int32)
        for j in range(8):
            # GPTQ nibble j of word k8 is unpacked row k8*8 + j
            q4[j::8] = ((w >> (4 * j)) & 0xF).astype(np.int32)
    if qzeros is not None:
        zp = np.asarray(qzeros).astype(np.uint32)
        nib = np.stack([(zp >> (4 * j)) & 0xF for j in range(8)], axis=-1)
        zps = nib.reshape(zp.shape[0], -1)[:, :N]
        # GPTQ stores zero-point minus one in some exporter versions; the
        # reference converter only accepts sym (zp==8) checkpoints
        # (gptq2marlin.py:86-95) — enforce the same.
        if not (np.all(zps == 8) or np.all(zps == 7)):
            raise ValueError("only symmetric (zero-point 8) GPTQ supported")
    return {
        "q": jnp.asarray(packed if packed is not None else pack_rows(q4)),
        "s": jnp.asarray(np.asarray(scales, np.float32), SCALE_DTYPE),
    }


def dequantize(q, s, dtype=jnp.float32):
    """XLA reference dequant: pack -> dense (K, N) in ``dtype``.

    With dtype=bfloat16 this reproduces the prefill kernel's rounding
    ((q-8) and s each cast to bf16 before the product; 16*(1+n/16)-24 is
    exact in bf16). The decode kernel applies scales in f32 after the dot
    (strictly more accurate)."""
    K8, N = q.shape
    K = K8 * 8
    word = q.astype(jnp.uint32).reshape(K // KCHUNK, 128, N)
    pairs = []
    for j in range(4):
        pairs.append((word >> (4 * j)) & jnp.uint32(0xF))
        pairs.append((word >> (4 * j + 16)) & jnp.uint32(0xF))
    # (c, j, p, r, n): row = c*1024 + j*256 + 2r + p
    v = jnp.stack(pairs, axis=1).reshape(K // KCHUNK, 4, 2, 128, N)
    v = v.transpose(0, 1, 3, 2, 4)  # (c, j, r, p, n)
    vals = v.astype(jnp.int32).reshape(K, N) - 8
    vals = vals.reshape(K // GROUP_SIZE, GROUP_SIZE, N)
    return (vals.astype(dtype) * s[:, None, :].astype(dtype)).reshape(K, N)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _extract_pair_planes(w, j: int, interpret: bool):
    """(128, BN) int32 words -> ((256, BN) bf16 values, (mult, sub)) for
    plane pair ``j`` (row 2r = low 16-bit half = unpacked chunk row
    j*256 + 2r), where ``dequant = mult*v - sub == nib - 8`` exactly.

    One shift + and + or builds TWO bf16s per word (0x3F80 | nib<<3 ->
    ``1 + nib/16``), then a sublane bitcast splits them — 1.5 VPU ops per
    weight. With TUNE['v3_extract'], pair 0 (already at bits [0,4)/[16,20))
    is masked IN PLACE into mantissa bits [0,4) (``1 + nib/128``, fixup
    128v-136): no shift, 11 ops per word = 1.375/weight."""
    if j == 0 and TUNE.get("v3_extract", False):
        u = (w & 0x000F000F) | 0x3F803F80
        mult, sub = 128.0, 136.0
    else:
        t = (w << 3) if j == 0 else jax.lax.shift_right_logical(w, 4 * j - 3)
        u = (t & 0x00780078) | 0x3F803F80
        mult, sub = 16.0, 24.0
    if interpret:
        b2 = jax.lax.bitcast_convert_type(u, jnp.bfloat16)  # (128, BN, 2)
        v = b2.transpose(0, 2, 1).reshape(2 * u.shape[0], u.shape[1])
    else:
        v = pltpu.bitcast(u, jnp.bfloat16)
    return v, (mult, sub)


def _dot_packed_chunk(x, w, s, acc, interpret):
    """One 1024-row chunk of the decode dot: x (BM, 1024) bf16/f32,
    w (128, BN) packed int32, s (8, BN) f32 -> acc += x @ dequant(w, s).

    Per plane pair, dequant feeds two small MXU dots directly — Mosaic
    overlaps the next pair's VPU extraction with the current dots. Batch-1
    decode is VPU-dequant-bound, so minimizing per-weight VPU ops wins; the
    bf16-pair construction costs 1.5 ops/weight (v1 nibble planes: 3).

    Because each 128-row half of a plane pair IS one scale group (module
    docstring), scale and zero-point move past the dot:
    ``s*(x·(nib-8)) = s*(16*(x·v) - 24*sum(x))`` for ``v = 1 + nib/16``.
    The correction runs on the (BM, BN) dot result — 16-128x smaller than
    the weight tile at decode widths; ``sum(x)`` per group is one tiny
    (BM, 8) row-sum per k-chunk."""
    xsum = jnp.sum(
        x.astype(jnp.float32).reshape(x.shape[0], 8, 128), axis=2
    )
    for j in range(4):
        v, (mult, sub) = _extract_pair_planes(w, j, interpret)  # (256, BN)
        if x.dtype == jnp.float32:
            v = v.astype(jnp.float32)
        for h in range(2):
            g = 2 * j + h
            xg = x[:, g * 128 : (g + 1) * 128]
            d = jax.lax.dot_general(
                xg, v[h * 128 : (h + 1) * 128], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sg = s[g : g + 1].astype(jnp.float32)  # (1, BN)
            acc = acc + sg * (mult * d - sub * xsum[:, g : g + 1])
    return acc


def _qmm_kernel_small(
    x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk, ku, out_dtype, interpret
):
    """Decode-shape kernel (grid (nm, nn, nk), k innermost; see
    _dot_packed_chunk for the dequant-dot scheme). ``ku`` unpacked-KCHUNKs
    are processed per grid step (fewer, fatter steps)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])  # (ku*128, BN)
    x = x_ref[:]  # (BM, ku*1024)
    s = s_ref[...].reshape(s_ref.shape[-2], s_ref.shape[-1])  # (ku*8, BN)
    acc = acc_ref[:]
    for u in range(ku):
        acc = _dot_packed_chunk(
            x[:, u * KCHUNK : (u + 1) * KCHUNK],
            w[u * 128 : (u + 1) * 128],
            s[u * 8 : (u + 1) * 8],
            acc, interpret,
        )
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _qmm_kernel_small_norm(
    x_ref, q_ref, s_ref, nw_ref, o_ref, acc_ref, xn_ref, *, nk, ku,
    out_dtype, eps, interpret,
):
    """Fused RMSNorm + decode-shape dequant-matmul.

    The separate norm op before each decode GEMM is dispatch-latency-bound
    (~8us each, ~0.5ms/token over 64 norms on the 8B); fusing it here
    removes those ops. ``x`` arrives as ONE full-K block (decode M <= 64,
    so (BM, K) fits VMEM); at the first grid step the kernel computes
    ``rms_norm(x) * nw`` in f32 (same op order as layers.modules.rms_norm)
    and stores it chunked as (nk*ku, BM, 1024) scratch; every (n, k) step
    then reads its ``ku`` chunks. The reference fuses norm+GEMM the other
    way round (per-CTA epilogue, src/model/norm.cuh + linear.cuh); on TPU
    the win is purely fewer kernel dispatches."""
    n = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((n == 0) & (k == 0))
    def _norm():
        xf = x_ref[:].astype(jnp.float32)  # (BM, K)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = xf * jax.lax.rsqrt(var + eps) * nw_ref[:].astype(jnp.float32)
        xn = xn.astype(xn_ref.dtype)
        for kk in range(nk * ku):  # static lane slices; nk*ku <= 16
            xn_ref[kk] = xn[:, kk * KCHUNK : (kk + 1) * KCHUNK]

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])  # (ku*128, BN)
    s = s_ref[...].reshape(s_ref.shape[-2], s_ref.shape[-1])  # (ku*8, BN)
    acc = acc_ref[:]
    for u in range(ku):
        acc = _dot_packed_chunk(
            xn_ref[k * ku + u],
            w[u * 128 : (u + 1) * 128],
            s[u * 8 : (u + 1) * 8],
            acc, interpret,
        )
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _qmm_kernel(
    x_ref, q_ref, s_ref, o_ref, acc_ref, w_ref, *, bm, bn, nk, nm, out_dtype,
    interpret,
):
    """Prefill-shape kernel: grid (nn, nk, nm), m innermost.

    At m==0 the packed (128, BN) int32 block dequantizes ONCE into the
    (1024, BN) bf16 scratch (`w_ref`); every m-tile then runs a single wide
    MXU dot against it — the dequant VPU work amortizes over all M rows
    (Marlin amortizes its ldmatrix+LOP3 dequant the same way across its
    m-batching loop, gptq_marlin_mm.cu:150-180). ``(v*16-24)*s`` rounds
    identically to the v1 ``(nib-8)*s``: 16*(1+n/16)-24 = n-8 exactly."""
    k = pl.program_id(1)
    m = pl.program_id(2)

    @pl.when(m == 0)
    def _dequant():
        # blocks may carry a leading (1,) layer dim (stacked weights read
        # in place via a layer-indexed BlockSpec — the M>64 tree-verify /
        # batch-spec path otherwise COPIES the whole layer pack per call,
        # ~360us each in the r4e batch-spec trace)
        w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])  # (128, BN)
        sc = s_ref[...].reshape(s_ref.shape[-2], s_ref.shape[-1])  # (8, BN)
        for j in range(4):
            v, (mult, sub) = _extract_pair_planes(w, j, interpret)
            for h in range(2):
                g = 2 * j + h
                vv = v[h * 128 : (h + 1) * 128].astype(w_ref.dtype)
                sg = sc[g : g + 1].astype(w_ref.dtype)
                w_ref[g * 128 : (g + 1) * 128, :] = (vv * mult - sub) * sg

    @pl.when(k == 0)
    def _init():
        acc_ref[pl.ds(m * bm, bm), :] = jnp.zeros((bm, bn), jnp.float32)

    acc_ref[pl.ds(m * bm, bm), :] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _done():
        # out block spans all M rows and is indexed by n only, so Pallas
        # flushes it once per n-column instead of once per grid step
        o_ref[pl.ds(m * bm, bm), :] = acc_ref[pl.ds(m * bm, bm), :].astype(
            out_dtype
        )


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "bn", "bm", "interpret", "layer", "norm_eps"),
)
def quant_matmul_pallas(
    x: jax.Array,  # (M, K) bf16/f32
    q: jax.Array,  # (K/8, N) int32 (kernel pack layout) — (L, K/8, N) w/ layer
    s: jax.Array,  # (K/128, N) f32 — (L, K/128, N) with ``layer``
    norm_w: Optional[jax.Array] = None,  # (K,): fuse rms_norm(x)*norm_w into
    # the decode kernel (separate norm ops are dispatch-latency-bound)
    layer_dyn: Optional[jax.Array] = None,  # TRACED layer index (scalar
    # int32) into stacked weights, via scalar prefetch: the lax.scan-over-
    # layers forward (llama.forward unroll="scan") reads stacked weights in
    # place with the scan counter as the index — same zero-copy property as
    # the static ``layer`` path but one trace for all layers (the hier
    # inner drafter's per-op dispatch floor; VERDICT r3 task 5).
    *,
    norm_eps: float = 1e-6,
    out_dtype=None,
    bm: int = 256,
    bn: Optional[int] = None,  # decode default: widest of 2048/1024/512
    # dividing N — the per-plane dots are MXU-latency-bound at bn=512
    # (8 small dots per grid step), wider tiles amortize the dot latency
    interpret: Optional[bool] = None,
    layer: Optional[int] = None,  # static layer index into stacked weights:
    # the kernel reads the big donated buffers in place. Slicing stacked
    # weights per layer (x[li] / scanned xs) materializes a copy of every
    # tensor each decode step — profiled at 11-12ms/token on the 8B, the
    # single largest decode cost. Decode-shaped (M<=64) calls only.
):
    if interpret is None:
        interpret = _interpret_default()
    M, K = x.shape
    K8, N = q.shape[-2:]
    assert K == K8 * 8 and K % KCHUNK == 0
    assert layer is None or layer_dyn is None
    out_dtype = out_dtype or x.dtype

    bm = min(bm, _round_up(M, 8))
    Mp = _round_up(M, bm)
    ku = TUNE["ku"]
    while (K // KCHUNK) % ku:
        ku -= 1
    if norm_w is not None and Mp > 64:
        # prefill shapes: the norm amortizes over the chunk — apply in XLA
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(var + norm_eps)
             * norm_w.astype(jnp.float32)).astype(x.dtype)
        norm_w = None
    if bn is None:
        if Mp <= 64:
            # widest divisor first; 1536 covers the fused qkv N=4608
            bn = next((b for b in TUNE["bn_ladder"] if N % b == 0), 512)
        else:
            bn = next((b for b in (1024, 512) if N % b == 0), 512)
    bn = min(bn, _round_up(N, 128))

    stacked = layer is not None or layer_dyn is not None
    if stacked and (Mp > 64 or N % bn != 0):
        while N % bn:  # stacked weights cannot be padded without a copy
            bn //= 2
        # the big-M kernel supports stacked layers (static BlockSpec or
        # traced scalar-prefetch index) below; only a pack whose N
        # defeats tiling still falls back to the slice-copy path
        if bn < 128:
            li = layer if layer is not None else layer_dyn
            return quant_matmul_pallas(
                x, q[li], s[li], norm_w, norm_eps=norm_eps,
                out_dtype=out_dtype, bm=bm, interpret=interpret,
            )

    Np = _round_up(N, bn)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    if Np != N and not stacked:
        q = jnp.pad(q, ((0, 0), (0, Np - N)))
        s = jnp.pad(s, ((0, 0), (0, Np - N)))

    nm, nn, nk = Mp // bm, Np // bn, K // KCHUNK
    dq_dtype = jnp.bfloat16 if x.dtype != jnp.float32 else jnp.float32

    if Mp <= 64:
        nk = K // (KCHUNK * ku)
        if layer_dyn is not None:
            q_spec = pl.BlockSpec((1, 128 * ku, bn),
                                  lambda m, n, k, li: (li[0], k, n))
            s_spec = pl.BlockSpec((1, 8 * ku, bn),
                                  lambda m, n, k, li: (li[0], k, n))
        elif layer is None:
            q_spec = pl.BlockSpec((128 * ku, bn), lambda m, n, k: (k, n))
            s_spec = pl.BlockSpec((8 * ku, bn), lambda m, n, k: (k, n))
        else:
            q_spec = pl.BlockSpec((1, 128 * ku, bn),
                                  lambda m, n, k: (layer, k, n))
            s_spec = pl.BlockSpec((1, 8 * ku, bn),
                                  lambda m, n, k: (layer, k, n))

        def call(kernel, in_specs, scratch_shapes, operands):
            """Wrap the decode pallas_call: with ``layer_dyn`` the layer
            index rides scalar prefetch (the index maps above take it as a
            trailing ref) and the kernel ignores the extra leading ref."""
            kw = dict(
                out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                interpret=interpret,
            )
            out_spec = pl.BlockSpec((bm, bn), lambda m, n, k, *_: (m, n))
            if layer_dyn is not None:
                out = pl.pallas_call(
                    lambda li_ref, *a: kernel(*a),
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=1,
                        grid=(nm, nn, nk),
                        in_specs=in_specs,
                        out_specs=out_spec,
                        scratch_shapes=scratch_shapes,
                    ),
                    **kw,
                )(jnp.asarray(layer_dyn, jnp.int32).reshape(1), *operands)
            else:
                out = pl.pallas_call(
                    kernel,
                    grid=(nm, nn, nk),
                    in_specs=in_specs,
                    out_specs=out_spec,
                    scratch_shapes=scratch_shapes,
                    **kw,
                )(*operands)
            return out[:M, :N]

        # decode shapes: interleaved dequant+dot, k innermost
        if norm_w is not None:
            return call(
                functools.partial(
                    _qmm_kernel_small_norm, nk=nk, ku=ku, out_dtype=out_dtype,
                    eps=norm_eps, interpret=interpret,
                ),
                [
                    pl.BlockSpec((bm, K), lambda m, n, k, *_: (m, 0)),
                    q_spec,
                    s_spec,
                    pl.BlockSpec((1, K), lambda m, n, k, *_: (0, 0)),
                ],
                [
                    pltpu.VMEM((bm, bn), jnp.float32),
                    pltpu.VMEM((nk * ku, bm, KCHUNK), x.dtype),
                ],
                (x, q, s, norm_w.reshape(1, K)),
            )
        return call(
            functools.partial(
                _qmm_kernel_small, nk=nk, ku=ku, out_dtype=out_dtype,
                interpret=interpret,
            ),
            [
                pl.BlockSpec((bm, KCHUNK * ku), lambda m, n, k, *_: (m, k)),
                q_spec,
                s_spec,
            ],
            [pltpu.VMEM((bm, bn), jnp.float32)],
            (x, q, s),
        )
    kernel_big = functools.partial(
        _qmm_kernel, bm=bm, bn=bn, nk=nk, nm=nm, out_dtype=out_dtype,
        interpret=interpret,
    )
    x_spec_big = pl.BlockSpec((bm, KCHUNK), lambda n, k, m, *_: (m, k))
    out_spec_big = pl.BlockSpec((Mp, bn), lambda n, k, m, *_: (0, n))
    scratch_big = [
        pltpu.VMEM((Mp, bn), jnp.float32),
        pltpu.VMEM((KCHUNK, bn), dq_dtype),
    ]
    kw_big = dict(
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )
    if layer_dyn is not None:
        # TRACED layer via scalar prefetch (the batch-spec base tree
        # forward scans layers at M=B*tree_size>64 — without this it
        # slice-copies every layer pack per scan step)
        out = pl.pallas_call(
            lambda li_ref, *a: kernel_big(*a),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nn, nk, nm),
                in_specs=[
                    x_spec_big,
                    pl.BlockSpec((1, 128, bn),
                                 lambda n, k, m, li: (li[0], k, n)),
                    pl.BlockSpec((1, 8, bn),
                                 lambda n, k, m, li: (li[0], k, n)),
                ],
                out_specs=out_spec_big,
                scratch_shapes=scratch_big,
            ),
            **kw_big,
        )(jnp.asarray(layer_dyn, jnp.int32).reshape(1), x, q, s)
        return out[:M, :N]
    if layer is None:
        q_spec_big = pl.BlockSpec((128, bn), lambda n, k, m: (k, n))
        s_spec_big = pl.BlockSpec((8, bn), lambda n, k, m: (k, n))
    else:
        # stacked weights read in place (see _qmm_kernel._dequant note)
        q_spec_big = pl.BlockSpec((1, 128, bn), lambda n, k, m: (layer, k, n))
        s_spec_big = pl.BlockSpec((1, 8, bn), lambda n, k, m: (layer, k, n))

    out = pl.pallas_call(
        kernel_big,
        grid=(nn, nk, nm),
        in_specs=[
            pl.BlockSpec((bm, KCHUNK), lambda n, k, m: (m, k)),
            q_spec_big,
            s_spec_big,
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda n, k, m: (0, n)),
        scratch_shapes=scratch_big,
        **kw_big,
    )(x, q, s)
    return out[:M, :N]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def quant_matmul(
    x: jax.Array, q: jax.Array, s: jax.Array, layer: Optional[int] = None,
    norm: Optional[Tuple[jax.Array, float]] = None,
) -> jax.Array:
    """Dispatch: Pallas fused kernel when supported, XLA dequant otherwise.

    ``x`` may be (..., K); output (..., N) in x.dtype. With ``layer``, q/s
    are stacked (L, ...) and the kernel reads them in place (no per-layer
    slice copy — see quant_matmul_pallas); a TRACED ``layer`` (the
    scan-over-layers counter) routes to the scalar-prefetch variant. With
    ``norm=(weight, eps)``, ``rms_norm(x) * weight`` is fused into the
    kernel (decode shapes).
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    K8, N = q.shape[-2:]
    static_layer = layer if (layer is None or isinstance(layer, int)) else None
    dyn_layer = layer if static_layer is None and layer is not None else None
    if K == K8 * 8 and K % KCHUNK == 0 and jax.default_backend() == "tpu":
        nw, eps = norm if norm is not None else (None, 1e-6)
        out = quant_matmul_pallas(x2, q, s, nw, dyn_layer, norm_eps=eps,
                                  layer=static_layer)
    else:
        if norm is not None:
            xf = x2.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            x2 = (xf * jax.lax.rsqrt(var + norm[1])
                  * norm[0].astype(jnp.float32)).astype(x.dtype)
        if layer is not None:
            q, s = q[layer], s[layer]
        w = dequantize(q, s).astype(x.dtype)
        out = jnp.dot(x2, w, preferred_element_type=jnp.float32).astype(x.dtype)
    return out.reshape(*lead, N)
