"""Pallas block-sparse flash attention (InfLLM-v2 stage 2).

TPU-native replacement for the reference's blockmask-driven FlashAttention
main loop (src/flash_attn/src/flash_blockmask.h:5-110 skip-scan +
flash_fwd_kernel.h headlevel kernels). Design:

  * the kernel streams 512-token KV tiles through the normal Pallas
    pipeline; an XLA prologue computes, per (kv head, query tile), which
    tiles contain ANY visible 64-token selection block and a clamped
    ``load_idx`` table — the BlockSpec index_map reads it from SMEM, so
    skipped tiles repeat the previous mapping (no DMA is issued) and
    ``pl.when`` skips their compute. Work and traffic scale with the
    selected fraction, pipelined, with none of the per-block DMA latency a
    manual copy loop pays (v1 of this kernel DMA'd 64-token blocks with
    explicit semaphore waits — ~36K serialized waits per 8B prefill chunk).
  * per-token exactness inside a visited tile: each token's block-level
    visibility (top-k selection OR local window) arrives as a pre-packed
    8-bit mask per (token, tile) — one shift+and in the kernel — and exact
    causality/limit are re-applied per key; the same per-token granularity
    as the reference's per-16-row bitmap (minicpm4_attn.cuh:162-199).
  * query tiling folds the G = H/KVH query heads of a KV group into MXU
    rows (rows = G * BT).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sparse import BLOCK, NEG_INF

# Tiling knobs (ablation scripts mutate + jax.clear_caches(), like
# ops.quant.TUNE): gs = g-split factor, bt = query tokens/tile (0 = auto),
# decode_bk = KV rows per decode tile (64 = exactly one selection block,
# halving scattered-block DMA vs 128; A/B on hardware), decode_pair =
# KV sub-tiles processed per grid step on decode/tree-shaped calls (each
# sub-tile is its own BlockSpec ref with an independent load-table index,
# so scattered fine tiles share one grid step: bytes scale with the
# fine-tile visitation while the step count stays at the coarse-tile
# count — the r4b bk=128 regression was 4x the GRID, not the tile size).
TUNE = {"prefill_gs": 1, "prefill_bt": 256, "decode_bk": 128,
        "decode_pair": 1, "prefill_pair": 1, "tree_pair": 2}
# decode_pair/tree_pair defaults flipped to the measured post-fix winners
# (r4g_sweep.jsonl, same chip-day as the 106.36 default row): decode
# pair=1 112.43 tok/s vs pair=4 106.36; tree_pair=2 109.52. The r4d
# "decode_pair=4" pick predated the 410d3ce/b143de4 decode fixes.
# prefill_gs/bt measured on TPU at 94K ctx, 2048-chunk (VERDICT r2 task 5;
# benchmark/results/r3a_gsplit_ab.log + r3b_gsplit_ab_realistic.log):
#   saturated unions:  bt256 1250.9 ms < gs4 1310.0 < gs1-auto 1385.0
#   realistic unions:  bt256  894.0 ms < bt128 909.4 < gs4 953.6 < 963.1
# gs1-bt256 (rows = G*256 = 4096 per selection group) wins both regimes —
# one KV-tile DMA serves 4x more query tokens; the g-split variant stays
# available behind TUNE for narrow-VMEM shapes.

BK = 512  # KV rows per pipelined tile at prefill (8 selection blocks)
BK_DECODE = 128  # decode-shaped calls: selected blocks are scattered, so
# finer tiles cut the dominant cost — tile DMA traffic — 4x (the grid
# length is selection-bound either way; measured 2.4ms/token of tile DMA
# at 96K with BK=512)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# visit-table prologue (XLA)
# ---------------------------------------------------------------------------


def build_visit_tables(
    topk_idx: jax.Array,  # (KVH, T, K) selected 64-token block ids
    topk_valid: jax.Array,  # (KVH, T, K) bool
    positions: jax.Array,  # (T,) absolute query positions
    limit,  # int32 scalar: exclusive bound on visible cache rows
    nb: int,  # static: number of 64-token blocks in the cache
    bt: int,  # static: query tokens per tile
    *,
    local_blocks: int,
    bk: int = BK,
):
    """Returns (load_idx (KVH, nq, NBK) int32 — KV-tile index to map, with
    skipped tiles clamped to the previous visited tile, visited
    (KVH, nq, NBK) int32 0/1)."""
    from .sparse import bits_from_topk

    KVH, T, K = topk_idx.shape
    nq = (T + bt - 1) // bt
    Tp = nq * bt

    bits = bits_from_topk(topk_idx, topk_valid, nb)

    b = jnp.arange(nb, dtype=jnp.int32)[None, None, :]
    pos = jnp.asarray(positions, jnp.int32)
    q_block = (pos // BLOCK)[None, :, None]
    vis = bits | (b > q_block - local_blocks)  # selection ∪ local window
    vis = vis & (b * BLOCK < jnp.asarray(limit, jnp.int32))  # feasible rows
    vis = vis & (b <= q_block)  # no fully-future blocks (causal)

    if Tp != T:
        vis = jnp.pad(vis, ((0, 0), (0, Tp - T), (0, 0)))

    # group 64-token selection blocks into bk-token KV tiles
    sub = bk // BLOCK
    nbk = (nb + sub - 1) // sub
    if nbk * sub != nb:
        vis = jnp.pad(vis, ((0, 0), (0, 0), (0, nbk * sub - nb)))
    vis5 = vis.reshape(KVH, nq, bt, nbk, sub)
    union = vis5.any(axis=(2, 4))  # (KVH, nq, nbk)
    visited = union

    # per-(token, tile) sub-block bitmap: bit sb of blockvis[h,qi,tile,t] =
    # visibility of 64-token block tile*8+sb for query t. The kernel tests
    # block-level visibility with one shift+and instead of a K-iteration
    # top-k membership loop (the old loop was ~64 (BT,BK) compare-ors per
    # visited tile — the dominant VPU cost of sparse prefill).
    weights = (1 << jnp.arange(sub, dtype=jnp.int32))[None, None, None, None, :]
    blockvis = (vis5.astype(jnp.int32) * weights).sum(-1)  # (KVH,nq,bt,nbk)

    # clamp skipped tiles to the previous visited tile so their BlockSpec
    # mapping (and hence their DMA) repeats and is elided by the pipeline
    t_idx = jnp.arange(nbk, dtype=jnp.int32)
    marked = jnp.where(visited, t_idx, -1)
    load_idx = jax.lax.associative_scan(jnp.maximum, marked, axis=-1)
    load_idx = jnp.maximum(load_idx, 0)
    return load_idx, visited.astype(jnp.int32), blockvis


def compact_visit_tables(load_idx, visited, nbv: int):
    """Shrink the KV grid to ``nbv`` steps by enumerating visited tiles.

    For decode-shaped calls the full tile grid is mostly skipped steps
    (96K ctx: 192 steps, ~11 visited); a compacted grid walks exactly the
    visited tiles (ascending), padding by repeating the last one (DMA
    elided). Only valid when nbv >= max visited count, which the caller
    guarantees from the selection bound."""
    KVH, nq, nbk = visited.shape
    t_idx = jnp.arange(nbk, dtype=jnp.int32)
    order = jnp.argsort(
        jnp.where(visited.astype(bool), t_idx, nbk + t_idx), axis=-1
    ).astype(jnp.int32)[..., :nbv]
    nvis = visited.sum(axis=-1, dtype=jnp.int32)  # (KVH, nq)
    b = jnp.arange(nbv, dtype=jnp.int32)
    vis_c = (b[None, None, :] < nvis[..., None]).astype(jnp.int32)
    last = jnp.take_along_axis(
        order, jnp.clip(nvis - 1, 0, nbv - 1)[..., None], axis=-1
    )
    load_c = jnp.where(vis_c.astype(bool), order, last)
    return load_c, vis_c


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _sparse_kernel(
    # scalar prefetch
    load_ref,  # (KVH*nq*NGRID,) int32 — NGRID = grid_steps * pair sub-tiles
    visit_ref,  # (KVH*nq*NGRID,) int32 0/1
    limit_ref,  # (1,) int32
    # inputs
    q_ref,  # (1, 1, rows, D)
    bvis_ref,  # (1, 1, NSTEPS, BT, pair) int32 — bit sb of word [b, t, p]
               # = block tile_p*sub+sb visible to query t, where tile_p is
               # the KV tile step b's sub-tile p maps. Pre-gathered by the
               # XLA prologue via the load table: the kernel indexes its
               # step's (BT, pair) plane instead of scanning an NBK-wide
               # row (that scan was ~0.2us/step at prefill and would grow
               # 4x at bk=128). The block covers ALL grid steps with a
               # b-invariant index map, so the whole table DMAs ONCE per
               # (head, q-tile) — blocking the step axis instead issued a
               # tiny per-step DMA, and the trailing dims must be the full
               # (BT, pair) extents anyway (Mosaic last-two-dims rule).
    pos_ref,  # (1, 1, BT) int32
    # then ``pair`` interleaved (k_ref, v_ref) pairs, each (1, BK, D):
    # sub-tile p maps KV tile load_ref[base + p] — independent scattered
    # tiles share one grid step (fewer, fatter steps; VERDICT r3 task 1a)
    *refs,  # k0, v0, [k1, v1, ...], o_ref, lse_ref, m_scr, l_scr, acc_scr
    scale: float,
    g: int,
    bt: int,
    emit_lse: bool,
    gs: int = 1,  # g-split: grid axis 0 is (kv head, sub-group); the visit
                  # tables are per kv head (h // gs)
    kvh_per_slot: int = 0,  # batched-slot mode (sparse_flash_mha_slots):
                  # grid axis 0 is (slot, kv head) and ``limit_ref`` holds
                  # one history length per slot instead of one scalar
    pair: int = 1,  # KV sub-tiles folded into each grid step
):
    kv_refs = refs[: 2 * pair]
    o_ref, lse_ref = refs[2 * pair], refs[2 * pair + 1]
    m_scr, l_scr, acc_scr = refs[2 * pair + 2:]

    h = pl.program_id(0) // gs
    qi = pl.program_id(1)
    b = pl.program_id(2)
    nq = pl.num_programs(1)
    nsteps = pl.num_programs(2)
    ngrid = nsteps * pair
    rows, D = q_ref.shape[2], q_ref.shape[3]
    if kvh_per_slot:
        limit = limit_ref[pl.program_id(0) // kvh_per_slot]
    else:
        limit = limit_ref[0]
    base = (h * nq + qi) * ngrid + b * pair

    @pl.when(b == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    anyv = visit_ref[base]
    for p in range(1, pair):
        anyv = anyv | visit_ref[base + p]

    @pl.when(anyv == 1)
    def _compute():
        q = q_ref[0, 0]
        qpos = pos_ref[0, 0][:, None]  # (BT, 1)
        bv = bvis_ref[0, 0, b]  # (BT, pair) — this step's plane
        s_parts = []
        v_parts = []
        for p in range(pair):
            k_ref, v_ref = kv_refs[2 * p], kv_refs[2 * p + 1]
            tile = load_ref[base + p]  # actual KV-tile index mapped here
            bk = k_ref.shape[-2]  # KV rows per sub-tile
            k = k_ref[...].reshape(bk, k_ref.shape[-1])
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (rows, BK)

            # per-token visibility in (BT, BK) space: block-level selection
            # ∪ window comes pre-gathered per (token, sub-tile) as a packed
            # mask word (one shift+and); exact causality/limit stay
            # per-key. Padded / clamped sub-tiles (visit 0) mask out.
            j = tile * bk + jax.lax.broadcasted_iota(jnp.int32, (bt, bk), 1)
            # static python slice — Mosaic has no dynamic_slice lowering
            word = bv[:, p:p + 1]  # (BT, 1)
            sb = jax.lax.broadcasted_iota(jnp.int32, (bt, bk), 1) // BLOCK
            blockok = jax.lax.shift_right_logical(word, sb) & 1
            ok = (j <= qpos) & (j < limit) & (blockok == 1)
            ok = jnp.logical_and(ok, visit_ref[base + p] == 1)
            ok = jnp.broadcast_to(ok[None], (g, bt, bk)).reshape(rows, bk)
            s_parts.append(jnp.where(ok, s, NEG_INF))
            v_parts.append(v_ref[...].reshape(bk, v_ref.shape[-1]))
        s = s_parts[0] if pair == 1 else jnp.concatenate(s_parts, axis=1)
        v = v_parts[0] if pair == 1 else jnp.concatenate(v_parts, axis=0)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p_mat = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * alpha + jnp.sum(p_mat, axis=1, keepdims=True),
            l_scr.shape,
        )
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p_mat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(b == nsteps - 1)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        if emit_lse:
            lse = jnp.where(l == 0.0, NEG_INF, m_scr[:, :1] + jnp.log(l_safe))
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "include_new", "local_blocks", "return_lse", "scale", "bt", "layer",
        "interpret", "bk", "gs",
    ),
)
def sparse_flash_mha(
    q: jax.Array,  # (T, H, D)
    k_cache: jax.Array,  # (KVH, S, D) — or (L, KVH, S, D) with ``layer``
    v_cache: jax.Array,  # same
    prior_len: jax.Array,  # scalar int32 history length
    topk_idx: jax.Array,  # (KVH, T, K) selected block ids
    topk_valid: jax.Array,  # (KVH, T, K) bool
    positions: jax.Array,  # (T,) absolute query positions
    *,
    include_new: bool,  # True: attend [0, prior+T) causal (prefill/decode);
                        # False: history [0, prior) only (tree-merge path)
    local_blocks: int,
    return_lse: bool = False,
    scale: Optional[float] = None,
    bt: Optional[int] = None,
    layer: Optional[int] = None,  # static layer index into a stacked cache
                                  # (zero-copy decode; see ops.flash)
    interpret: Optional[bool] = None,
    bk: Optional[int] = None,  # KV rows per tile; default BK_DECODE for
                               # decode-shaped T, BK for prefill
    gs: Optional[int] = None,  # g-split: split the G query heads of a KV
        # group over ``gs`` grid rows so bt grows gs-fold at the same MXU
        # rows. The visit union is computed per (kv head, query tile), so
        # widening bt makes ONE union cover gs x more tokens: total visited
        # grid steps shrink whenever adjacent queries select overlapping
        # blocks (real checkpoints — union growth is sublinear in bt).
        # Under fully-saturated unions (synthetic weights) it is neutral:
        # each of the gs sub-rows re-streams the same tiles. Default: 4 at
        # prefill shapes (T >= 1024), 1 otherwise. For a saturated-regime
        # DMA cut use a larger ``bt`` at gs=1 instead (rows grows past
        # 1024; VMEM limit is raised automatically).
):
    if interpret is None:
        interpret = _interpret_default()
    T, H, D = q.shape
    KVH, S, _ = k_cache.shape[-3:]
    G = H // KVH
    NB = S // BLOCK
    K = topk_idx.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if gs is None:
        gs = TUNE["prefill_gs"] if T >= 1024 else 1
    gs = max(gs, 1)
    while G % gs:
        gs -= 1
    if bt is None:
        if T >= 1024 and TUNE["prefill_bt"]:
            bt = TUNE["prefill_bt"]
        else:
            bt = max(8, (1024 * gs) // G)
    bt = min(bt, _round_up(T, 8))
    nq = pl.cdiv(T, bt)
    Tp = nq * bt
    gsub = G // gs  # query heads per grid row after the split
    rows = gsub * bt
    # fold ``pair`` fine sub-tiles into each grid step. Fine tiles cut
    # tile-DMA bytes (at 96K a 512-row tile holds 8 selection blocks, so
    # the tile-level union saturates long before the block-level union
    # does: block union 0.3 -> tile union ~0.9 at bk=512 vs ~0.5 at
    # bk=128); pairing keeps the step count at the coarse-tile figure
    # (the r4b bk=128 regression: 768 steps at ~0.44us/step of fixed
    # overhead — 4 sub-tiles/step restores 192 steps at half the bytes).
    if T <= 8:
        # true decode (single token / short chains): post-fix r4g A/B
        # flipped the winner to UNPAIRED bk=128 (pair1 112.43 vs pair4
        # 106.36 tok/s full-stack; the r4d pair4 pick predated the
        # 410d3ce decode fixes) — pairing stays available via TUNE
        pair = max(1, int(TUNE.get("decode_pair", 1)))
    elif T < 1024:
        # spec-tree verify (T = tree_size): the 12-token union covers most
        # coarse tiles, so fine tiles just add DMA descriptors — r4g traced
        # pair4/bk128 at +37% kernel time vs bk512 unpaired. COARSE pairing
        # (tree_pair=2 x tree_bk=512 sub-tiles/step, same bytes, half the
        # steps) measured 109.52 vs 106.36 and is the default
        pair = max(1, int(TUNE.get("tree_pair", 1)))
    else:
        pair = max(1, int(TUNE.get("prefill_pair", 1)))
    if bk is None:
        dbk = TUNE["decode_bk"] or BK_DECODE
        if pair > 1 and 8 < T < 1024:
            # spec-tree pairing keeps COARSE tiles: the 12-token union
            # covers most coarse tiles (fine tiles only add DMA
            # descriptors, r4g trace), so pairing's win here is fewer
            # grid steps at the same bytes — pair sub-tiles of tree_bk
            # rows each per step (pair=2 x 512 halves the ~40% per-step
            # overhead share of the tree call)
            bk = int(TUNE.get("tree_bk", BK))
        elif pair > 1 and S % dbk == 0:
            bk = dbk
        else:
            # unpaired: spec-tree verify (T = tree_size) must KEEP BK=512 —
            # r4b measured 128-row tiles quadrupling the grid (round
            # 20 -> 36 ms). Only true decode shapes (T <= 8) win from
            # finer tiles without pairing.
            bk = dbk if T <= 8 and S % dbk == 0 else BK
    if S % bk:
        pair = 1  # cannot tile this capacity; fall back to the padded path

    prior = jnp.asarray(prior_len, jnp.int32)
    limit = prior + (T if include_new else 0)

    load_idx, visited, blockvis = build_visit_tables(
        topk_idx, topk_valid, positions, limit, NB, bt,
        local_blocks=local_blocks, bk=bk,
    )
    nbk = load_idx.shape[-1]
    # decode-shaped calls: bound on distinct visited tiles per query tile =
    # T selections * K blocks + window + sink/boundary slack, in tile units
    nbv = min(nbk, T * K + local_blocks + 3)
    if nbv < nbk:
        load_idx, visited = compact_visit_tables(load_idx, visited, nbv)
    ngrid = load_idx.shape[-1]
    if ngrid % pair:
        padn = pair - ngrid % pair
        load_idx = jnp.pad(load_idx, ((0, 0), (0, 0), (0, padn)),
                           mode="edge")
        visited = jnp.pad(visited, ((0, 0), (0, 0), (0, padn)))
        ngrid += padn
    nsteps = ngrid // pair
    # pre-gather the per-(token, sub-tile) visibility words by the load
    # table -> (KVH, nq, bt, ngrid), then split the grid axis out to
    # (KVH, nq, nsteps, bt, pair) so each step's block is the full
    # (bt, pair) trailing extent (Mosaic last-two-dims rule). Clamped /
    # padded entries carry the clamped tile's word, masked in-kernel by
    # the visit flag. NOTE: do NOT "optimize" this into one broadcast
    # gather (operand (KVH,nq,1,bt,NBK) x idx (KVH,nq,S,1,P)) — XLA
    # materializes the broadcast operand, ~600 MB/call at 96K prefill
    # (r4e pair1_v2 timed out on it); the two ~16us relayout fusions of
    # the transpose are the cheap option.
    bvis_grid = jnp.take_along_axis(blockvis, load_idx[:, :, None, :],
                                    axis=-1)
    bvis_grid = (
        bvis_grid.reshape(KVH, nq, bt, nsteps, pair)
        .transpose(0, 1, 3, 2, 4)
    )
    Sp = nbk * bk
    if Sp != S:
        k_cache = jnp.pad(k_cache, ((0, 0), (0, Sp - S), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, Sp - S), (0, 0)))

    # fold query heads into tile rows: (T, H, D) -> (KVH*gs, nq, gsub*bt, D)
    if Tp != T:
        q = jnp.pad(q, ((0, Tp - T), (0, 0), (0, 0)))
    qg = (
        q.reshape(nq, bt, KVH, gs, gsub, D)
        .transpose(2, 3, 0, 4, 1, 5)
        .reshape(KVH * gs, nq, rows, D)
    )
    pos_p = jnp.asarray(positions, jnp.int32)
    if Tp != T:
        pos_p = jnp.pad(pos_p, (0, Tp - T), constant_values=0)
    pos_tiled = pos_p.reshape(nq, 1, bt)

    def make_kv_index(p):
        if layer is None:
            def kv_index(h, qi, b, load_ref, visit_ref, limit_ref):
                kvh = h // gs
                return (kvh, load_ref[(kvh * nq + qi) * ngrid + b * pair + p], 0)
        else:
            def kv_index(h, qi, b, load_ref, visit_ref, limit_ref):
                kvh = h // gs
                return (layer, kvh,
                        load_ref[(kvh * nq + qi) * ngrid + b * pair + p], 0)
        return kv_index

    kv_block = (1, bk, D) if layer is None else (1, 1, bk, D)
    kv_specs = []
    kv_operands = []
    for p in range(pair):
        idx = make_kv_index(p)
        kv_specs += [pl.BlockSpec(kv_block, idx), pl.BlockSpec(kv_block, idx)]
        kv_operands += [k_cache, v_cache]

    kernel = functools.partial(
        _sparse_kernel, scale=scale, g=gsub, bt=bt, emit_lse=return_lse,
        gs=gs, pair=pair,
    )

    if return_lse:
        lse_spec = pl.BlockSpec((1, 1, rows, 128), lambda h, qi, b, *_: (h, qi, 0, 0))
        lse_shape = jax.ShapeDtypeStruct((KVH * gs, nq, rows, 128), jnp.float32)
    else:
        lse_spec = pl.BlockSpec((1, 1, 8, 128), lambda h, qi, b, *_: (0, 0, 0, 0))
        lse_shape = jax.ShapeDtypeStruct((1, 1, 8, 128), jnp.float32)

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(KVH * gs, nq, nsteps),
            in_specs=[
                pl.BlockSpec((1, 1, rows, D), lambda h, qi, b, *_: (h, qi, 0, 0)),
                pl.BlockSpec((1, 1, nsteps, bt, pair),
                             lambda h, qi, b, *_: (h // gs, qi, 0, 0, 0)),
                pl.BlockSpec((1, 1, bt), lambda h, qi, b, *_: (qi, 0, 0)),
                *kv_specs,
            ],
            out_specs=[
                pl.BlockSpec((1, 1, rows, D), lambda h, qi, b, *_: (h, qi, 0, 0)),
                lse_spec,
            ],
            scratch_shapes=[
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((KVH * gs, nq, rows, D), q.dtype),
            lse_shape,
        ],
        # rows > 1024 (large-bt saturated-prefill tiles) needs scratch past
        # the ~16MB scoped-VMEM default (CLAUDE.md environment truths)
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if rows > 1024 else None
        ),
        interpret=interpret,
    )(
        load_idx.reshape(-1), visited.reshape(-1), limit.reshape(1),
        qg, bvis_grid, pos_tiled, *kv_operands,
    )

    out = (
        out.reshape(KVH, gs, nq, gsub, bt, D)
        .transpose(2, 4, 0, 1, 3, 5)
        .reshape(Tp, H, D)[:T]
    )
    if not return_lse:
        return out
    lse = (
        lse[..., 0]
        .reshape(KVH, gs, nq, gsub, bt)
        .transpose(2, 4, 0, 1, 3)
        .reshape(Tp, H)[:T]
    )
    return out, lse


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def mha_sparse(
    q, k_cache, v_cache, prior_len,
    topk_idx, topk_valid, positions,
    tree_mask=None, *, local_blocks: int, impl: str = "auto",
):
    """Sparse-attention entry used by layers.attention on the selection path.

    * Pallas path (TPU): one visit-table kernel pass for prefill/decode; for
      tree decode, a history-only pass merged with the XLA tree block by LSE
      (the split-kv combine, like ops.flash.mha_flash).
    * XLA path (tests / non-TPU): materialized block mask via ops.attention.
    """
    d_ok = q.shape[-1] % 128 == 0
    use_pallas = impl in ("flash", "auto") and (
        (impl == "flash" and jax.default_backend() != "tpu")  # interpret test
        or (jax.default_backend() == "tpu" and d_ok)
    )
    if not use_pallas:
        from .attention import mha_xla
        from .sparse import bits_from_topk, block_visibility

        NB = k_cache.shape[1] // BLOCK
        bits = bits_from_topk(topk_idx, topk_valid, NB)
        bm = block_visibility(bits, positions, local_blocks=local_blocks)
        return mha_xla(q, k_cache, v_cache, prior_len, tree_mask, bm)

    if tree_mask is None:
        return sparse_flash_mha(
            q, k_cache, v_cache, prior_len, topk_idx, topk_valid, positions,
            include_new=True, local_blocks=local_blocks,
        )

    from .flash import _tree_block_attn, merge_attn

    out_h, lse_h = sparse_flash_mha(
        q, k_cache, v_cache, prior_len, topk_idx, topk_valid, positions,
        include_new=False, local_blocks=local_blocks, return_lse=True,
    )
    out_t, lse_t = _tree_block_attn(
        q, k_cache, v_cache, prior_len, tree_mask, window=0, sink=0
    )
    return merge_attn(out_h, lse_h, out_t, lse_t)


# ---------------------------------------------------------------------------
# batched slots (continuous batching, decode-shaped)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("layer", "local_blocks", "scale", "bk", "interpret"),
)
def sparse_flash_mha_slots(
    q: jax.Array,  # (B, T, H, D) — T lockstep query tokens per slot
    k_cache: jax.Array,  # (B, L, KVH, S, D) slot arena
    v_cache: jax.Array,
    lengths: jax.Array,  # (B,) committed history rows per slot
    topk_idx: jax.Array,  # (B, KVH, T, K) selected block ids per slot/token
    topk_valid: jax.Array,  # (B, KVH, T, K) bool
    positions: jax.Array,  # (B, T) absolute query positions
    *,
    layer: int,
    local_blocks: int,
    scale: Optional[float] = None,
    bk: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Per-slot block-sparse attention over the batch arena — the sparse
    analog of ops.flash.flash_mha_slots: each slot's T queries attend its
    own selected blocks ∪ local window over [0, len_b), in place via
    slot/layer-indexed BlockSpecs (no per-slot slice copies). History only
    — the caller merges the new rows (self token / intra-chunk block) by
    LSE. Reuses _sparse_kernel with grid axis 0 = (slot, kv head) and
    per-slot limits (``kvh_per_slot``). Returns (out (B, T, H, D),
    lse (B, T, H))."""
    if interpret is None:
        interpret = _interpret_default()
    B, T, H, D = q.shape
    KVH, S = k_cache.shape[2], k_cache.shape[3]
    G = H // KVH
    NB = S // BLOCK
    K = topk_idx.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if bk is None:
        bk = TUNE["decode_bk"] or BK_DECODE
    assert S % bk == 0, f"slot budget {S} must be a multiple of bk={bk}"
    bt = _round_up(T, 8)  # query-tile rows (one tile per slot)
    rows = G * bt
    lengths = jnp.asarray(lengths, jnp.int32)
    positions = jnp.asarray(positions, jnp.int32)

    def tables(idx_b, valid_b, pos_b, len_b):
        return build_visit_tables(
            idx_b, valid_b, pos_b, len_b, NB, bt,
            local_blocks=local_blocks, bk=bk,
        )

    # (B, KVH, 1, nbk) / (B, KVH, 1, bt, nbk)
    load_idx, visited, blockvis = jax.vmap(tables)(
        topk_idx, topk_valid, positions, lengths
    )
    nbv = min(load_idx.shape[-1], T * K + local_blocks + 3)
    if nbv < load_idx.shape[-1]:
        load_idx, visited = jax.vmap(
            functools.partial(compact_visit_tables, nbv=nbv)
        )(load_idx, visited)
    ngrid = load_idx.shape[-1]
    pair = max(1, int(TUNE.get("decode_pair", 1)))
    if ngrid % pair:
        padn = pair - ngrid % pair
        load_idx = jnp.pad(load_idx, ((0, 0), (0, 0), (0, 0), (0, padn)),
                           mode="edge")
        visited = jnp.pad(visited, ((0, 0), (0, 0), (0, 0), (0, padn)))
        ngrid += padn
    nsteps = ngrid // pair

    # (B, T, H, D) -> (B*KVH, nq=1, G*bt, D), token t of group g at row
    # g*bt + t
    qp = jnp.pad(q, ((0, 0), (0, bt - T), (0, 0), (0, 0)))
    qg = (
        qp.reshape(B, bt, KVH, G, D)
        .transpose(0, 2, 3, 1, 4)
        .reshape(B * KVH, 1, rows, D)
    )
    pos_tiled = jnp.pad(
        positions[:, None], ((0, 0), (0, 0), (0, bt - T))
    )  # (B, 1, bt); padded rows mask to empty (pos 0 < any visited j)
    # pre-gather the per-(token, sub-tile) visibility words by the load
    # table (clamped/padded entries masked in-kernel by the visit flag);
    # grid-step axis split out so each step's block is the full trailing
    # (bt, pair) extent — gather-then-transpose, NOT a broadcast gather
    # (see sparse_flash_mha: XLA materializes the broadcast operand)
    bvis_grid = jnp.take_along_axis(
        blockvis, load_idx[:, :, :, None, :], axis=-1
    )  # (B, KVH, 1, bt, ngrid)
    bvis = (
        bvis_grid.reshape(B * KVH, 1, bt, nsteps, pair)
        .transpose(0, 1, 3, 2, 4)
    )  # (B*KVH, 1, nsteps, bt, pair)

    def make_kv_index(p):
        def kv_index(i, qi, b, load_ref, visit_ref, limit_ref):
            return (i // KVH, layer, i % KVH,
                    load_ref[i * ngrid + b * pair + p], 0)
        return kv_index

    kv_specs = []
    kv_operands = []
    for p in range(pair):
        idx = make_kv_index(p)
        kv_specs += [pl.BlockSpec((1, 1, 1, bk, D), idx),
                     pl.BlockSpec((1, 1, 1, bk, D), idx)]
        kv_operands += [k_cache, v_cache]

    kernel = functools.partial(
        _sparse_kernel, scale=scale, g=G, bt=bt, emit_lse=True,
        kvh_per_slot=KVH, pair=pair,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B * KVH, 1, nsteps),
            in_specs=[
                pl.BlockSpec((1, 1, rows, D), lambda i, qi, b, *_: (i, 0, 0, 0)),
                pl.BlockSpec((1, 1, nsteps, bt, pair),
                             lambda i, qi, b, *_: (i, 0, 0, 0, 0)),
                pl.BlockSpec((1, 1, bt), lambda i, qi, b, *_: (i // KVH, 0, 0)),
                *kv_specs,
            ],
            out_specs=[
                pl.BlockSpec((1, 1, rows, D), lambda i, qi, b, *_: (i, 0, 0, 0)),
                pl.BlockSpec((1, 1, rows, 128), lambda i, qi, b, *_: (i, 0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * KVH, 1, rows, D), q.dtype),
            jax.ShapeDtypeStruct((B * KVH, 1, rows, 128), jnp.float32),
        ],
        interpret=interpret,
    )(
        load_idx.reshape(-1), visited.reshape(-1), lengths,
        qg, bvis, pos_tiled, *kv_operands,
    )

    out = (
        out.reshape(B, KVH, G, bt, D)
        .transpose(0, 3, 1, 2, 4)[:, :T]
        .reshape(B, T, H, D)
    )
    lse = (
        lse[..., 0].reshape(B, KVH, G, bt)
        .transpose(0, 3, 1, 2)[:, :T]
        .reshape(B, T, H)
    )
    return out, lse


def mha_sparse_slots(
    q, k_cache, v_cache, lengths, topk_idx, topk_valid, positions=None,
    *, layer: int, local_blocks: int, impl: str = "auto",
):
    """Slot-batched sparse-attention entry (engine.batch_engine decode and
    the batched sparse multi-token forward).

    ``q`` is (B, H, D) (decode: one token per slot, positions default to
    ``lengths``) or (B, T, H, D) with explicit ``positions`` (B, T).
    Pallas visit-table kernel on TPU; XLA materialized-block-mask fallback
    (per-slot vmap of ops.attention.mha_xla) for tests / non-TPU. History
    only — the caller LSE-merges the freshly projected rows. Returns
    (out, lse) with the same leading shape as ``q``.
    """
    decode_shaped = q.ndim == 3
    if decode_shaped:
        q = q[:, None]
        topk_idx = topk_idx if topk_idx.shape[2] == 1 else topk_idx[:, :, None]
        topk_valid = (topk_valid if topk_valid.shape[2] == 1
                      else topk_valid[:, :, None])
        positions = jnp.asarray(lengths, jnp.int32)[:, None]
    T = q.shape[1]
    d_ok = q.shape[-1] % 128 == 0 and \
        k_cache.shape[3] % (TUNE["decode_bk"] or BK_DECODE) == 0
    use_pallas = impl in ("flash", "auto") and (
        (impl == "flash" and jax.default_backend() != "tpu")  # interpret test
        or (jax.default_backend() == "tpu" and d_ok)
    )
    if use_pallas:
        out, lse = sparse_flash_mha_slots(
            q, k_cache, v_cache, lengths, topk_idx, topk_valid, positions,
            layer=layer, local_blocks=local_blocks,
        )
    else:
        from .attention import mha_xla
        from .sparse import bits_from_topk, block_visibility

        NB = k_cache.shape[3] // BLOCK

        def one(qb, kb, vb, lb, ib, vvb, pb):
            bits = bits_from_topk(ib, vvb, NB)
            bm = block_visibility(bits, pb, local_blocks=local_blocks)
            tm0 = jnp.zeros((T, T), jnp.bool_)  # hide new rows: history only
            o, l = mha_xla(qb, kb[layer], vb[layer], lb, tm0, bm,
                           return_lse=True)
            return o, l.T  # (T, H, D), (T, H)

        out, lse = jax.vmap(one)(
            q, k_cache, v_cache, lengths, topk_idx, topk_valid, positions
        )
    if decode_shaped:
        return out[:, 0], lse[:, 0]
    return out, lse
