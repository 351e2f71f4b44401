"""Sequence parallelism: KV cache sharded over the sequence dimension.

No reference counterpart — CPM.cu is single-GPU (SURVEY.md §2.9). This is
the TPU-native way to scale InfLLM-class long contexts past one chip's HBM:
each device owns a contiguous S/sp slab of every layer's KV cache, runs the
model replicated (weights broadcast), computes attention only against its
slab, and the partial results combine with the flash split-kv LSE merge as
collectives over the ``sp`` mesh axis (psum/pmax ride ICI). Attention FLOPs
and KV memory split sp-ways; per-chip context capacity multiplies by sp.

Shape of the implementation:
  * ``layers.attention.attention_block(sp_axis=...)`` — masked slab write +
    shift-invariant local causality (prior' = prior - slab_offset) + LSE
    combine;
  * ``sp_forward`` / ``sp_decode_segment`` — jitted shard_map wrappers over
    ``models.llama.forward`` (scan layers);
  * ``SeqParallelEngine`` — Engine with the cache S-sharded over the mesh
    and the KV budget scaled by sp.

v1 scope: dense models (no InfLLM selection across slabs yet), no
speculative tree masks, scan layer loop (the zero-copy unrolled decode path
is single-slab-indexed; adapting its kernels to slabs is future work).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cache.kv import KVCache
from ..core.config import EngineConfig, ModelConfig
from ..engine.engine import Engine
from ..models import llama
from ..ops.sampling import sample

AXIS_SP = "sp"


def create_sp_mesh(sp_size: int) -> Mesh:
    devs = np.asarray(jax.devices()[:sp_size])
    return Mesh(devs.reshape(sp_size), (AXIS_SP,))


def _kv_specs():
    return KVCache(k=P(None, None, AXIS_SP, None),
                   v=P(None, None, AXIS_SP, None), length=P())


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "logits_mode", "attn_impl"),
    donate_argnames=("cache",),
)
def sp_forward(
    cfg: ModelConfig, mesh: Mesh, params, rope, cache: KVCache,
    tokens, positions, logits_idx=None,
    *, logits_mode: str = "all", attn_impl: str = "auto",
):
    """One forward pass with the cache S-sharded over ``mesh``'s sp axis.

    Everything except attention computes replicated (identical on every
    device); attention is local-slab + LSE-psum, so the returned logits are
    bit-identical across devices (out_specs P(); vma checking off — the
    replication is established by the psum/pmax combine)."""
    from jax import shard_map

    def local(params, rope, cache, tokens, positions, logits_idx):
        return llama.forward.__wrapped__(
            cfg, params, rope, cache, tokens, positions, None, logits_idx,
            logits_mode=logits_mode, attn_impl=attn_impl, sp_axis=AXIS_SP,
        )

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), _kv_specs(), P(), P(), P()),
        out_specs=(P(), _kv_specs()),
        check_vma=False,
    )(params, rope, cache, tokens, positions,
      jnp.asarray(0 if logits_idx is None else logits_idx, jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "k", "temperature", "top_k", "top_p",
                     "attn_impl"),
    donate_argnames=("cache",),
)
def sp_decode_segment(
    cfg: ModelConfig, mesh: Mesh, params, rope, cache: KVCache,
    token, pos, key,
    *, k: int, temperature: float, top_k: int, top_p: float,
    attn_impl: str,
):
    """K fused decode steps over the S-sharded cache (engine.decode_segment
    analog). Sampling keys are replicated, so every device draws the same
    token."""
    from jax import shard_map

    def local(params, rope, cache, token, pos, key):
        def body(carry, _):
            cache, tok, p, key = carry
            logits, cache = llama.forward.__wrapped__(
                cfg, params, rope, cache, tok[None], p[None], None, None,
                logits_mode="all", attn_impl=attn_impl, sp_axis=AXIS_SP,
            )
            cache = cache.with_length(cache.length + 1)
            key, sub = jax.random.split(key)
            nxt = sample(logits[-1], sub, temperature=temperature,
                         top_k=top_k, top_p=top_p)
            return (cache, nxt, p + 1, key), nxt

        (cache, _, _, key), toks = jax.lax.scan(
            body, (cache, token, pos, key), None, length=k
        )
        return cache, toks, key

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), _kv_specs(), P(), P(), P()),
        out_specs=(_kv_specs(), P(), P()),
        check_vma=False,
    )(params, rope, cache, token, pos, key)


class SeqParallelEngine(Engine):
    """Engine with the KV cache sequence-sharded over an sp mesh.

    The KV budget scales by sp (weights are replicated; each chip only
    holds S/sp cache rows), so contexts larger than one chip's HBM fit.
    """

    def __init__(self, cfg: ModelConfig, eng: EngineConfig = EngineConfig(),
                 params=None, attn_impl: str = "auto",
                 sp_mesh: Optional[Mesh] = None):
        assert sp_mesh is not None and AXIS_SP in sp_mesh.shape
        assert not cfg.apply_sparse, "sp v1 is dense-only (see module doc)"
        self.sp_mesh = sp_mesh
        sp = sp_mesh.shape[AXIS_SP]
        super().__init__(cfg, eng, params, attn_impl, mesh=None)
        # re-create the cache: budget x sp, rounded so slabs are 512-aligned.
        # Allocate DIRECTLY with the sp sharding — materializing the
        # sp-times-larger zeros unsharded first would spike device 0 to
        # ~(1+sp)x the per-chip budget, exactly what sp exists to avoid —
        # and drop the base engine's single-chip cache before allocating.
        budget = self.max_total_length * sp
        budget = (budget + 512 * sp - 1) // (512 * sp) * (512 * sp)
        self.max_total_length = budget
        self.cache = None
        kv_sh = NamedSharding(sp_mesh, P(None, None, AXIS_SP, None))
        shape = (cfg.num_layers, cfg.num_kv_heads, budget, cfg.head_dim)
        self.cache = KVCache(
            k=jnp.zeros(shape, cfg.jnp_dtype, device=kv_sh),
            v=jnp.zeros(shape, cfg.jnp_dtype, device=kv_sh),
            length=jax.device_put(jnp.zeros((), jnp.int32),
                                  NamedSharding(sp_mesh, P())),
        )
        rep = NamedSharding(sp_mesh, P())
        self.params = jax.tree.map(lambda x: jax.device_put(x, rep),
                                   self.params)
        self.rope = jax.tree.map(lambda x: jax.device_put(x, rep), self.rope)
        # the base engine's rope table was sized for the single-chip budget
        if self.rope[0].shape[0] < budget + 8:
            self.rope = jax.tree.map(
                lambda x: jax.device_put(x, rep),
                llama.make_rope(cfg, budget),
            )

    def _forward(self, tokens, positions, tree_mask=None, logits_idx=None,
                 logits_mode="all"):
        assert tree_mask is None
        out, self.cache = sp_forward(
            self.cfg, self.sp_mesh, self.params, self.rope, self.cache,
            tokens, positions, logits_idx,
            logits_mode=logits_mode, attn_impl=self.attn_impl,
        )
        return out

    def _decode_segment_call(self, dev_token, dev_pos, k):
        # Engine._generate_stream's loop is reused verbatim; only the
        # fused-segment dispatch goes through the sp mesh
        return sp_decode_segment(
            self.cfg, self.sp_mesh, self.params, self.rope, self.cache,
            dev_token, dev_pos, self.key,
            k=k,
            temperature=self.eng.temperature,
            top_k=self.eng.top_k,
            top_p=self.eng.top_p,
            attn_impl=self.attn_impl,
        )
