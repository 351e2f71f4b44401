"""Chain (sequential) speculative decoding — the SpecMQuant drafter.

Counterpart of the reference's ``W4A16GMSpecW4A16GMImpl``
(src/model/spec_quant/w4a16_gm_spec_w4a16_gm.cuh:7-247): a full small model
(typically W4A16) autoregressively drafts ``num_iter`` tokens greedily; the
base model scores the chain in one pass; the longest matching prefix is
accepted (sequential uint16-mask verify, src/model/drafter.cuh:6-48).

TPU-native shape: the whole round — feed accepted tokens to the drafter,
draft ``num_iter`` tokens under ``lax.scan``, base chain decode, verify,
both KV rollbacks — is ONE jitted program; the reference instead replays a
separate CUDA graph per draft step plus three pybind crossings per round.

A chain is a degenerate tree (node i's parent is i-1), so verification and
KV fixup reuse the tree machinery with a lower-triangular ancestor mask; the
fixup's gather/scatter degenerates to in-place moves.
"""

from __future__ import annotations

import functools
import time
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cache.kv import KVCache
from ..core.config import EngineConfig, ModelConfig
from ..models import llama
from ..ops.sampling import sample
from ..spec.verify import fix_kv, verify_tree
from .engine import Engine


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "draft_cfg", "num_iter", "temperature", "top_k", "top_p",
        "attn_impl", "sparse_select", "defer_compress",
    ),
    donate_argnames=("cache", "dcache"),
)
def chain_spec_step(
    base_cfg: ModelConfig,
    draft_cfg: ModelConfig,
    params, dparams, rope, drope,
    cache: KVCache,
    dcache: KVCache,
    prev_tokens,  # (num_iter+1,) last round's accepted tokens (padded)
    num_prev,  # int32: valid rows of prev_tokens
    draft0,  # int32: newest accepted token (chain root)
    key,
    *, num_iter: int, temperature: float, top_k: int, top_p: float,
    attn_impl: str, sparse_select: bool = False, defer_compress: bool = False,
):
    """One draft->decode->verify round. Returns
    (emitted (num_iter+1,), accept_len, cache, dcache, key, path_logits)."""
    orig = cache.length
    dorig = dcache.length

    # 1. catch the drafter up on last round's accepted tokens (the
    #    reference's draft-model decode of the accepted chain,
    #    w4a16_gm_spec_w4a16_gm.cuh:154-170), then draft greedily.
    N1 = prev_tokens.shape[0]
    dpos = dorig + jnp.arange(N1, dtype=jnp.int32)
    dlogits, dcache = llama.forward(
        draft_cfg, dparams, drope, dcache, prev_tokens, dpos,
        logits_mode="all", attn_impl=attn_impl, unroll=True,
    )
    dcache = dcache.with_length(dorig + num_prev)

    def draft_one(carry, _):
        dcache, tok, pos = carry
        lg, dcache = llama.forward(
            draft_cfg, dparams, drope, dcache, tok[None], pos[None],
            logits_mode="all", attn_impl=attn_impl, unroll=True,
        )
        dcache = dcache.with_length(dcache.length + 1)
        nxt = jnp.argmax(lg[-1]).astype(jnp.int32)  # greedy top-1 draft
        return (dcache, nxt, pos + 1), nxt

    # seed from the logits row of the newest accepted token
    first = jnp.argmax(
        dlogits[jnp.clip(num_prev - 1, 0, N1 - 1)]
    ).astype(jnp.int32)
    (dcache, _, _), rest = jax.lax.scan(
        draft_one, (dcache, first, dcache.length), None, length=num_iter - 1
    )
    drafts = jnp.concatenate([first[None], rest])  # (num_iter,)

    # 2. base chain decode: [root, d1..dn] at positions orig..orig+n (causal)
    chain = jnp.concatenate([jnp.asarray(draft0, jnp.int32)[None], drafts])
    S = num_iter + 1
    positions = orig + jnp.arange(S, dtype=jnp.int32)
    logits, cache = llama.forward(
        base_cfg, params, rope, cache, chain, positions,
        logits_mode="all", attn_impl=attn_impl, sparse_select=sparse_select,
        unroll=True,
    )
    if temperature == 0.0:
        gt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        key, sub = jax.random.split(key)
        gt = sample(logits, sub, temperature=temperature, top_k=top_k, top_p=top_p)

    # 3. sequential verify == tree verify with the chain's triangular mask
    tree_parent = jnp.maximum(jnp.arange(S, dtype=jnp.int32) - 1, 0)
    tree_mask = jnp.tril(jnp.ones((S, S), jnp.bool_))
    accept_len, accept_pos, emitted = verify_tree(
        chain, gt, positions, tree_mask, tree_parent, orig
    )
    cache = fix_kv(cache, accept_pos, accept_len, orig,
                   defer_compress=defer_compress)
    # drafter rollback: accepted rows are already a contiguous prefix
    dcache = dcache.with_length(dorig + num_prev)

    path_logits = logits[accept_pos]
    return emitted, accept_len, cache, dcache, key, path_logits


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "draft_cfg", "k", "num_iter", "temperature", "top_k",
        "top_p", "attn_impl", "sparse_select",
    ),
    donate_argnames=("cache", "dcache"),
)
def chain_spec_segment(
    base_cfg, draft_cfg, params, dparams, rope, drope, cache, dcache,
    prev_tokens, num_prev, draft0, key,
    *, k: int, num_iter: int, temperature: float, top_k: int, top_p: float,
    attn_impl: str, sparse_select: bool = False,
):
    """K chain rounds fused into one device program — one host sync per K
    rounds instead of per round (the tunnel round-trip otherwise dominates:
    profiled ~75ms/round of host gap vs ~30ms device). Returns
    (emitted (k, num_iter+1), accept_lens (k,), cache, dcache, key)."""

    base_len = cache.length

    def body(carry, _):
        cache, dcache, prev, nprev, d0, key = carry
        emitted, alen, cache, dcache, key, _ = chain_spec_step.__wrapped__(
            base_cfg, draft_cfg, params, dparams, rope, drope, cache, dcache,
            prev, nprev, d0, key, num_iter=num_iter, temperature=temperature,
            top_k=top_k, top_p=top_p, attn_impl=attn_impl,
            sparse_select=sparse_select, defer_compress=True,
        )
        S = emitted.shape[0]
        nxt = emitted[jnp.clip(alen - 1, 0, S - 1)]
        new_prev = jnp.where(jnp.arange(S, dtype=jnp.int32) < alen, emitted, 0)
        return (cache, dcache, new_prev, alen, nxt, key), (emitted, alen)

    (cache, dcache, prev, nprev, root, key), (emitted, alens) = jax.lax.scan(
        body, (cache, dcache, prev_tokens, num_prev, draft0, key),
        None, length=k,
    )
    if hasattr(cache, "c1"):
        from ..cache.sparse_kv import compress_span

        cache = compress_span(cache, base_len, max_new=k * (num_iter + 1))
    # (prev, nprev, root) = next segment's inputs ON DEVICE (pipelining)
    return emitted, alens, cache, dcache, (prev, nprev, root), key


class ChainSpecEngine(Engine):
    """Engine with chain speculation (W4A16GMSpecW4A16GM analog; the draft
    model is any ModelConfig — quantized or dense)."""

    def __init__(
        self,
        cfg: ModelConfig,
        draft_cfg: ModelConfig,
        eng: EngineConfig = EngineConfig(),
        params=None,
        dparams=None,
        attn_impl: str = "auto",
        mesh=None,
    ):
        super().__init__(cfg, eng, params, attn_impl, mesh=mesh)
        assert not draft_cfg.apply_sparse
        self.draft_cfg = draft_cfg
        if dparams is not None and mesh is None:
            dparams = llama.fuse_projections(dparams)
        self.num_iter = max(eng.spec_num_iter, 1)
        budget = self.max_total_length + self.num_iter + 8
        self.drope = llama.make_rope(draft_cfg, budget)
        self.dcache = KVCache.create(draft_cfg, budget)
        if mesh is not None:
            # the draft model is a normal llama: shard it like the base
            from ..parallel.pspecs import shard_cache, shard_params

            if dparams is not None:
                dparams = shard_params(dparams, draft_cfg, mesh)
            self.dcache = shard_cache(self.dcache, mesh)
        self.dparams = dparams
        self.accept_lengths: List[int] = []
        self.last_path_logits = None
        self._prev_tokens = np.zeros((self.num_iter + 1,), np.int32)
        self._num_prev = 0

    # -- prefill: both models ------------------------------------------------

    def prefill(self, input_ids: Sequence[int], progress_callback=None):
        ids = list(input_ids)
        logits = super().prefill(ids, progress_callback)
        # draft-model prefill of the same prompt (chunked)
        C = self.eng.chunk_length
        arr = np.asarray(ids, np.int32)
        for i in range(0, len(arr), C):
            n = min(len(arr) - i, C)
            chunk = np.zeros((C,), np.int32)
            chunk[:n] = arr[i : i + n]
            pos = jnp.asarray(np.arange(i, i + C, dtype=np.int32))
            _, self.dcache = llama.forward(
                self.draft_cfg, self.dparams, self.drope, self.dcache,
                jnp.asarray(chunk), pos,
                logits_mode="none", attn_impl=self.attn_impl,
            )
            self.dcache = self.dcache.with_length(self.dcache.length + n)
        self._prev_tokens = np.zeros((self.num_iter + 1,), np.int32)
        self._num_prev = 0
        return logits

    # -- rounds ---------------------------------------------------------------

    def _spec_round(self, draft0: int):
        if self._num_prev == 0:
            # first round after prefill: only the sampled root is pending
            self._prev_tokens[0] = draft0
            self._num_prev = 1
        prev = np.asarray(self._prev_tokens, np.int32)
        (emitted, accept_len, self.cache, self.dcache, self.key,
         path_logits) = chain_spec_step(
            self.cfg, self.draft_cfg, self.params, self.dparams,
            self.rope, self.drope, self.cache, self.dcache,
            jnp.asarray(prev), jnp.asarray(self._num_prev, jnp.int32),
            jnp.asarray(draft0, jnp.int32), self.key,
            num_iter=self.num_iter,
            temperature=self.eng.temperature,
            top_k=self.eng.top_k,
            top_p=self.eng.top_p,
            attn_impl=self.attn_impl,
            sparse_select=self.sparse_engaged(),
        )
        n = int(accept_len)
        self.host_len += n
        self.last_path_logits = np.asarray(path_logits, np.float32)[:n]
        toks = np.asarray(emitted)[:n].tolist()
        # invariant: the drafter cache ends just before the pending tokens;
        # the tokens accepted this round (ending with the next root) are
        # what the next round's catch-up must ingest
        self._prev_tokens = np.zeros((self.num_iter + 1,), np.int32)
        self._prev_tokens[:n] = toks
        self._num_prev = n
        self._chain_dev = None  # host mirror is now the source of truth
        return toks, n

    def _round_rows(self) -> int:
        return self.num_iter + 1

    def _segment_ready(self) -> bool:
        return self._num_prev > 0

    def _dispatch_rounds(self, root, k: int):
        """Dispatch one fused K-round segment without fetching (pipelined
        segments — see spec_engine.SpecEngine._dispatch_rounds). The chain
        drafter's (prev_tokens, num_prev, root) inputs chain on device."""
        if getattr(self, "_chain_dev", None) is not None and root is None:
            prev, nprev, root_in = self._chain_dev
        else:
            prev = jnp.asarray(np.asarray(self._prev_tokens, np.int32))
            nprev = jnp.asarray(self._num_prev, jnp.int32)
            root_in = jnp.asarray(root, jnp.int32)
        emitted, alens, self.cache, self.dcache, chain_dev, self.key = (
            chain_spec_segment(
                self.cfg, self.draft_cfg, self.params, self.dparams,
                self.rope, self.drope, self.cache, self.dcache,
                prev, nprev, root_in, self.key,
                k=k, num_iter=self.num_iter,
                temperature=self.eng.temperature,
                top_k=self.eng.top_k,
                top_p=self.eng.top_p,
                attn_impl=self.attn_impl,
                sparse_select=self.sparse_engaged(),
            )
        )
        self._chain_dev = chain_dev
        self._root_dev = None  # sentinel: _dispatch_rounds(None) chains
        self.last_path_logits = None  # segment mode skips the parity rows
        packed = jnp.concatenate(
            [emitted, alens[:, None].astype(emitted.dtype)], axis=1
        )
        return packed, k

    def _consume_rounds(self, handle):
        from .spec_engine import SpecEngine as _S

        rounds = _S._consume_rounds(self, handle)
        # keep the host mirror current for the per-round fallback path
        toks, n = rounds[-1]
        self._prev_tokens = np.zeros((self.num_iter + 1,), np.int32)
        self._prev_tokens[:n] = toks
        self._num_prev = n
        return rounds

    def _spec_rounds(self, draft0: int, k: int):
        """K fused chain rounds, one blocking host sync."""
        return self._consume_rounds(self._dispatch_rounds(draft0, k))

    # streaming loop shared with SpecEngine
    from .spec_engine import SpecEngine as _S

    _generate_stream = _S._generate_stream
    _inflight_rounds = _S._inflight_rounds
    mean_accept_length = _S.mean_accept_length

    def reset(self):
        super().reset()
        self.dcache = self.dcache.with_length(0)
        self.accept_lengths = []
        self._prev_tokens = np.zeros((self.num_iter + 1,), np.int32)
        self._num_prev = 0
        self._chain_dev = None
        self._root_dev = None
        self._inflight = 0
