"""Batched chain speculation: continuous batching × speculative decoding.

Composes the two scale-out layers the reference keeps separate (its
speculative engines are strictly batch-size-1, SURVEY.md §2.6/§2.9): every
active slot runs one SpecMQuant-style chain round per scheduler step — the
draft model autoregressively proposes ``num_iter`` tokens per slot in
lockstep, the base model scores all slots' chains in ONE (B*(num_iter+1))-row
forward, and each slot accepts its greedy-longest prefix (sequential verify,
engine.chain_engine). Chains are in-place (node i's parent is i-1), so the
per-slot KV fixup is a pure length commit — no gather/scatter.

Scheduler semantics match ContinuousBatchingEngine: slots advance unevenly
(per-slot accept lengths), finishes roll back by length only, admission
prefills the base AND draft arenas through the chunked slot path. Rounds
are pipelined like the dense engine's segments: round N+1 dispatches with
the (prev, nprev, root) chain state returned on device before round N's
readback, so the tunnel RTT overlaps device execution.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EngineConfig, ModelConfig
from ..models import llama
from ..ops.sampling import sample
from ..spec.verify import verify_tree
from .engine import chunk_width
from .batch_engine import (
    BatchKVCache,
    ContinuousBatchingEngine,
    Request,
    StepEvent,
    batch_forward_tokens,
    prefill_slot_chunk,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "dcfg", "num_iter", "temperature", "top_k", "top_p",
        "attn_impl",
    ),
    donate_argnames=("bcache", "dbcache"),
)
def batch_chain_round(
    cfg: ModelConfig,
    dcfg: ModelConfig,
    params, dparams, rope, drope,
    bcache: BatchKVCache,
    dbcache: BatchKVCache,
    prev: jax.Array,  # (B, num_iter+1) last round's accepted tokens (padded)
    nprev: jax.Array,  # (B,) valid rows of prev
    draft0: jax.Array,  # (B,) newest accepted token per slot (chain root)
    active: jax.Array,  # (B,) bool
    key: jax.Array,
    *,
    num_iter: int,
    temperature: float,
    top_k: int,
    top_p: float,
    attn_impl: str,
):
    """One batched draft->decode->verify round (chain_spec_step × slots).

    Returns (emitted (B, S), accept_lens (B,), bcache, dbcache,
    (prev, nprev, root) device chain state for pipelining, key)."""
    B, N1 = prev.shape
    S = num_iter + 1

    # 1. drafter catch-up on last round's accepted tokens, then draft.
    dorig = dbcache.lengths
    dk, dv, dlogits = batch_forward_tokens(
        dcfg, dparams, drope, dbcache, prev, attn_impl=attn_impl
    )
    dbcache = dataclasses.replace(
        dbcache, k=dk, v=dv,
        lengths=jnp.where(active, dorig + nprev, dorig),
    )
    first = jnp.argmax(
        dlogits[jnp.arange(B), jnp.clip(nprev - 1, 0, N1 - 1)], axis=-1
    ).astype(jnp.int32)

    def draft_one(carry, _):
        dbc, tok = carry
        k1, v1, lg = batch_forward_tokens(
            dcfg, dparams, drope, dbc, tok[:, None], attn_impl=attn_impl
        )
        dbc = dataclasses.replace(
            dbc, k=k1, v=v1,
            lengths=jnp.where(active, dbc.lengths + 1, dbc.lengths),
        )
        nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        return (dbc, nxt), nxt

    (dbcache, _), rest = jax.lax.scan(
        draft_one, (dbcache, first), None, length=num_iter - 1
    )
    drafts = jnp.concatenate([first[:, None], rest.T], axis=1)  # (B, n_iter)

    # 2. base chain decode: one (B*S)-row forward for all slots
    chain = jnp.concatenate([draft0[:, None], drafts], axis=1)  # (B, S)
    orig = bcache.lengths
    bk, bv, logits = batch_forward_tokens(
        cfg, params, rope, bcache, chain, attn_impl=attn_impl
    )
    if temperature == 0.0:
        gt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        key, sub = jax.random.split(key)
        V = logits.shape[-1]
        gt = sample(
            logits.reshape(B * S, V), sub,
            temperature=temperature, top_k=top_k, top_p=top_p,
        ).reshape(B, S)

    # 3. per-slot sequential verify (chain == triangular tree); the chain's
    #    accepted rows are already contiguous at [orig, orig+alen), so the
    #    KV fixup is a pure per-slot length commit.
    tree_parent = jnp.maximum(jnp.arange(S, dtype=jnp.int32) - 1, 0)
    tree_mask = jnp.tril(jnp.ones((S, S), jnp.bool_))

    def ver(ch, g, ob):
        pos = ob + jnp.arange(S, dtype=jnp.int32)
        return verify_tree(ch, g, pos, tree_mask, tree_parent, ob)

    alen, _apos, emitted = jax.vmap(ver)(chain, gt, orig)
    alen = jnp.where(active, alen, 0)
    bcache = dataclasses.replace(
        bcache, k=bk, v=bv, lengths=orig + alen,
    )
    # drafter rollback: drop the drafted rows past the committed catch-up
    dbcache = dataclasses.replace(
        dbcache, lengths=jnp.where(active, dorig + nprev, dorig),
    )

    # next round's chain state ON DEVICE (pipelined dispatch)
    new_prev = jnp.where(
        jnp.arange(S, dtype=jnp.int32)[None] < alen[:, None], emitted, 0
    )
    root = emitted[jnp.arange(B), jnp.clip(alen - 1, 0, S - 1)]
    return emitted, alen, bcache, dbcache, (new_prev, alen, root), key


class BatchChainSpecEngine(ContinuousBatchingEngine):
    """Continuous batching with per-slot chain speculation.

    ``run()`` advances all active slots by one speculative round per
    dispatch (1..num_iter+1 tokens each), pipelined one round deep. The
    greedy output per request is identical to the plain batched engine
    (speculation is lossless) — accept length only changes throughput.

    Sampling: verification uses the ENGINE-default temperature for all
    slots (like the single-sequence spec engines); per-request temperatures
    apply to the admission-time first token only.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        draft_cfg: ModelConfig,
        eng: EngineConfig = EngineConfig(),
        params=None,
        dparams=None,
        *,
        max_batch: int = 8,
        attn_impl: str = "auto",
        mesh=None,
    ):
        assert not draft_cfg.apply_sparse
        super().__init__(cfg, eng, params, max_batch=max_batch,
                         attn_impl=attn_impl, mesh=mesh)
        self.draft_cfg = draft_cfg
        self.num_iter = max(eng.spec_num_iter, 1)
        S = self.num_iter + 1
        # re-create the base arena with chain overshoot slack: a round
        # writes S rows past the committed length; without the pad the
        # clamped dynamic_update_slice near capacity would overwrite a
        # continuing slot's committed rows
        pad = (S + 8 + 127) // 128 * 128
        # the drafter arena costs f x the base row per token: carve it out
        # of the solved KV budget instead of allocating past it, and drop
        # the parent's arena BEFORE the re-alloc (a transient 2x KV
        # footprint would defeat the budget solve on a real chip)
        f = (draft_cfg.num_layers * draft_cfg.num_kv_heads
             * draft_cfg.head_dim * jnp.dtype(draft_cfg.jnp_dtype).itemsize
             ) / (cfg.num_layers * cfg.num_kv_heads * cfg.head_dim
                  * jnp.dtype(cfg.jnp_dtype).itemsize)
        self.slot_budget = max(128, int(self.slot_budget / (1 + f))
                               // 128 * 128)
        self.bcache = None
        if cfg.apply_sparse:
            # sparse chain: InfLLM-v2 selection per slot/token inside the
            # base chain decode (batch_forward_tokens sparse branch); the
            # drafter stays dense like the reference's SpecMQuant pairing
            from ..cache.batch_sparse_kv import BatchSparseKVCache

            self.arena_budget = (self.slot_budget + pad + 511) // 512 * 512
            self.bcache = BatchSparseKVCache.create(
                cfg, max_batch, self.arena_budget
            )
        else:
            self.arena_budget = self.slot_budget + pad
            self.bcache = BatchKVCache.create(
                cfg, max_batch, self.arena_budget
            )
        self.rope = llama.make_rope(cfg, self.arena_budget)
        self.dbcache = BatchKVCache.create(
            draft_cfg, max_batch, self.arena_budget
        )
        self.drope = llama.make_rope(draft_cfg, self.arena_budget)
        if dparams is not None and mesh is None:
            dparams = llama.fuse_projections(dparams)
        if mesh is not None:
            from ..parallel.pspecs import shard_cache, shard_params

            self.bcache = shard_cache(self.bcache, mesh)
            self.dbcache = shard_cache(self.dbcache, mesh)
            if dparams is not None:
                dparams = shard_params(dparams, draft_cfg, mesh)
        self.dparams = dparams
        # per-slot chain state (host mirrors; device copies chain between
        # pipelined rounds)
        self._prev = np.zeros((max_batch, S), np.int32)
        self._nprev = np.zeros((max_batch,), np.int32)
        self.accept_lengths: List[int] = []

    # -- admission -------------------------------------------------------------

    def _on_admitted(self, req: Request, slot: int, prompt_ids, first_token):
        # drafter slot prefill of the same prompt (chunked, dense)
        C = self.eng.chunk_length
        ids = np.asarray(prompt_ids, np.int32)
        self.dbcache = dataclasses.replace(
            self.dbcache, lengths=self.dbcache.lengths.at[slot].set(0),
        )
        i = 0
        while i < len(ids):
            n = min(len(ids) - i, C)
            cw = chunk_width(n, C)
            chunk = np.zeros((cw,), np.int32)
            chunk[:n] = ids[i : i + n]
            pos = np.arange(i, i + cw, dtype=np.int32)
            self.dbcache, _ = prefill_slot_chunk(
                self.draft_cfg, self.dparams, self.drope, self.dbcache,
                jnp.asarray(slot, jnp.int32),
                jnp.asarray(chunk), jnp.asarray(pos),
                jnp.asarray(n, jnp.int32), attn_impl=self.attn_impl,
            )
            i += n
        # first round after prefill: only the sampled root is pending
        self._prev[slot] = 0
        self._prev[slot, 0] = first_token
        self._nprev[slot] = 1

    # -- rounds ------------------------------------------------------------------

    def _dispatch_round(self, chain_dev=None):
        """Dispatch one batched chain round WITHOUT fetching. ``chain_dev``
        pipelines the previous round's device (prev, nprev, root)."""
        active_mask = np.zeros((self.max_batch,), bool)
        for slot in self.active:
            active_mask[slot] = True
        if chain_dev is None:
            prev = jnp.asarray(self._prev)
            nprev = jnp.asarray(self._nprev)
            root = jnp.asarray(self._tokens)
        else:
            prev, nprev, root = chain_dev
        (emitted, alens, self.bcache, self.dbcache, chain_out, self.key) = (
            batch_chain_round(
                self.cfg, self.draft_cfg, self.params, self.dparams,
                self.rope, self.drope, self.bcache, self.dbcache,
                prev, nprev, root, jnp.asarray(active_mask), self.key,
                num_iter=self.num_iter,
                temperature=self.eng.temperature, top_k=self.eng.top_k,
                top_p=self.eng.top_p, attn_impl=self.attn_impl,
            )
        )
        # ONE packed readback per round
        packed = jnp.concatenate(
            [emitted, alens[:, None].astype(emitted.dtype)], axis=1
        )
        return {"packed": packed, "slots": dict(self.active),
                "chain": chain_out}

    def _process_round(self, handle, events: List[StepEvent]):
        packed = np.asarray(handle["packed"])  # the one sync
        emitted, alens = packed[:, :-1], packed[:, -1]
        finished = []
        for slot, req in handle["slots"].items():
            if req.done:
                continue
            n = int(alens[slot])
            self.accept_lengths.append(n)
            kept = 0
            for j in range(n):
                tok = int(emitted[slot, j])
                self._tokens[slot] = tok
                req.emitted += 1
                kept = j + 1
                done = (tok in req.terminators
                        or req.emitted >= req.max_new_tokens)
                events.append(StepEvent(req.request_id, tok, done))
                if done:
                    req.done = True
                    finished.append(slot)
                    break
            self._host_lengths[slot] += kept
            # next round's catch-up must ingest exactly the kept tokens
            self._prev[slot] = 0
            self._prev[slot, :kept] = emitted[slot, :kept]
            self._nprev[slot] = kept
        for slot in finished:
            if slot in self.active:
                del self.active[slot]
            self.free_slots.append(slot)

    def run(self) -> Dict[int, List[int]]:
        """Drain the queue via pipelined speculative rounds."""
        out: Dict[int, List[int]] = {}

        def note(events):
            for ev in events:
                out.setdefault(ev.request_id, [])
                if ev.token not in self._terminators_of(ev.request_id):
                    out[ev.request_id].append(ev.token)

        pend = None
        while self.has_work or pend is not None:
            events: List[StepEvent] = []
            if pend is None:
                self._reconcile_lengths()
                self._compress_uncommitted()
                self._admit(events)
                note(events)
                if self.active:
                    pend = self._dispatch_round()
                continue
            # sparse slots drain every round (the compression commit must
            # land between rounds, batch_engine.run semantics)
            chain = (self.active and not (self.waiting and self.free_slots)
                     and not self.cfg.apply_sparse)
            nxt = (self._dispatch_round(chain_dev=pend["chain"])
                   if chain else None)
            self._process_round(pend, events)  # overlaps nxt on device
            note(events)
            pend = nxt
        self._reconcile_lengths()
        return out

    def mean_accept_length(self) -> float:
        return (float(np.mean(self.accept_lengths))
                if self.accept_lengths else 0.0)

    def _compress_span_bound(self) -> int:
        # a speculative round commits up to num_iter+1 rows per slot
        return max(1, self.eng.decode_segment_size, self.num_iter + 1)

    def step(self) -> List[StepEvent]:
        """Admit + advance every active slot by one speculative round
        (1..num_iter+1 tokens each) — the serving backend's pump unit."""
        events: List[StepEvent] = []
        self._reconcile_lengths()
        self._compress_uncommitted()
        self._admit(events)
        if self.active:
            self._process_round(self._dispatch_round(), events)
        return events

    def step_segment(self, k) -> List[StepEvent]:
        """One round per call (a speculative round already advances up to
        num_iter+1 tokens; pipelining lives in run())."""
        return self.step()
