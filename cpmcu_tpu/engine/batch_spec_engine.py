"""Batched EAGLE-2 speculation: continuous batching × tree drafting.

The tree-drafter counterpart of engine.batch_chain_engine (the reference's
EAGLE engines are batch-size-1, SURVEY.md §2.6/§2.9): each scheduler round,
every active slot grows its own draft tree (spec.eagle_batch), the base
model tree-decodes all slots' trees in ONE (B*tree_size)-row forward with
per-slot tree masks (engine.batch_engine.batch_forward_tokens), each slot
verifies greedily and compacts its accepted rows in its own cache lane
(vmapped cache.kv.compact). Admission reuses the single-sequence spec
machinery on slot-lane views (spec_prefill_chunk / spec_step_first), so the
lagged draft prefill and first-round semantics are bit-identical to
SpecEngine. Rounds are pipelined one deep: the next round's EagleState and
root return on device and feed round N+1 before round N's readback.

Dense-only (like batch_chain_engine): the sparse+spec stack stays on the
single-sequence SpecEngine.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..cache.kv import KVCache, compact
from ..core.config import EngineConfig, ModelConfig
from ..models import llama
from ..ops.sampling import sample
from ..spec.eagle import EagleConfig, eagle_fc
from ..spec.eagle_batch import eagle_batch_draft, eagle_batch_layers
from ..spec.verify import verify_tree
from .batch_engine import (
    BatchKVCache,
    ContinuousBatchingEngine,
    Request,
    StepEvent,
    batch_forward_tokens,
)
from .spec_engine import spec_prefill_chunk, spec_step_first


def _lane(a, slot):
    return jnp.squeeze(jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0), 0)


def _put(a, x, slot):
    return jax.lax.dynamic_update_slice_in_dim(a, x[None], slot, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "ecfg", "attn_impl"),
    donate_argnames=("bcache", "dbcache", "pend_embed", "pend_hidden"),
)
def spec_admit_chunk_slots(
    cfg: ModelConfig, ecfg: EagleConfig, params, eparams, rope,
    bcache: BatchKVCache, dbcache: BatchKVCache,
    slot, chunk_tokens, positions, n_valid,
    pend_embed, pend_hidden, pend_valid, ehist,
    *, attn_impl: str,
):
    """One admission prefill chunk on the slot's base+drafter lane views
    (base chunk forward + lagged draft prefill — spec_engine
    spec_prefill_chunk semantics, bit-identical)."""
    lane_b = KVCache(_lane(bcache.k, slot), _lane(bcache.v, slot),
                     bcache.lengths[slot])
    lane_d = KVCache(_lane(dbcache.k, slot), _lane(dbcache.v, slot),
                     jnp.asarray(ehist, jnp.int32))
    (logits, lane_b, lane_d, new_pend_embed, normed, new_pend_valid,
     new_ehist) = spec_prefill_chunk.__wrapped__(
        cfg, ecfg, params, eparams, rope, lane_b, lane_d,
        chunk_tokens, positions, n_valid, n_valid - 1,
        pend_embed, pend_hidden, pend_valid, ehist,
        attn_impl=attn_impl,
    )
    bcache = dataclasses.replace(
        bcache, k=_put(bcache.k, lane_b.k, slot),
        v=_put(bcache.v, lane_b.v, slot),
        lengths=bcache.lengths.at[slot].add(n_valid),
    )
    dbcache = dataclasses.replace(
        dbcache, k=_put(dbcache.k, lane_d.k, slot),
        v=_put(dbcache.v, lane_d.v, slot),
    )
    return (bcache, dbcache, logits, new_pend_embed, normed,
            new_pend_valid, new_ehist)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "ecfg", "temperature", "top_k", "top_p",
                     "attn_impl"),
    donate_argnames=("bcache", "dbcache", "pend_embed", "pend_hidden"),
)
def spec_admit_first_slots(
    cfg: ModelConfig, ecfg: EagleConfig, params, eparams, rope,
    bcache: BatchKVCache, dbcache: BatchKVCache,
    slot, pend_embed, pend_hidden, pend_valid, ehist, draft0, key,
    *, temperature: float, top_k: int, top_p: float, attn_impl: str,
):
    """The slot's first spec round after prefill (spec_step_first on lane
    views): draft-prefill the final pending chunk, expand, verify. Returns
    the emitted tokens plus the slot's EagleState pieces for the stacked
    per-slot state."""
    lane_b = KVCache(_lane(bcache.k, slot), _lane(bcache.v, slot),
                     bcache.lengths[slot])
    lane_d = KVCache(_lane(dbcache.k, slot), _lane(dbcache.v, slot),
                     jnp.asarray(ehist, jnp.int32))
    emitted, accept_len, lane_b, estate, key, _ = spec_step_first.__wrapped__(
        cfg, ecfg, params, eparams, rope, lane_b, lane_d,
        pend_embed, pend_hidden, pend_valid, ehist, draft0, key,
        temperature=temperature, top_k=top_k, top_p=top_p,
        attn_impl=attn_impl,
    )
    bcache = dataclasses.replace(
        bcache, k=_put(bcache.k, lane_b.k, slot),
        v=_put(bcache.v, lane_b.v, slot),
        lengths=bcache.lengths.at[slot].set(lane_b.length),
    )
    dbcache = dataclasses.replace(
        dbcache, k=_put(dbcache.k, estate.kv.k, slot),
        v=_put(dbcache.v, estate.kv.v, slot),
    )
    return (bcache, dbcache, emitted, accept_len,
            estate.prev_embed, estate.prev_hidden, estate.num_prev,
            estate.pos0, key)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "ecfg", "temperature", "top_k", "top_p",
                     "attn_impl"),
    donate_argnames=("bcache", "dbcache", "est_embed", "est_hidden"),
)
def batch_spec_round(
    cfg: ModelConfig,
    ecfg: EagleConfig,
    params, eparams, rope, drope,
    bcache: BatchKVCache,
    dbcache: BatchKVCache,
    est_embed,  # (B, S, H) per-slot accepted-token embeddings (padded)
    est_hidden,  # (B, S, H) per-slot accepted base hidden rows
    est_nprev,  # (B,) valid rows
    est_pos0,  # (B,) drafter position of row 0
    draft0,  # (B,) newest accepted token per slot
    active,  # (B,) bool
    key,
    *,
    temperature: float, top_k: int, top_p: float, attn_impl: str,
):
    """One batched EAGLE round: drafter catch-up -> per-slot tree expansion
    -> ONE base tree decode over all slots -> per-slot verify + in-lane
    compaction. Returns (emitted (B, S), accept_lens (B,), bcache, dbcache,
    next (est_embed, est_hidden, est_nprev, est_pos0, root) on device,
    key)."""
    from ..layers.modules import embedding

    B, S, H = est_embed.shape

    # 1. drafter catch-up on last round's accepted rows (spec_step's
    #    eagle_layers pass), persisted at each slot's pos0
    x = eagle_fc(ecfg, eparams, est_embed, est_hidden)
    positions = est_pos0[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
    tril = jnp.broadcast_to(
        jnp.tril(jnp.ones((S, S), jnp.bool_))[None], (B, S, S)
    )
    h, own_k, own_v = eagle_batch_layers(
        ecfg, eparams, x, positions, dbcache.k, dbcache.v, est_pos0, drope,
        mask=tril, region=None, attn_impl=attn_impl,
    )

    def wr(kslot, vslot, kn, vn, p):
        return (
            jax.lax.dynamic_update_slice(
                kslot, kn.astype(kslot.dtype), (0, 0, p, 0)),
            jax.lax.dynamic_update_slice(
                vslot, vn.astype(vslot.dtype), (0, 0, p, 0)),
        )

    dk, dv = jax.vmap(wr)(dbcache.k, dbcache.v, own_k, own_v, est_pos0)
    dbcache = dataclasses.replace(dbcache, k=dk, v=dv)
    h_root = h[jnp.arange(B), jnp.clip(est_nprev - 1, 0, S - 1)]

    # 2. per-slot tree expansion (lockstep)
    orig = bcache.lengths
    tree_tokens, tree_pos, tree_mask, tree_parent = eagle_batch_draft(
        ecfg, cfg, eparams, params, drope, dbcache.k, dbcache.v,
        h_root, orig, attn_impl=attn_impl,
    )
    tree_tokens = tree_tokens.at[:, 0].set(draft0.astype(jnp.int32))

    # 3. ONE base tree decode for all slots (per-slot masks/positions)
    bk, bv, logits, normed = batch_forward_tokens(
        cfg, params, rope, bcache, tree_tokens, attn_impl=attn_impl,
        positions=tree_pos, tree_mask=tree_mask, return_hidden=True,
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

    # 4. per-slot verify + in-lane compaction of the accepted rows
    alen, apos, emitted = jax.vmap(verify_tree)(
        tree_tokens, gt, tree_pos, tree_mask, tree_parent, orig
    )
    alen = jnp.where(active, alen, 0)

    def cpt(kb, vb, ap, al, ob):
        c = compact(KVCache(kb, vb, ob), ap, al, ob)
        return c.k, c.v

    nk, nv = jax.vmap(cpt)(bk, bv, apos, alen, orig)
    bcache = dataclasses.replace(bcache, k=nk, v=nv, lengths=orig + alen)

    # 5. next round's EagleState (on device, for pipelined dispatch)
    emb = embedding(
        params["embed"], emitted.reshape(-1), cfg.scale_emb, cfg.jnp_dtype
    ).reshape(B, S, H)
    hid = jnp.take_along_axis(normed, apos[..., None], axis=1).astype(
        est_hidden.dtype
    )
    root = emitted[jnp.arange(B), jnp.clip(alen - 1, 0, S - 1)]
    return emitted, alen, bcache, dbcache, (emb, hid, alen, orig, root), key


class BatchSpecEngine(ContinuousBatchingEngine):
    """Continuous batching with per-slot EAGLE-2 tree speculation.

    Sampling: verification uses the ENGINE-default temperature for all
    slots (like the single-sequence spec engines); per-request temperatures
    apply to the admission-time first token only.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        ecfg: EagleConfig,
        eng: EngineConfig = EngineConfig(),
        params=None,
        eparams=None,
        *,
        max_batch: int = 8,
        attn_impl: str = "auto",
        mesh=None,
    ):
        assert not cfg.apply_sparse, (
            "batched EAGLE is dense-only; the sparse+spec stack runs on the "
            "single-sequence SpecEngine"
        )
        assert ecfg.window == 0, (
            "sliding-window draft attention is not supported in the batched "
            "engine yet (per-slot lower bounds need a windowed slot kernel)"
        )
        super().__init__(cfg, eng, params, max_batch=max_batch,
                         attn_impl=attn_impl, mesh=mesh)
        self.ecfg = ecfg
        S = ecfg.tree_size
        # arena slack: tree rows [len, len+S) before compaction; drafter
        # catch-up writes S rows at pos0 and the expansion carry never
        # lands, but the lagged admission prefill reaches ehist+C
        pad = (max(S, ecfg.topk_per_iter * ecfg.num_iter) + 8 + 127) \
            // 128 * 128
        # carve the drafter arena out of the solved KV budget and release
        # the parent's arena before reallocating (no transient 2x peak)
        dm = ecfg.model
        f = (dm.num_layers * dm.num_kv_heads * dm.head_dim
             * jnp.dtype(dm.jnp_dtype).itemsize) / (
            cfg.num_layers * cfg.num_kv_heads * cfg.head_dim
            * jnp.dtype(cfg.jnp_dtype).itemsize)
        self.slot_budget = max(128, int(self.slot_budget / (1 + f))
                               // 128 * 128)
        self.bcache = None
        self.arena_budget = self.slot_budget + pad + self.eng.chunk_length
        self.bcache = BatchKVCache.create(cfg, max_batch, self.arena_budget)
        self.rope = llama.make_rope(cfg, self.arena_budget)
        self.dbcache = BatchKVCache.create(
            ecfg.model, max_batch, self.arena_budget
        )
        self.drope = llama.make_rope(ecfg.model, self.arena_budget)
        if eparams is not None and "layers" in eparams:
            eparams = dict(eparams)
            eparams.update(
                llama.fuse_projections({"layers": eparams["layers"]})
            )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.pspecs import shard_cache

            self.bcache = shard_cache(self.bcache, mesh)
            # drafter params + arena replicate (small, like SpecEngine)
            rep = NamedSharding(mesh, P())
            if eparams is not None:
                eparams = jax.tree.map(lambda x: jax.device_put(x, rep),
                                       eparams)
            self.dbcache = jax.tree.map(
                lambda x: jax.device_put(x, rep), self.dbcache
            )
        self.eparams = eparams
        Hd = cfg.hidden_size
        self._est_embed = jnp.zeros((max_batch, S, Hd), cfg.jnp_dtype)
        self._est_hidden = jnp.zeros((max_batch, S, Hd), cfg.jnp_dtype)
        self._est_nprev = jnp.zeros((max_batch,), jnp.int32)
        self._est_pos0 = jnp.zeros((max_batch,), jnp.int32)
        self.accept_lengths: List[int] = []

    # -- admission ---------------------------------------------------------------

    def _admit(self, events: List[StepEvent]):
        """Admission with the spec prefill: base chunks + lagged draft
        prefill on the slot's lane views, then the slot's first spec round
        (both bit-identical to the single-sequence SpecEngine)."""
        C = self.eng.chunk_length
        Hd = self.cfg.hidden_size
        while self.waiting and self.free_slots:
            req = self.waiting.popleft()
            slot = self.free_slots.pop(0)
            req.slot = slot
            self.bcache = dataclasses.replace(
                self.bcache, lengths=self.bcache.lengths.at[slot].set(0),
            )
            ids = np.asarray(req.prompt_ids, np.int32)
            pend_embed = jnp.zeros((C, Hd), self.cfg.jnp_dtype)
            pend_hidden = jnp.zeros((C, Hd), self.cfg.jnp_dtype)
            pend_valid = jnp.asarray(0, jnp.int32)
            ehist = jnp.asarray(0, jnp.int32)
            logits = None
            for i in range(0, len(ids), C):
                n = min(len(ids) - i, C)
                chunk = np.zeros((C,), np.int32)
                chunk[:n] = ids[i : i + n]
                pos = np.arange(i, i + C, dtype=np.int32)
                (self.bcache, self.dbcache, logits, pend_embed, pend_hidden,
                 pend_valid, ehist) = spec_admit_chunk_slots(
                    self.cfg, self.ecfg, self.params, self.eparams,
                    self.rope, self.bcache, self.dbcache,
                    jnp.asarray(slot, jnp.int32),
                    jnp.asarray(chunk), jnp.asarray(pos),
                    jnp.asarray(n, jnp.int32),
                    pend_embed, pend_hidden, pend_valid, ehist,
                    attn_impl=self.attn_impl,
                )
            self._host_lengths[slot] = len(ids)
            self.key, sub = jax.random.split(self.key)
            t, tk, tp = self._req_sampling(req)
            from ..ops.sampling import sample_per_row

            logits = logits.reshape(-1)  # (V,)
            tok = int(sample_per_row(
                logits[None].astype(jnp.float32), sub,
                jnp.asarray([t], jnp.float32), jnp.asarray([tk], jnp.int32),
                jnp.asarray([tp], jnp.float32),
            )[0])
            import time as _time

            req.first_token_time = _time.time()
            self._tokens[slot] = tok
            req.emitted = 1
            done = tok in req.terminators or req.max_new_tokens <= 1
            events.append(StepEvent(req.request_id, tok, done))
            if done:
                req.done = True
                self.free_slots.append(slot)
                continue
            self.active[slot] = req

            # first spec round on the slot's lanes
            (self.bcache, self.dbcache, emitted, accept_len, p_embed,
             p_hidden, n_prev, pos0, self.key) = spec_admit_first_slots(
                self.cfg, self.ecfg, self.params, self.eparams, self.rope,
                self.bcache, self.dbcache, jnp.asarray(slot, jnp.int32),
                pend_embed, pend_hidden, pend_valid, ehist,
                jnp.asarray(tok, jnp.int32), self.key,
                temperature=self.eng.temperature, top_k=self.eng.top_k,
                top_p=self.eng.top_p, attn_impl=self.attn_impl,
            )
            self._est_embed = self._est_embed.at[slot].set(p_embed)
            self._est_hidden = self._est_hidden.at[slot].set(
                p_hidden.astype(self._est_hidden.dtype))
            self._est_nprev = self._est_nprev.at[slot].set(n_prev)
            self._est_pos0 = self._est_pos0.at[slot].set(pos0)
            emitted = np.asarray(emitted)
            n = int(accept_len)
            self.accept_lengths.append(n)
            kept = 0
            for j in range(n):
                tk2 = int(emitted[j])
                self._tokens[slot] = tk2
                req.emitted += 1
                kept = j + 1
                done = (tk2 in req.terminators
                        or req.emitted >= req.max_new_tokens)
                events.append(StepEvent(req.request_id, tk2, done))
                if done:
                    req.done = True
                    del self.active[slot]
                    self.free_slots.append(slot)
                    break
            self._host_lengths[slot] = len(ids) + kept
            if kept < n:
                # truncated first round: next catch-up ingests kept rows
                self._est_nprev = self._est_nprev.at[slot].set(kept)

    # -- rounds --------------------------------------------------------------------

    def _dispatch_round(self, chain_dev=None):
        active_mask = np.zeros((self.max_batch,), bool)
        for slot in self.active:
            active_mask[slot] = True
        if chain_dev is None:
            est = (self._est_embed, self._est_hidden, self._est_nprev,
                   self._est_pos0, jnp.asarray(self._tokens))
        else:
            est = chain_dev
        emb, hid, nprev, pos0, root = est
        (emitted, alens, self.bcache, self.dbcache, est_out, self.key) = (
            batch_spec_round(
                self.cfg, self.ecfg, self.params, self.eparams,
                self.rope, self.drope, self.bcache, self.dbcache,
                emb, hid, nprev, pos0, root,
                jnp.asarray(active_mask), self.key,
                temperature=self.eng.temperature, top_k=self.eng.top_k,
                top_p=self.eng.top_p, attn_impl=self.attn_impl,
            )
        )
        (self._est_embed, self._est_hidden, self._est_nprev,
         self._est_pos0, _root) = est_out
        packed = jnp.concatenate(
            [emitted, alens[:, None].astype(emitted.dtype)], axis=1
        )
        return {"packed": packed, "slots": dict(self.active),
                "chain": est_out}

    def _process_round(self, handle, events: List[StepEvent]):
        packed = np.asarray(handle["packed"])  # the one sync
        emitted, alens = packed[:, :-1], packed[:, -1]
        finished = []
        truncated = {}
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
            if kept < n:
                truncated[slot] = kept
        for slot in finished:
            if slot in self.active:
                del self.active[slot]
            self.free_slots.append(slot)
        # truncated slots only matter if they keep running (they don't:
        # truncation implies done), so no estate fixup is needed here
        return truncated

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
                self._admit(events)
                note(events)
                if self.active:
                    pend = self._dispatch_round()
                continue
            chain = self.active and not (self.waiting and self.free_slots)
            nxt = (self._dispatch_round(chain_dev=pend["chain"])
                   if chain else None)
            self._process_round(pend, events)
            note(events)
            pend = nxt
        self._reconcile_lengths()
        return out

    def mean_accept_length(self) -> float:
        return (float(np.mean(self.accept_lengths))
                if self.accept_lengths else 0.0)

    def step(self) -> List[StepEvent]:
        """Admit + advance every active slot by one speculative round
        (1..tree-path tokens each) — the serving backend's pump unit."""
        events: List[StepEvent] = []
        self._reconcile_lengths()
        self._admit(events)
        if self.active:
            self._process_round(self._dispatch_round(), events)
        return events

    def step_segment(self, k) -> List[StepEvent]:
        """One round per call (pipelining lives in run())."""
        return self.step()
