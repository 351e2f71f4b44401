"""Hierarchical speculation: EAGLE drafts for a small model, which chains
for the big model.

Counterpart of the reference's ``HierEagleW4A16GMSpecW4A16GMImpl``
(src/model/hier_spec_quant/hier_ea_w4a16_gm_spec_w4a16_gm.cuh:430-607):
an inner EAGLE-2 tree-speculation loop runs *against the small draft
model* (draft -> draft-model tree decode -> draft_verify with KV fixup),
repeating until at least ``min_draft_length`` chain tokens accumulate in
``draft_tmp``; the accumulated chain is then handed to the big model for
one sequential verify.

TPU-native composition: the inner loop is literally ``spec_engine.spec_step``
with the small model as its base (one jitted program per inner round); the
outer chain verify is one more jitted program. Host-side state is only the
accumulated chain and the accept bookkeeping — the reference instead
maintains a dozen device buffers and a four-way branch state machine
(draft()'s is_first_draft / num_prev==2 / draft_model_start cases), which
collapses here because the drafter's EagleState is rebuilt from a 1-token
catch-up pass each outer round.
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
from ..spec.eagle import EagleConfig, EagleState
from ..spec.verify import fix_kv, verify_tree
from .engine import Engine
from .spec_engine import SpecEngine, _embed, spec_step


@functools.partial(
    jax.jit,
    static_argnames=("draft_cfg", "ecfg", "attn_impl", "unroll"),
    donate_argnames=("dcache",),
)
def hier_catchup(
    draft_cfg: ModelConfig,
    ecfg: EagleConfig,
    dparams, drope,
    dcache: KVCache,
    ekv: KVCache,
    draft0,  # int32: the pending token (next chain root)
    *, attn_impl: str, unroll=True,
):
    """Feed the pending root through the draft model and build a fresh
    EagleState for the inner loop (replaces the reference's
    draft_model_start/num_prev branches, hier_ea...cuh:436-520).

    The forward is NOT committed: it only produces the root's draft-model
    hidden state for the drafter. The next spec_step's tree decode is the
    sole writer of the root's KV row, at this same position ``d0`` — a
    catch-up commit here would shift the root to d0+1 while the EagleState
    (pos0=d0) and the subsequent rollback accounting assume d0, silently
    corrupting the drafter's history (ADVICE.md round-1 finding)."""
    d0 = dcache.length
    tok = jnp.asarray(draft0, jnp.int32)[None]
    _, dcache, normed = llama.forward(
        draft_cfg, dparams, drope, dcache, tok, d0[None],
        logits_mode="none", attn_impl=attn_impl, return_hidden=True,
        unroll=unroll,
    )

    S = ecfg.tree_size
    H = draft_cfg.hidden_size
    emb = _embed(draft_cfg, dparams, tok)
    prev_embed = jnp.zeros((S, H), draft_cfg.jnp_dtype).at[0].set(emb[0])
    prev_hidden = jnp.zeros((S, H), draft_cfg.jnp_dtype).at[0].set(
        normed[0].astype(draft_cfg.jnp_dtype)
    )
    estate = EagleState(
        kv=ekv.with_length(d0),
        prev_embed=prev_embed,
        prev_hidden=prev_hidden,
        num_prev=jnp.asarray(1, jnp.int32),
        pos0=d0.astype(jnp.int32),
    )
    return dcache, estate


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "max_chain", "temperature", "top_k", "top_p",
        "attn_impl", "sparse_select", "defer_compress",
    ),
    donate_argnames=("cache",),
)
def hier_outer_verify(
    base_cfg: ModelConfig,
    params, rope,
    cache: KVCache,
    chain_tokens,  # (max_chain+1,) [root, d1..dm, pad...]
    n_valid,  # int32: 1 + m
    key,
    *, max_chain: int, temperature: float, top_k: int, top_p: float,
    attn_impl: str, sparse_select: bool = False, defer_compress: bool = False,
):
    """Big-model chain decode + sequential verify of the accumulated drafts
    (the reference's verify_seq_draft path, hier_ea...cuh:601-660).

    The chain's KV rows are deferred (llama.forward defer_kv_write) and the
    accepted rows written ONCE via commit_tree_rows — the write-then-compact
    sequence forces a whole-cache carry copy inside fused segments
    (round-2 profiling; see spec_engine._expand_and_verify)."""
    from ..cache.kv import commit_tree_rows

    orig = cache.length
    S = max_chain + 1
    positions = orig + jnp.arange(S, dtype=jnp.int32)
    # pad the chain decode to the quant kernel's M granularity once (the
    # per-call x pads otherwise repeat ~129x/round; see
    # spec_engine._expand_and_verify). Dummy rows sit at the root position
    # (causal history only) and are sliced off before verify.
    Sp = -(-S // 8) * 8
    if Sp != S:
        chain_f = jnp.pad(chain_tokens, (0, Sp - S))
        pos_f = jnp.pad(positions, (0, Sp - S), constant_values=0
                        ).at[S:].set(orig)
    else:
        chain_f, pos_f = chain_tokens, positions
    logits, cache, (k_pend, v_pend) = llama.forward(
        base_cfg, params, rope, cache, chain_f, pos_f,
        logits_mode="all", attn_impl=attn_impl, sparse_select=sparse_select,
        unroll=True, defer_kv_write=True,
    )
    if Sp != S:
        logits = logits[:S]
        k_pend = k_pend[:, :, :S]
        v_pend = v_pend[:, :, :S]
    if temperature == 0.0:
        gt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        key, sub = jax.random.split(key)
        gt = sample(logits, sub, temperature=temperature, top_k=top_k, top_p=top_p)

    # padding rows must never be accepted: poison their predictions
    idx = jnp.arange(S, dtype=jnp.int32)
    pred = jnp.where(idx < n_valid, chain_tokens, -1)
    tree_parent = jnp.maximum(idx - 1, 0)
    tree_mask = jnp.tril(jnp.ones((S, S), jnp.bool_))
    accept_len, accept_pos, emitted = verify_tree(
        pred, gt, positions, tree_mask, tree_parent, orig
    )
    cache = commit_tree_rows(
        cache, k_pend, v_pend, accept_pos, accept_len, orig,
        defer_compress=defer_compress,
    )
    path_logits = logits[accept_pos]
    return emitted, accept_len, cache, key, path_logits


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "draft_cfg", "ecfg", "inner_rounds", "max_chain",
        "temperature", "top_k", "top_p", "attn_impl", "sparse_select",
        "defer_compress", "inner_unroll",
    ),
    donate_argnames=("cache", "dcache", "ekv"),
)
def hier_fused_round(
    base_cfg: ModelConfig,
    draft_cfg: ModelConfig,
    ecfg: EagleConfig,
    params, rope, cache,
    dparams, eparams, drope,
    dcache: KVCache,
    ekv: KVCache,
    draft0, key,
    *, inner_rounds: int, max_chain: int, temperature: float, top_k: int,
    top_p: float, attn_impl: str, sparse_select: bool = False,
    defer_compress: bool = False,
    inner_unroll="scan",  # layer-loop mode for the DRAFT model's forwards
    # (catch-up + inner tree decodes): "scan" collapses the ~30 ops/layer
    # x 24 layers x ~(inner_rounds+1) forwards per outer round into one
    # scanned trace with dyn-layer kernels (the r3 hier profile counted
    # 4,032 quant matmuls + 11,508 rotary fusions per 12-round segment —
    # an in-program op floor, VERDICT r3 task 5). True = legacy unrolled.
):
    """One ENTIRE outer round in a single device program: catch-up +
    ``inner_rounds`` inner EAGLE spec rounds (lax.scan) + on-device chain
    assembly + big-model sequential verify + draft-cache rollback.

    The host-driven loop costs ~2 dispatches and 1 readback PER INNER ROUND
    (the reference pays the same in pybind calls); on a tunneled device the
    ~50-100ms round trips made hierarchical spec ~1.4 s/token. One fused
    program brings it to one dispatch + ONE packed readback per outer
    round. A fixed ``inner_rounds`` (each round accepts >= 1 token)
    replaces the host's while-len(chain)<min loop — the chain is clipped to
    ``max_chain`` either way and verify poisons padding rows.

    Returns (ints, cache, dcache, new_ekv, key, path_logits) where
    ``ints = [emitted(max_chain+1) | alens(inner_rounds) | accept_len]``
    packs every host-needed integer into one transfer.
    """
    from .spec_engine import spec_step

    S = ecfg.tree_size
    H = draft_cfg.hidden_size
    assert inner_rounds * S >= max_chain

    # 1. catch-up (ONE copy of the no-commit semantics — see its docstring)
    d0 = dcache.length  # pre-round draft length, for the step-5 rollback
    tok = jnp.asarray(draft0, jnp.int32)[None]
    dcache, estate = hier_catchup.__wrapped__(
        draft_cfg, ecfg, dparams, drope, dcache, ekv, draft0,
        attn_impl=attn_impl, unroll=inner_unroll,
    )

    # 2. fixed number of inner spec rounds (greedy inner: the drafter's
    #    chain is verified by the big model anyway)
    def body(carry, _):
        dcache, estate, dd0, key = carry
        emitted, alen, dcache, estate, key, _ = spec_step.__wrapped__(
            draft_cfg, ecfg, dparams, eparams, drope, dcache, estate, dd0,
            key, temperature=0.0, top_k=0, top_p=1.0, attn_impl=attn_impl,
            unroll=inner_unroll,
        )
        nxt = emitted[jnp.clip(alen - 1, 0, S - 1)]
        return (dcache, estate, nxt, key), (emitted, alen)

    (dcache, estate, _, key), (em, alens) = jax.lax.scan(
        body, (dcache, estate, tok[0], key), None, length=inner_rounds
    )

    # 3. on-device chain assembly: concatenate each round's accepted tokens
    CH = inner_rounds * S
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(alens)[:-1].astype(jnp.int32)]
    )
    posm = offs[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < alens[:, None]
    chain_flat = jnp.zeros((CH,), jnp.int32).at[
        jnp.where(valid, posm, CH)
    ].set(em, mode="drop")
    total = jnp.sum(alens).astype(jnp.int32)

    # 4. big-model sequential verify of [root | chain[:max_chain]]
    padded = jnp.concatenate(
        [jnp.asarray(draft0, jnp.int32)[None], chain_flat[:max_chain]]
    )
    n_valid = 1 + jnp.minimum(total, max_chain)
    emitted_o, accept_len, cache, key, path_logits = (
        hier_outer_verify.__wrapped__(
            base_cfg, params, rope, cache, padded, n_valid, key,
            max_chain=max_chain, temperature=temperature, top_k=top_k,
            top_p=top_p, attn_impl=attn_impl, sparse_select=sparse_select,
            defer_compress=defer_compress,
        )
    )

    # 5. draft-cache rollback (keep root + outer-accepted rows)
    dcache = dcache.with_length(d0 + accept_len)
    ints = jnp.concatenate(
        [emitted_o, alens.astype(jnp.int32), accept_len[None]]
    )
    return ints, cache, dcache, estate.kv, key, path_logits


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "draft_cfg", "ecfg", "k", "inner_rounds", "max_chain",
        "temperature", "top_k", "top_p", "attn_impl", "sparse_select",
        "inner_unroll",
    ),
    donate_argnames=("cache", "dcache", "ekv"),
)
def hier_segment(
    base_cfg: ModelConfig,
    draft_cfg: ModelConfig,
    ecfg: EagleConfig,
    params, rope, cache,
    dparams, eparams, drope,
    dcache: KVCache,
    ekv: KVCache,
    draft0, key,
    *, k: int, inner_rounds: int, max_chain: int, temperature: float,
    top_k: int, top_p: float, attn_impl: str, sparse_select: bool = False,
    inner_unroll="scan",
):
    """K fused outer rounds in ONE device program (the hier analog of
    spec_engine.spec_segment): the per-round dispatch + packed-readback sync
    otherwise dominates — round-2 profiling measured ~24 ms of device work
    inside an ~80 ms wall-clock round on the tunneled chip. Returns
    (ints (k, max_chain+1+inner_rounds+1), cache, dcache, ekv, root, key)
    where ``root`` is the next segment's draft0 ON DEVICE, so segment N+1
    can be dispatched before segment N's results are fetched."""
    base_len = cache.length

    def body(carry, _):
        cache, dcache, ekv, root, key = carry
        ints, cache, dcache, ekv, key, _ = hier_fused_round.__wrapped__(
            base_cfg, draft_cfg, ecfg, params, rope, cache,
            dparams, eparams, drope, dcache, ekv, root, key,
            inner_rounds=inner_rounds, max_chain=max_chain,
            temperature=temperature, top_k=top_k, top_p=top_p,
            attn_impl=attn_impl, sparse_select=sparse_select,
            defer_compress=True, inner_unroll=inner_unroll,
        )
        alen = ints[-1]
        root = ints[jnp.clip(alen - 1, 0, max_chain)]
        return (cache, dcache, ekv, root, key), ints

    (cache, dcache, ekv, root, key), ints = jax.lax.scan(
        body, (cache, dcache, ekv, draft0, key), None, length=k
    )
    if hasattr(cache, "c1"):
        # one compress for the whole segment (in-scan compress ping-pongs
        # the whole cache; see engine.decode_segment / spec_segment)
        from ..cache.sparse_kv import compress_span

        cache = compress_span(cache, base_len, max_new=k * (max_chain + 1))
    return ints, cache, dcache, ekv, root, key


class HierSpecEngine(Engine):
    """Two-level speculation: big model <- chain <- small model <- EAGLE."""

    def __init__(
        self,
        cfg: ModelConfig,
        draft_cfg: ModelConfig,
        ecfg: EagleConfig,
        eng: EngineConfig = EngineConfig(),
        params=None,
        dparams=None,
        eparams=None,
        attn_impl: str = "auto",
        min_draft_length: int = 8,
        mesh=None,
        inner_unroll="scan",  # draft-model layer loop inside the fused
        # round: "scan" (dyn-layer kernels, one trace — the op-count fix
        # for the r3 hier dispatch floor) or True (legacy unrolled; bench
        # --hier-unroll A/B)
    ):
        super().__init__(cfg, eng, params, attn_impl, mesh=mesh)
        assert not draft_cfg.apply_sparse
        self.min_draft_length = min_draft_length
        self.inner_unroll = inner_unroll
        self.max_chain = min_draft_length + ecfg.tree_size
        # fused-round inner count: enough rounds that even all-accepts can
        # fill max_chain (min_draft_length=1 needs 2 rounds: 1 round's
        # tree_size tokens < max_chain = 1 + tree_size)
        self.inner_rounds = max(
            min_draft_length, -(-self.max_chain // ecfg.tree_size)
        )
        # the inner engine owns the draft model + EAGLE drafter state; under
        # a mesh the draft model shards like any llama (SpecEngine mesh=)
        inner_eng = eng
        self.inner = SpecEngine(
            draft_cfg, ecfg, inner_eng, dparams, eparams, attn_impl=attn_impl,
            mesh=mesh,
        )
        self.accept_lengths: List[int] = []
        self.inner_accept_lengths: List[int] = []
        self.last_path_logits = None

    # -- prefill both models ---------------------------------------------------

    def prefill(self, input_ids: Sequence[int], progress_callback=None):
        ids = list(input_ids)
        logits = super().prefill(ids, progress_callback)
        self.inner.prefill(ids)  # draft-model + eagle-lag chunked prefill
        self._fresh = True
        return logits

    # -- outer round -------------------------------------------------------------

    def _assert_inner_sync(self):
        # outer and inner host mirrors advance together at round boundaries;
        # the shared emit() overshoot rollback restores only the OUTER
        # cache/host_len, so a violated invariant means a caller ran rounds
        # on a just-finished engine without reset() — fail loudly instead of
        # silently corrupting the inner KV (ADVICE r3)
        assert self.inner.host_len == self.host_len, (
            f"hier inner/outer length skew ({self.inner.host_len} vs "
            f"{self.host_len}): call reset() + prefill() before running "
            "more rounds on a finished engine")

    def _spec_round(self, draft0: int):
        self._assert_inner_sync()
        ecfg = self.inner.ecfg
        dcfg = self.inner.cfg
        # rollback base: the host mirror (inner.host_len) tracks the inner
        # cache length exactly — int(self.inner.cache.length) would BLOCK on
        # the previous fused round's device completion (one tunnel RTT/round)
        d_start = int(self.inner.host_len)

        if self._fresh:
            # the inner engine's prefill-lag state must flush first
            # (spec_step_first equivalent): run the first round through the
            # host-driven path below.
            return self._spec_round_host(draft0, d_start)

        # fused path: catch-up + inner rounds + chain + outer verify in ONE
        # device program, ONE packed readback (see hier_fused_round)
        k_inner = self.inner_rounds
        ints, self.cache, self.inner.cache, ekv, self.key, path_logits = (
            hier_fused_round(
                self.cfg, dcfg, ecfg,
                self.params, self.rope, self.cache,
                self.inner.params, self.inner.eparams, self.inner.rope,
                self.inner.cache, self.inner.estate.kv,
                jnp.asarray(draft0, jnp.int32), self.key,
                inner_rounds=k_inner,
                max_chain=self.max_chain,
                temperature=self.eng.temperature,
                top_k=self.eng.top_k,
                top_p=self.eng.top_p,
                attn_impl=self.attn_impl,
                sparse_select=self.sparse_engaged(),
                inner_unroll=self.inner_unroll,
            )
        )
        import dataclasses as _dc

        self.inner.estate = _dc.replace(self.inner.estate, kv=ekv)
        ints = np.asarray(ints)  # the ONE device->host transfer
        emitted = ints[: self.max_chain + 1]
        alens = ints[self.max_chain + 1 : self.max_chain + 1 + k_inner]
        n = int(ints[-1])
        self.inner_accept_lengths.extend(int(a) for a in alens)
        self.host_len += n
        self.inner.host_len = d_start + n
        # device array; consumers (tools/logits_parity) fetch lazily
        self.last_path_logits = path_logits[:n]
        return emitted[:n].tolist(), n

    def _spec_round_host(self, draft0: int, d_start: int):
        """Host-driven outer round (first round after prefill only): the
        inner engine's own path flushes its prefill-lag state."""
        inner_toks, inner_n = self.inner._spec_round(draft0)
        self._fresh = False
        chain: List[int] = list(inner_toks)
        self.inner_accept_lengths.append(inner_n)

        # keep drafting with inner EAGLE rounds until the chain is long
        # enough (hier_ea...cuh:525-585 while cur_draft_length < min)
        while len(chain) < self.min_draft_length:
            t, n = self.inner._spec_round(chain[-1])
            self.inner_accept_lengths.append(n)
            chain.extend(t)
        chain = chain[: self.max_chain]

        # big-model sequential verify of [root] + chain
        padded = np.zeros((self.max_chain + 1,), np.int32)
        padded[0] = draft0
        padded[1 : 1 + len(chain)] = chain
        emitted, accept_len, self.cache, self.key, path_logits = (
            hier_outer_verify(
                self.cfg, self.params, self.rope, self.cache,
                jnp.asarray(padded), jnp.asarray(1 + len(chain), jnp.int32),
                self.key,
                max_chain=self.max_chain,
                temperature=self.eng.temperature,
                top_k=self.eng.top_k,
                top_p=self.eng.top_p,
                attn_impl=self.attn_impl,
                sparse_select=self.sparse_engaged(),
            )
        )
        n = int(accept_len)
        self.host_len += n

        # draft-model rollback: the draft cache holds
        # [prompt | root@d_start | chain[0..] ] — keep the root plus the
        # n-1 outer-accepted drafted tokens (= d_start + n rows); the bonus
        # token stays pending (its row is written by the next round's
        # tree decode, see hier_catchup)
        dlen = d_start + n
        self.inner.cache = self.inner.cache.with_length(dlen)
        self.inner.host_len = dlen

        self.last_path_logits = np.asarray(path_logits, np.float32)[:n]
        toks = np.asarray(emitted)[:n].tolist()
        return toks, n

    def _round_rows(self) -> int:
        # chain verify pads to the quant kernel's M granularity (deferred
        # writes commit only accepted rows, but keep the guard conservative)
        return -(-(self.max_chain + 1) // 8) * 8

    # -- fused outer-round segments (hier_segment) ---------------------------

    def _segment_ready(self) -> bool:
        if self._fresh:
            return False
        # the inner (draft) cache also grows by <= max_chain+1 committed rows
        # per outer round, plus inner_rounds*tree_size scratch rows inside
        # the program — the shared loop's capacity guard only covers the
        # OUTER cache, so gate segments on inner headroom here
        seg = max(1, getattr(self.eng, "spec_segment_size", 1))
        need = (
            (seg + self._inflight_rounds()) * (self.max_chain + 1)
            + self.inner_rounds * self.inner.ecfg.tree_size + 8
        )
        return self.inner.host_len + need <= self.inner.cache.max_length

    def _dispatch_rounds(self, root, k: int):
        """Dispatch one fused K-outer-round segment WITHOUT fetching results
        (pipelined segments: the packed-readback tunnel RTT overlaps segment
        N+1's device execution — see SpecEngine._dispatch_rounds)."""
        self._assert_inner_sync()
        import dataclasses as _dc

        ints, self.cache, self.inner.cache, ekv, root_out, self.key = (
            hier_segment(
                self.cfg, self.inner.cfg, self.inner.ecfg,
                self.params, self.rope, self.cache,
                self.inner.params, self.inner.eparams, self.inner.rope,
                self.inner.cache, self.inner.estate.kv,
                jnp.asarray(root, jnp.int32), self.key,
                k=k,
                inner_rounds=self.inner_rounds,
                max_chain=self.max_chain,
                temperature=self.eng.temperature,
                top_k=self.eng.top_k,
                top_p=self.eng.top_p,
                attn_impl=self.attn_impl,
                sparse_select=self.sparse_engaged(),
                inner_unroll=self.inner_unroll,
            )
        )
        self.inner.estate = _dc.replace(self.inner.estate, kv=ekv)
        self._root_dev = root_out
        return ints, k

    def _consume_rounds(self, handle):
        ints, k = handle
        ints = np.asarray(ints)  # (k, max_chain+1 + inner_rounds + 1)
        # hier_segment discards per-round path logits — invalidate rather
        # than leave a stale earlier round around (ADVICE r2). NOTE on the
        # shared emit() overshoot rollback: it restores only the OUTER
        # cache/host_len; the inner drafter cache/host_len stay ahead for
        # discarded rounds. That is safe because reset()+prefill is
        # mandatory between generates — do NOT call _spec_round(s) on a
        # just-finished engine without reset() (timing scripts included).
        self.last_path_logits = None
        rounds = []
        for r in range(k):
            emitted = ints[r, : self.max_chain + 1]
            alens = ints[r, self.max_chain + 1 : -1]
            n = int(ints[r, -1])
            self.inner_accept_lengths.extend(int(a) for a in alens)
            self.host_len += n
            self.inner.host_len += n
            rounds.append((emitted[:n].tolist(), n))
        return rounds

    def _inflight_rounds(self) -> int:
        return getattr(self, "_inflight", 0)

    def _spec_rounds(self, draft0: int, k: int):
        """K fused outer rounds, ONE blocking host sync (hier_segment)."""
        return self._consume_rounds(self._dispatch_rounds(draft0, k))

    # streaming loop shared with SpecEngine
    _generate_stream = SpecEngine._generate_stream
    mean_accept_length = SpecEngine.mean_accept_length

    def mean_inner_accept_length(self) -> float:
        if not self.inner_accept_lengths:
            return 0.0
        return float(np.mean(self.inner_accept_lengths))

    def reset(self):
        super().reset()
        self.inner.reset()
        self.accept_lengths = []
        self.inner_accept_lengths = []
        self._fresh = True
        self._inflight = 0
