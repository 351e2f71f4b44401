"""Speculative generation engine (EAGLE-2 tree drafting).

Python owns only the accept bookkeeping (one small host readback per spec
step, like the reference's accept-length sync, eagle.cuh:496-497); draft
tree expansion + base tree decode + verification + KV fixup all run in ONE
jitted program per step — the reference needs three pybind round trips and
a CUDA-graph replay for the same work (tree_drafter.py:119-136).
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
from ..spec.eagle import (
    EagleConfig,
    EagleState,
    eagle_draft,
    eagle_fc,
    eagle_layers,
)
from ..spec.verify import fix_kv, verify_tree
from .engine import Engine


def _embed(base_cfg: ModelConfig, params, ids):
    from ..layers.modules import embedding

    return embedding(params["embed"], jnp.atleast_1d(jnp.asarray(ids)),
                     base_cfg.scale_emb, base_cfg.jnp_dtype)


def _expand_and_verify(
    base_cfg, ecfg, params, eparams, rope, cache, ekv, h_root, draft0, key,
    *, temperature, top_k, top_p, attn_impl, sparse_select=False, kv_span=None,
    unroll=False, defer_compress=False,
):
    orig = cache.length
    tree_tokens, tree_pos, tree_mask, tree_parent, ekv = eagle_draft(
        ecfg, base_cfg, eparams, params, rope, ekv, h_root, orig, attn_impl,
        kv_span=kv_span,
    )
    tree_tokens = tree_tokens.at[0].set(jnp.asarray(draft0, jnp.int32))

    # pad the tree decode to the quant kernel's M granularity ONCE: at the
    # default tree_size 12 every one of the ~129 quant matmuls otherwise
    # pads its x operand 12->16 itself (129 pad ops + boundary copies,
    # ~0.5 ms/round in the round-3 trace). Dummy rows attend only
    # themselves (plus causal history) and are discarded before verify.
    S = ecfg.tree_size
    Sp = -(-S // 8) * 8
    if Sp != S:
        pad = Sp - S
        tree_tokens_f = jnp.pad(tree_tokens, (0, pad))
        tree_pos_f = jnp.pad(tree_pos, (0, pad),
                             constant_values=0) .at[S:].set(tree_pos[0])
        eye_pad = jnp.zeros((Sp, Sp), jnp.bool_).at[
            jnp.arange(S, Sp), jnp.arange(S, Sp)].set(True)
        tree_mask_f = jnp.pad(tree_mask, ((0, pad), (0, pad))) | eye_pad
    else:
        tree_tokens_f, tree_pos_f, tree_mask_f = (
            tree_tokens, tree_pos, tree_mask)

    if unroll:
        # deferred tree-KV write: verify first, then ONE permuted in-place
        # write of the accepted rows (cache.kv.commit_tree_rows) — the
        # write-then-compact sequence forced a whole-cache carry copy in
        # fused segments (round-2 profiling)
        logits, cache, normed, (k_pend, v_pend) = llama.forward(
            base_cfg, params, rope, cache, tree_tokens_f, tree_pos_f,
            tree_mask_f, logits_mode="all", attn_impl=attn_impl,
            sparse_select=sparse_select, return_hidden=True, kv_span=kv_span,
            unroll=unroll, defer_kv_write=True,
        )
        if Sp != S:
            logits = logits[:S]
            normed = normed[:S]
            k_pend = k_pend[:, :, :S]
            v_pend = v_pend[:, :, :S]
    else:
        logits, cache, normed = llama.forward(
            base_cfg, params, rope, cache, tree_tokens_f, tree_pos_f,
            tree_mask_f, logits_mode="all", attn_impl=attn_impl,
            sparse_select=sparse_select, return_hidden=True, kv_span=kv_span,
        )
        if Sp != S:
            logits = logits[:S]
            normed = normed[:S]
    if temperature == 0.0:
        gt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        key, sub = jax.random.split(key)
        gt = sample(logits, sub, temperature=temperature, top_k=top_k, top_p=top_p)

    accept_len, accept_pos, emitted = verify_tree(
        tree_tokens, gt, tree_pos, tree_mask, tree_parent, orig
    )
    if unroll:
        from ..cache.kv import commit_tree_rows

        cache = commit_tree_rows(
            cache, k_pend, v_pend, accept_pos, accept_len, orig,
            defer_compress=defer_compress,
        )
    else:
        cache = fix_kv(cache, accept_pos, accept_len, orig,
                       defer_compress=defer_compress)

    estate = EagleState(
        kv=ekv.with_length(orig),
        prev_embed=_embed(base_cfg, params, emitted),
        prev_hidden=normed[accept_pos],
        num_prev=accept_len,
        pos0=orig.astype(jnp.int32),
    )
    # fp32 logits rows behind the emitted tokens (accepted path), for the
    # logits-parity harness (examples/logits_comparison_direct.py analog)
    path_logits = logits[accept_pos]
    return emitted, accept_len, cache, estate, key, path_logits


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "ecfg", "temperature", "top_k", "top_p", "attn_impl",
        "sparse_select", "kv_span", "unroll",
    ),
    # pend_embed/pend_hidden trigger XLA's "donated buffers were not
    # usable" warning at production shapes (bf16[2048,4096] x2, every
    # round's bench tail): their replacement outputs (new_pend_embed, the
    # base forward's normed hidden) come out of fusions whose TPU tiled
    # layouts don't alias the inputs, so XLA copies instead. Cost bound:
    # 2 x 16 MB extra HBM writes per ~1 s prefill chunk (~40 us, 0.004%)
    # — measured-irrelevant. Donation stays on: it IS usable at other
    # shapes (tiny-shape CPU repro aliases cleanly), and an unusable
    # donation degrades to exactly the no-donation copy.
    donate_argnames=("cache", "ekv", "pend_embed", "pend_hidden"),
)
def spec_prefill_chunk(
    base_cfg: ModelConfig,
    ecfg: EagleConfig,
    params, eparams, rope,
    cache: KVCache,
    ekv: KVCache,
    chunk_tokens, positions, n_valid, logits_idx,
    pend_embed, pend_hidden, pend_valid, ehist,
    *, temperature=0.0, top_k=0, top_p=1.0, attn_impl="auto",
    sparse_select: bool = False, kv_span=None, unroll: bool = False,
):
    """Base prefill chunk + lagged draft prefill of the previous chunk
    (reference prefill lag: eagle.cuh:409-427)."""
    C = chunk_tokens.shape[0]
    emb_cur = _embed(base_cfg, params, chunk_tokens)

    logits, cache, normed = llama.forward(
        base_cfg, params, rope, cache, chunk_tokens, positions,
        logits_idx=logits_idx, logits_mode="index",
        attn_impl=attn_impl, sparse_select=sparse_select, return_hidden=True,
        kv_span=kv_span,
    )

    # draft-prefill the pending chunk; its missing last embed row is the
    # current chunk's first token (eagle_prefill's memcpy, eagle.cuh:386)
    pe = pend_embed.at[jnp.clip(pend_valid - 1, 0, C - 1)].set(emb_cur[0])
    x = eagle_fc(ecfg, eparams, pe, pend_hidden)
    epos = ehist + jnp.arange(C, dtype=jnp.int32)
    _, ekv = eagle_layers(
        ecfg, eparams, x, epos, ekv, rope,
        prior=ehist, write_at=ehist, attn_impl=attn_impl, kv_span=kv_span,
    )

    new_pend_embed = jnp.zeros_like(pend_embed).at[: C - 1].set(emb_cur[1:])
    return (
        logits, cache, ekv,
        new_pend_embed, normed, n_valid, ehist + pend_valid,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "ecfg", "temperature", "top_k", "top_p", "attn_impl",
        "sparse_select", "kv_span", "unroll",
    ),
    donate_argnames=("cache", "ekv", "pend_embed", "pend_hidden"),
)
def spec_step_first(
    base_cfg, ecfg, params, eparams, rope, cache, ekv,
    pend_embed, pend_hidden, pend_valid, ehist, draft0, key,
    *, temperature, top_k, top_p, attn_impl, sparse_select: bool = False,
    kv_span=None, unroll: bool = False,
):
    """First draft after prefill: draft-prefill the final pending chunk with
    draft0's embedding appended, then expand/verify (eagle.cuh:434-438)."""
    C = pend_embed.shape[0]
    emb0 = _embed(base_cfg, params, jnp.asarray(draft0, jnp.int32)[None])[0]
    pe = pend_embed.at[jnp.clip(pend_valid - 1, 0, C - 1)].set(emb0)
    x = eagle_fc(ecfg, eparams, pe, pend_hidden)
    epos = ehist + jnp.arange(C, dtype=jnp.int32)
    h, ekv = eagle_layers(
        ecfg, eparams, x, epos, ekv, rope,
        prior=ehist, write_at=ehist, attn_impl=attn_impl, kv_span=kv_span,
    )
    h_root = h[jnp.clip(pend_valid - 1, 0, C - 1)]
    return _expand_and_verify(
        base_cfg, ecfg, params, eparams, rope, cache, ekv, h_root, draft0, key,
        temperature=temperature, top_k=top_k, top_p=top_p, attn_impl=attn_impl,
        sparse_select=sparse_select, kv_span=kv_span, unroll=unroll,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "ecfg", "temperature", "top_k", "top_p", "attn_impl",
        "sparse_select", "kv_span", "unroll", "defer_compress",
    ),
    donate_argnames=("cache", "estate"),
)
def spec_step(
    base_cfg, ecfg, params, eparams, rope, cache, estate: EagleState, draft0, key,
    *, temperature, top_k, top_p, attn_impl, sparse_select: bool = False,
    kv_span=None, unroll: bool = False, defer_compress: bool = False,
):
    """One draft -> tree-decode -> verify round (eagle_decode path)."""
    S = ecfg.tree_size
    x = eagle_fc(ecfg, eparams, estate.prev_embed, estate.prev_hidden)
    positions = estate.pos0 + jnp.arange(S, dtype=jnp.int32)
    h, ekv = eagle_layers(
        ecfg, eparams, x, positions, estate.kv, rope,
        prior=estate.pos0, write_at=estate.pos0, attn_impl=attn_impl,
        kv_span=kv_span,
    )
    h_root = h[jnp.clip(estate.num_prev - 1, 0, S - 1)]
    return _expand_and_verify(
        base_cfg, ecfg, params, eparams, rope, cache, ekv, h_root, draft0, key,
        temperature=temperature, top_k=top_k, top_p=top_p, attn_impl=attn_impl,
        sparse_select=sparse_select, kv_span=kv_span, unroll=unroll,
        defer_compress=defer_compress,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "ecfg", "k", "temperature", "top_k", "top_p", "attn_impl",
        "sparse_select", "kv_span", "unroll",
    ),
    donate_argnames=("cache", "estate"),
)
def spec_segment(
    base_cfg, ecfg, params, eparams, rope, cache, estate: EagleState,
    draft0, key,
    *, k: int, temperature, top_k, top_p, attn_impl,
    sparse_select: bool = False, kv_span=None, unroll: bool = False,
):
    """K spec rounds fused into one device program (the speculative analog
    of engine.decode_segment): host syncs once per K rounds instead of per
    round — on a tunneled device the accept-length readback RTT otherwise
    dominates the step time. Returns (emitted (k, S), accept_lens (k,),
    cache, estate, root, key) where ``root`` is the next segment's draft0
    ON DEVICE — the host can dispatch segment N+1 before fetching segment
    N's results (pipelined segments hide the readback RTT entirely)."""

    base_len = cache.length

    def body(carry, _):
        cache, estate, d0, key = carry
        emitted, alen, cache, estate, key, _ = spec_step.__wrapped__(
            base_cfg, ecfg, params, eparams, rope, cache, estate, d0, key,
            temperature=temperature, top_k=top_k, top_p=top_p,
            attn_impl=attn_impl, sparse_select=sparse_select, kv_span=kv_span,
            unroll=unroll, defer_compress=True,
        )
        nxt = emitted[jnp.clip(alen - 1, 0, emitted.shape[0] - 1)]
        return (cache, estate, nxt, key), (emitted, alen)

    (cache, estate, root, key), (emitted, alens) = jax.lax.scan(
        body, (cache, estate, draft0, key), None, length=k
    )
    if hasattr(cache, "c1"):
        # one compress for the whole segment (in-scan compress ping-pongs
        # the cache; see engine.decode_segment)
        from ..cache.sparse_kv import compress_span

        cache = compress_span(cache, base_len, max_new=k * ecfg.tree_size)
    return emitted, alens, cache, estate, root, key


class SpecEngine(Engine):
    """Engine with EAGLE-2 tree speculation (LLM_with_eagle analog)."""

    def __init__(
        self,
        cfg: ModelConfig,
        ecfg: EagleConfig,
        eng: EngineConfig = EngineConfig(),
        params=None,
        eparams=None,
        attn_impl: str = "auto",
        mesh=None,  # shard the BASE model over (dp, tp); the drafter is
        # small (one layer), so its params and KV replicate across the mesh
        # — no cross-chip collective in the tree expansion (SURVEY §5.8)
    ):
        super().__init__(cfg, eng, params, attn_impl, mesh=mesh)
        self.ecfg = ecfg
        if eparams is not None and "layers" in eparams:
            eparams = dict(eparams)
            eparams.update(llama.fuse_projections({"layers": eparams["layers"]}))
        # draft KV: base budget + expansion scratch slack
        self.ekv = KVCache.create(
            ecfg.model, self.max_total_length + 128, ecfg.model.num_layers
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            if eparams is not None:
                eparams = jax.tree.map(
                    lambda x: jax.device_put(x, rep), eparams
                )
            self.ekv = jax.tree.map(
                lambda x: jax.device_put(x, rep), self.ekv
            )
        self.eparams = eparams
        C = eng.chunk_length
        H = cfg.hidden_size
        self._reset_pending(C, H)
        self.estate = None
        self.accept_lengths: List[int] = []

    def _reset_pending(self, C, H):
        dt = self.cfg.jnp_dtype
        self.pend_embed = jnp.zeros((C, H), dt)
        self.pend_hidden = jnp.zeros((C, H), dt)
        self.pend_valid = jnp.zeros((), jnp.int32)
        self.ehist = jnp.zeros((), jnp.int32)

    # -- prefill (chunked, with draft lag) ----------------------------------

    def prefill(self, input_ids: Sequence[int], progress_callback=None):
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        total = ids.size
        if total + self.ecfg.tree_size > self.max_total_length:
            raise ValueError(
                f"Input token count ({total}) exceeds maximum supported length "
                f"({self.max_total_length}) under current memory limit"
            )
        C = self.eng.chunk_length
        t0 = time.time()
        if progress_callback:
            progress_callback("begin", {"total_tokens": total})
        self.host_len = int(self.cache.length)
        logits = None
        for i in range(0, total, C):
            n = min(total - i, C)
            chunk = np.zeros((C,), np.int32)
            chunk[:n] = ids[i : i + n]
            pos = np.arange(i, i + C, dtype=np.int32)
            (logits, self.cache, self.ekv,
             self.pend_embed, self.pend_hidden, self.pend_valid, self.ehist) = (
                spec_prefill_chunk(
                    self.cfg, self.ecfg, self.params, self.eparams, self.rope,
                    self.cache, self.ekv,
                    jnp.asarray(chunk), jnp.asarray(pos),
                    jnp.asarray(n, jnp.int32), jnp.asarray(n - 1, jnp.int32),
                    self.pend_embed, self.pend_hidden, self.pend_valid, self.ehist,
                    attn_impl=self.attn_impl, sparse_select=self.sparse_engaged(),
                    kv_span=self.kv_bucket(i + C + 8),
                )
            )
            from ..cache.sparse_kv import commit_any

            self.cache = commit_any(self.cache, n, max_new=C)
            self.host_len += n
            if progress_callback:
                progress_callback("advance", {"current_tokens": min(i + C, total)})
        np.asarray(logits)  # real sync (block_until_ready is unreliable here)
        self._last_prefill_time = time.time() - t0
        if progress_callback:
            progress_callback("finish", {"total_time": self._last_prefill_time})
        self.estate = None
        return logits

    # -- spec generation -----------------------------------------------------

    def _spec_round(self, draft0: int):
        S = self.ecfg.tree_size
        margin = S + self.ecfg.topk_per_iter * self.ecfg.num_iter + 8
        kw = dict(
            temperature=self.eng.temperature,
            top_k=self.eng.top_k,
            top_p=self.eng.top_p,
            attn_impl=self.attn_impl,
            sparse_select=self.sparse_engaged(),
            kv_span=self.kv_bucket(self.host_len + margin),
            unroll=self.unroll_layers(S, self.host_len + margin),
        )
        if self.estate is None:
            (emitted, accept_len, self.cache, self.estate, self.key,
             path_logits) = spec_step_first(
                self.cfg, self.ecfg, self.params, self.eparams, self.rope,
                self.cache, self.ekv,
                self.pend_embed, self.pend_hidden, self.pend_valid, self.ehist,
                jnp.asarray(draft0, jnp.int32), self.key, **kw,
            )
        else:
            (emitted, accept_len, self.cache, self.estate, self.key,
             path_logits) = spec_step(
                self.cfg, self.ecfg, self.params, self.eparams, self.rope,
                self.cache, self.estate,
                jnp.asarray(draft0, jnp.int32), self.key, **kw,
            )
        n = int(accept_len)
        self.host_len += n
        self.last_path_logits = np.asarray(path_logits, np.float32)[:n]
        toks = np.asarray(emitted)[:n].tolist()
        return toks, n

    def _segment_ready(self) -> bool:
        return getattr(self, "estate", None) is not None

    def _round_rows(self) -> int:
        """KV rows one spec round may write at the cache tail (capacity
        guard in _generate_stream). The tree decode pads to the quant
        kernel's M granularity, and the non-deferred (xla) path writes the
        padded rows — count them."""
        return -(-self.ecfg.tree_size // 8) * 8

    def _dispatch_rounds(self, root, k: int):
        """Dispatch one fused K-round segment WITHOUT fetching results.

        ``root`` is a host int (first segment after a per-round step) or the
        device scalar returned by the previous dispatch — chaining roots on
        device lets the host dispatch segment N+1 before reading segment N,
        so the packed-readback tunnel RTT overlaps segment N+1's execution.
        Returns an opaque handle for ``_consume_rounds``."""
        S = self.ecfg.tree_size
        # host_len may lag by one unfetched segment; the margin covers it
        margin = (k + self._inflight_rounds()) * S \
            + self.ecfg.topk_per_iter * self.ecfg.num_iter + 8
        emitted, alens, self.cache, self.estate, root_out, self.key = (
            spec_segment(
                self.cfg, self.ecfg, self.params, self.eparams, self.rope,
                self.cache, self.estate,
                jnp.asarray(root, jnp.int32), self.key,
                k=k,
                temperature=self.eng.temperature,
                top_k=self.eng.top_k,
                top_p=self.eng.top_p,
                attn_impl=self.attn_impl,
                sparse_select=self.sparse_engaged(),
                kv_span=self.kv_bucket(self.host_len + margin),
                unroll=self.unroll_layers(S, self.host_len + margin),
            )
        )
        self._root_dev = root_out
        # ONE device->host transfer per segment: separate fetches of emitted
        # and alens each pay a full tunnel round trip (~8ms/round at k=12)
        packed = jnp.concatenate(
            [emitted, alens[:, None].astype(emitted.dtype)], axis=1
        )
        return packed, k

    def _consume_rounds(self, handle):
        """Fetch a dispatched segment's packed results; returns rounds."""
        packed, k = handle
        packed = np.asarray(packed)
        # segments discard per-round path logits — invalidate rather than
        # leave a stale earlier round for logits-parity consumers (ADVICE r2)
        self.last_path_logits = None
        emitted, alens = packed[:, :-1], packed[:, -1]
        rounds = []
        for r in range(k):
            n = int(alens[r])
            self.host_len += n
            rounds.append((emitted[r, :n].tolist(), n))
        return rounds

    def _inflight_rounds(self) -> int:
        """Rounds dispatched but not yet consumed (host_len lag)."""
        return getattr(self, "_inflight", 0)

    def _spec_rounds(self, draft0: int, k: int):
        """K fused spec rounds, ONE blocking host sync (spec_segment)."""
        return self._consume_rounds(self._dispatch_rounds(draft0, k))

    def _generate_stream(self, input_ids, generation_length, terminators, progress_callback):
        terminators = set(int(t) for t in terminators)
        logits = self.prefill(input_ids, progress_callback)
        token = int(self._sample(logits))
        prefill_time = self._last_prefill_time
        decode_start = time.time()
        self.accept_lengths = []
        emitted_count = 0

        def item(tok, finished, accept_len):
            return {
                "token": tok,
                "is_finished": finished,
                "prefill_time": prefill_time,
                "decode_time": time.time() - decode_start,
                "accept_length": accept_len,
            }

        finished = token in terminators or generation_length <= 1
        yield item(token, finished, 1)
        emitted_count = 1
        if finished:
            return
        draft0 = token
        seg = max(1, getattr(self.eng, "spec_segment_size", 1))
        first = True
        pend = None  # dispatched-but-unfetched segment handle
        done = False

        def emit(rounds):
            nonlocal emitted_count, draft0, done
            for toks, n in rounds:
                self.accept_lengths.append(n)
                for j, t in enumerate(toks):
                    fin = (
                        t in terminators or emitted_count + 1 >= generation_length
                    )
                    yield item(t, fin, n if j == 0 else 0)
                    emitted_count += 1
                    if fin:
                        # discard overshoot rounds (including a possibly
                        # still-inflight next segment): keep exactly the
                        # rows behind the emitted tokens (rows past length
                        # are lazily overwritten, cache/kv.py semantics; an
                        # inflight segment only touches rows at/after the
                        # previous segment's tail, all >= kept). The last
                        # emitted token's row is not written yet (it would
                        # be the next round's root), hence -1.
                        kept = len(input_ids) + emitted_count - 1
                        self.cache = self.cache.with_length(kept)
                        self.host_len = kept
                        done = True
                        return
                draft0 = toks[-1]

        while True:
            # engines sharing this loop without a fused-segment step
            # (hier) run one jitted round per sync
            can_segment = (
                not first
                and seg > 1
                and hasattr(self, "_spec_rounds")
                and self._segment_ready()
            )
            # capacity guard: a round writes _round_rows() rows at the cache
            # tail; past capacity the compact() dynamic_update_slice would
            # clamp backwards and overwrite committed rows (cache/kv.py) —
            # stop generating instead (ADVICE.md round-1). host_len lags by
            # any unfetched inflight segment, hence self._inflight.
            rows = self._round_rows()
            cap = self.cache.max_length
            inflight = self._inflight * rows if pend is not None else 0
            if can_segment and self.host_len + inflight + seg * rows > cap:
                can_segment = False
            if not can_segment:
                if pend is not None:
                    # drain the pipeline before leaving segment mode
                    rounds = self._consume_rounds(pend)
                    pend = None
                    self._inflight = 0
                    yield from emit(rounds)
                    if done:
                        return
                    continue
                if self.host_len + rows > cap:
                    return
                yield from emit([self._spec_round(draft0)])
                first = False
                if done:
                    return
                continue
            # always run FULL segments: k is a static arg, so a
            # need-clipped tail segment would compile a fresh program
            # mid-generation (observed: one ~60s compile dwarfing the
            # whole decode). Overshoot rounds are rolled back in emit().
            if hasattr(self, "_dispatch_rounds"):
                # pipelined: dispatch segment N+1 (root chained on device)
                # BEFORE fetching segment N — the packed-readback tunnel
                # RTT overlaps segment N+1's device execution
                root = draft0 if pend is None else self._root_dev
                nxt = self._dispatch_rounds(root, seg)
                rounds = self._consume_rounds(pend) if pend is not None else []
                pend = nxt
                self._inflight = seg
                yield from emit(rounds)
                if done:
                    return
            else:
                yield from emit(self._spec_rounds(draft0, seg))
                if done:
                    return

    def mean_accept_length(self) -> float:
        return float(np.mean(self.accept_lengths)) if self.accept_lengths else 0.0

    def reset(self):
        """Start a new sequence. After the first spec step the draft KV
        buffer is owned by ``estate`` (the engine's handle was donated)."""
        super().reset()
        if self.estate is not None:
            self.ekv = self.estate.kv.with_length(0)
        self.estate = None
        self._reset_pending(self.eng.chunk_length, self.cfg.hidden_size)
        self.accept_lengths = []
        self._root_dev = None
        self._inflight = 0
