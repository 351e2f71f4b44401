"""Generation engine: chunked prefill + jitted decode steps.

The structural counterpart of the reference's Python generation layer
(cpmcu/llm.py:194-370) on top of jit-compiled step functions instead of a
C ABI. The CUDA-Graph capture of the decode step (src/entry.cu:540-562)
becomes XLA compilation caching: each static shape (chunk_length, decode
width) compiles once and replays.

Token loop stays in Python (like the reference); everything per step runs
on device, and the only per-step device->host sync is reading the sampled
token (the analog of the reference's accept-length readback).
"""

from __future__ import annotations

import time
from typing import Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

import functools

from ..cache.kv import KVCache
from ..core.config import EngineConfig, ModelConfig
from ..core.memory import solve_kv_budget
from ..models import llama
from ..ops.sampling import sample
from ..utils.perf import perf_scope


def chunk_width(n: int, cap: int) -> int:
    """Bucketed prefill chunk width: pow-2 ladder from 256, capped at the
    engine chunk length — prefill GEMM cost tracks the PADDED width, so a
    short prompt must not ride a full-width chunk. Shared by Engine.prefill
    and the batch engines' slot admission (one ladder, one compile-shape
    set)."""
    cw = 256
    while cw < n:
        cw *= 2
    return min(cw, cap)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "k", "temperature", "top_k", "top_p", "attn_impl",
        "sparse_select", "kv_span", "unroll",
    ),
    donate_argnames=("cache",),
)
def decode_segment(
    cfg, params, rope, cache, token, pos, key,
    *, k: int, temperature: float, top_k: int, top_p: float, attn_impl: str,
    sparse_select: bool = False, kv_span=None, unroll: bool = False,
):
    """K greedy/sampled decode steps fused into one device program.

    The TPU equivalent of the reference's CUDA-Graph decode replay
    (src/entry.cu:540-562) — but stronger: the token loop itself (forward,
    sample, cache append) runs on device, so host<->device round trips are
    amortized over ``k`` tokens. Returns (cache, tokens(k,), new_key).

    The sparse compressed mirrors advance ONCE per segment, after the scan:
    a compress inside the scan body defeats XLA's in-place carry analysis
    and copies the whole cache every token (10.3ms/token at 96K). The c1/c2
    rows for the segment's own tokens therefore lag by <= k extra tokens —
    invisible to selection, whose local window (block_window_size * 64 =
    512 tokens) force-includes everything near the query anyway (the rows
    already lag 16-31 tokens by construction, ops/sparse.c_len_of).
    """
    from ..cache.sparse_kv import compress_span

    base_len = cache.length

    def body(carry, _):
        cache, tok, p, key = carry
        logits, cache = llama.forward(
            cfg, params, rope, cache, tok[None], p[None],
            logits_mode="all", attn_impl=attn_impl, sparse_select=sparse_select,
            kv_span=kv_span, unroll=unroll,
        )
        cache = cache.with_length(cache.length + 1)
        key, sub = jax.random.split(key)
        nxt = sample(logits[-1], sub, temperature=temperature, top_k=top_k, top_p=top_p)
        return (cache, nxt, p + 1, key), nxt

    (cache, _, _, key), toks = jax.lax.scan(
        body, (cache, token, pos, key), None, length=k
    )
    if hasattr(cache, "c1"):
        cache = compress_span(cache, base_len, max_new=k)
    return cache, toks, key


class Engine:
    """Single-sequence engine (batch=1, like the reference)."""

    def __init__(
        self,
        cfg: ModelConfig,
        eng: EngineConfig = EngineConfig(),
        params: Optional[dict] = None,
        attn_impl: str = "auto",
        mesh=None,  # jax.sharding.Mesh: shard weights/KV (TP over heads,
                    # SURVEY.md §5.8); single-chip when None
    ):
        self.cfg = cfg
        self.eng = eng
        self.attn_impl = attn_impl
        self.mesh = mesh
        self.max_total_length = solve_kv_budget(cfg, eng)
        self.rope = llama.make_rope(cfg, self.max_total_length)
        self.params = params
        if cfg.apply_sparse:
            from ..cache.sparse_kv import SparseKVCache

            self.cache = SparseKVCache.create(cfg, self.max_total_length)
            self.max_total_length = self.cache.max_length
        else:
            self.cache = KVCache.create(cfg, self.max_total_length)
        if mesh is not None:
            from ..parallel.pspecs import shard_cache, shard_params

            if self.params is not None:
                self.params = shard_params(self.params, cfg, mesh)
            self.cache = shard_cache(self.cache, mesh)
        elif self.params is not None:
            # single-chip: fuse qkv / gate+up projections (fewer dispatches)
            self.params = llama.fuse_projections(self.params)
        self.host_len = 0  # committed tokens, host mirror of cache.length
        self.key = jax.random.PRNGKey(eng.random_seed)
        self._last_prefill_time = 0.0
        # prefix cache (eng.prefix_cache): token ids whose KV rows [0, n)
        # are valid in the cache from the previous request
        self._cached_tokens = np.zeros((0,), np.int32)
        self._last_prefill_cached = 0  # observability: rows reused
        self._prefill_epoch = 0  # bumped on each SUCCESSFUL prefill

    # -- sparse engagement ---------------------------------------------------

    def sparse_engaged(self) -> bool:
        """Whether InfLLM-v2 block selection is on for the next call — the
        reference's per-step check (minicpm4_attn.cuh:116,230), evaluated
        host-side so the flag is static under jit."""
        cfg = self.cfg
        if not cfg.apply_sparse:
            return False
        stride = 64 if cfg.use_compress_lse else 16
        clen = max((self.host_len - stride) // stride, 0)
        return clen * stride > cfg.sparse_switch

    # -- attention-span bucketing -------------------------------------------

    def kv_bucket(self, needed: int):
        """Static attention-span bucket covering ``needed`` rows: power-of-2
        ladder from 2048 so per-step cost tracks the live context, with at
        most log2(capacity/2048) compile buckets (the reference re-captures
        its CUDA graph every 128 tokens instead, entry.cu:540-562)."""
        cap = self.cache.max_length
        if cap <= 4096:
            return None
        b = 2048
        while b < needed:
            b *= 2
        return None if b >= cap else b

    # -- steps -------------------------------------------------------------

    def unroll_layers(self, T: int, needed: int = 0) -> bool:
        """Zero-copy unrolled layers for ALL decode-shaped calls: scanning
        stacked weights dynamic-slice-copies every layer's tensors each
        step (profiled at 11.1ms/token of the 8B's 21.7 — the single
        largest decode cost); unrolled layers reference weights in place
        and the kernels read the stacked cache in place, with the engine's
        kv bucket bounding the kernel grid (``span``) so large capacities
        cost nothing. Prefill keeps the scan: weight slicing amortizes
        over the chunk and the scan compiles L times faster."""
        return T <= 64

    def _forward(self, tokens, positions, tree_mask=None, logits_idx=None,
                 logits_mode="all"):
        T = int(np.asarray(tokens).size) if not hasattr(tokens, "shape") else tokens.shape[0]
        out, self.cache = llama.forward(
            self.cfg, self.params, self.rope, self.cache,
            tokens, positions, tree_mask, logits_idx,
            logits_mode=logits_mode, attn_impl=self.attn_impl,
            sparse_select=self.sparse_engaged(),
            kv_span=self.kv_bucket(self.host_len + T + 8),
            unroll=self.unroll_layers(T, self.host_len + T + 8),
        )
        return out

    def prefill(self, input_ids: Sequence[int], progress_callback=None) -> jax.Array:
        """Chunked prefill (llm.py:194-233). Returns logits of the last token
        (1, V)."""
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        total = ids.size
        if total > self.max_total_length:
            raise ValueError(
                f"Input token count ({total}) exceeds maximum supported length "
                f"({self.max_total_length}) under current memory limit"
            )
        C = self.eng.chunk_length
        t0 = time.time()
        if progress_callback:
            progress_callback("begin", {"total_tokens": total})
        start = 0
        if self.eng.prefix_cache:
            # skip re-prefilling the longest shared prefix with the previous
            # request (its KV rows are already in the cache and identical —
            # KV is deterministic in the token prefix). Keep >= 1 token to
            # produce the first logits.
            n = min(self._cached_tokens.size, total - 1)
            if n > 0:
                eq = self._cached_tokens[:n] == ids[:n]
                start = n if eq.all() else int(np.argmin(eq))
            self.cache = self.cache.with_length(start)
            self.host_len = start
            self._cached_tokens = ids[:start]
        else:
            self.host_len = int(self.cache.length)  # resync once per prefill
        self._last_prefill_cached = start
        logits = None
        for i in range(start, total, C):
            n = min(total - i, C)
            cw = chunk_width(n, C)
            chunk = np.zeros((cw,), np.int32)
            chunk[:n] = ids[i : i + n]
            pos = np.arange(i, i + cw, dtype=np.int32)
            with perf_scope("prefill_chunk"):
                logits = self._forward(
                    jnp.asarray(chunk), jnp.asarray(pos),
                    logits_idx=jnp.asarray(n - 1, jnp.int32),
                    logits_mode="index",
                )
            self.commit(n, max_new=cw)
            if progress_callback:
                progress_callback("advance", {"current_tokens": min(i + C, total)})
        logits.block_until_ready()
        if self.eng.prefix_cache:
            self._cached_tokens = ids.copy()  # all prompt rows now valid
        self._prefill_epoch += 1
        self._last_prefill_time = time.time() - t0
        if progress_callback:
            progress_callback("finish", {"total_time": self._last_prefill_time})
        return logits

    def decode(self, token_ids, position_ids, tree_mask=None) -> jax.Array:
        """One decode pass over len(token_ids) tokens; does NOT commit cache
        length (the engine/spec layer commits — llm.py:244-254 analog)."""
        return self._forward(
            jnp.asarray(token_ids, jnp.int32),
            jnp.asarray(position_ids, jnp.int32),
            tree_mask=tree_mask,
            logits_mode="all",
        )

    def commit(self, n: int, max_new: int = 0):
        from ..cache.sparse_kv import commit_any

        self.cache = commit_any(self.cache, n, max_new=max(max_new, n, 1))
        self.host_len += n

    def reset(self):
        """Start a new sequence (KV content is overwritten lazily; the
        prefix-cache record survives — use forget_prefix() to drop it)."""
        self.cache = self.cache.with_length(0)
        self.host_len = 0

    def forget_prefix(self):
        """Invalidate the prefix cache (e.g. after external cache writes)."""
        self._cached_tokens = np.zeros((0,), np.int32)

    def _sample(self, logits) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sample(
            logits[-1], sub,
            temperature=self.eng.temperature,
            top_k=self.eng.top_k,
            top_p=self.eng.top_p,
        )

    # -- generation --------------------------------------------------------

    def generate(
        self,
        input_ids: Sequence[int],
        generation_length: int = 100,
        terminators: Sequence[int] = (),
        use_stream: bool = False,
        progress_callback=None,
    ):
        if use_stream:
            return self._generate_stream(
                input_ids, generation_length, terminators, progress_callback
            )
        tokens: List[int] = []
        stats = {}
        term = set(int(t) for t in terminators)
        for item in self._generate_stream(
            input_ids, generation_length, terminators, progress_callback
        ):
            if item["token"] not in term:
                tokens.append(item["token"])
            stats = item
        return tokens, stats.get("decode_time", 0.0), stats.get("prefill_time", 0.0)

    def _decode_segment_call(self, dev_token, dev_pos, k):
        """One fused k-step greedy/sampled decode dispatch. Overridable:
        parallel.seq.SeqParallelEngine routes it through the sp mesh while
        reusing this class's streaming loop unchanged."""
        return decode_segment(
            self.cfg, self.params, self.rope, self.cache,
            dev_token, dev_pos, self.key,
            k=k,
            temperature=self.eng.temperature,
            top_k=self.eng.top_k,
            top_p=self.eng.top_p,
            attn_impl=self.attn_impl,
            sparse_select=self.sparse_engaged(),
            kv_span=self.kv_bucket(self.host_len + k + 8),
            unroll=self.unroll_layers(1, self.host_len + k + 8),
        )

    def _generate_stream(self, input_ids, generation_length, terminators,
                         progress_callback):
        if not self.eng.prefix_cache:
            yield from self._generate_stream_inner(
                input_ids, generation_length, terminators, progress_callback)
            return
        gen: List[int] = []
        epoch = self._prefill_epoch
        try:
            for item in self._generate_stream_inner(
                    input_ids, generation_length, terminators,
                    progress_callback):
                gen.append(item["token"])
                yield item
        finally:
            # generated rows extend the reusable prefix (a follow-up turn
            # shares prompt + this reply); truncate to committed rows —
            # the final sampled token's row is never written. ONLY when
            # prefill succeeded: if it raised before touching the cache,
            # the previous record is still the truth and recording THIS
            # request's tokens would poison later reuse.
            if self._prefill_epoch != epoch:
                seq = np.concatenate([
                    np.asarray(input_ids, np.int32),
                    np.asarray(gen, np.int32),
                ])
                self._cached_tokens = seq[: self.host_len]

    def _generate_stream_inner(self, input_ids, generation_length,
                               terminators, progress_callback):
        terminators = set(int(t) for t in terminators)
        logits = self.prefill(input_ids, progress_callback)
        token = int(self._sample(logits))
        prefill_time = self._last_prefill_time
        pos = len(input_ids)
        decode_start = time.time()
        emitted = 0
        seg = max(1, self.eng.decode_segment_size)

        def make_item(tok, finished):
            return {
                "token": tok,
                "is_finished": finished,
                "prefill_time": prefill_time,
                "decode_time": time.time() - decode_start,
                "accept_length": 1,
            }

        dev_token = jnp.asarray(token, jnp.int32)
        dev_pos = jnp.asarray(pos, jnp.int32)
        while True:
            finished = token in terminators or emitted + 1 >= generation_length
            yield make_item(token, finished)
            emitted += 1
            if finished:
                return
            k = min(seg, generation_length - emitted)
            if self.host_len + k + 1 > self.cache.max_length:
                # capacity guard: past the cache tail, dynamic_update_slice
                # clamps backwards and would overwrite committed rows —
                # stop generating instead (ADVICE.md round-1)
                return
            with perf_scope("decode_segment"):
                self.cache, toks, self.key = self._decode_segment_call(
                    dev_token, dev_pos, k
                )
            self.host_len += k
            toks_host = np.asarray(toks)
            dev_token = toks[-1]
            dev_pos = dev_pos + k
            # yield all but the last token of the segment here; the last one
            # goes through the loop head so the finish logic stays in one place
            for j, t in enumerate(toks_host[:-1]):
                t = int(t)
                finished = t in terminators or emitted + 1 >= generation_length
                yield make_item(t, finished)
                emitted += 1
                if finished:
                    # roll the cache back to just after the last kept token
                    kept = pos + emitted
                    self.cache = self.cache.with_length(kept)
                    self.host_len = kept
                    return
            token = int(toks_host[-1])
