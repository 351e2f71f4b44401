"""EAGLE-3 speculative engine.

Counterpart of the reference's Eagle3Impl generation flow
(src/model/eagle3/eagle3.cuh:529-860) on the SpecEngine pattern: one jitted
program per spec round (draft-tree expansion -> base tree decode with
feature taps -> verify -> KV fixup), one accept-length readback.

Differences vs the EAGLE-2 engine (spec_engine.py):
  * the drafter's "hidden" input is fc(concat of base tap-layer features)
    instead of the base final-norm hidden;
  * the drafter is a single 2H-input layer with its own KV (1 layer);
  * drafting happens over the draft vocabulary; ids map through d2t.

The draft layer is run over every accepted prefix token (chunk-lagged
during prefill, per accepted span during decode), so the drafter sees real
history keys — the reference's first draft instead attends over an
uninitialized draft KV region (eagle3.cuh:381-420 writes only the last row
but attends over [0, history+1)), which we do not reproduce.
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
from ..layers.modules import linear
from ..models import llama
from ..ops.sampling import sample
from ..spec.eagle3 import Eagle3Config, Eagle3State, eagle3_draft, eagle3_layer
from ..spec.verify import fix_kv, verify_tree
from .engine import Engine


def _embed(base_cfg: ModelConfig, params, ids):
    from ..layers.modules import embedding

    return embedding(params["embed"], jnp.atleast_1d(jnp.asarray(ids)),
                     base_cfg.scale_emb, base_cfg.jnp_dtype)


def _run_prefix(ecfg, ep, emb, taps, positions, ekv, rope, prior, attn_impl):
    """Drafter pass over accepted prefix rows: hidden = fc(taps)."""
    hidden = linear(ep["fc"], taps.astype(ecfg.model.jnp_dtype))
    return eagle3_layer(
        ecfg, ep, emb, hidden, positions, ekv, rope,
        prior=prior, write_at=prior, attn_impl=attn_impl,
    )


def _expand_and_verify(
    base_cfg, ecfg, params, eparams, rope, cache, ekv, h_root, draft0, key,
    *, temperature, top_k, top_p, attn_impl, sparse_select=False,
    defer_compress=False,
):
    orig = cache.length
    tree_tokens, tree_pos, tree_mask, tree_parent, ekv = eagle3_draft(
        ecfg, base_cfg, eparams, params, rope, ekv, h_root, orig, attn_impl
    )
    tree_tokens = tree_tokens.at[0].set(jnp.asarray(draft0, jnp.int32))

    logits, cache, taps = llama.forward(
        base_cfg, params, rope, cache, tree_tokens, tree_pos, tree_mask,
        logits_mode="all", attn_impl=attn_impl, sparse_select=sparse_select,
        tap_layers=ecfg.tap_layers, unroll=True,
    )
    if temperature == 0.0:
        gt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        key, sub = jax.random.split(key)
        gt = sample(logits, sub, temperature=temperature, top_k=top_k, top_p=top_p)

    accept_len, accept_pos, emitted = verify_tree(
        tree_tokens, gt, tree_pos, tree_mask, tree_parent, orig
    )
    cache = fix_kv(cache, accept_pos, accept_len, orig,
                   defer_compress=defer_compress)

    estate = Eagle3State(
        kv=ekv.with_length(orig),
        prev_embed=_embed(base_cfg, params, emitted),
        prev_taps=taps[accept_pos],
        num_prev=accept_len,
        pos0=orig.astype(jnp.int32),
    )
    path_logits = logits[accept_pos]
    return emitted, accept_len, cache, estate, key, path_logits


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "ecfg", "temperature", "top_k", "top_p", "attn_impl",
        "sparse_select",
    ),
    donate_argnames=("cache", "ekv", "pend_embed", "pend_taps"),
)
def e3_prefill_chunk(
    base_cfg: ModelConfig,
    ecfg: Eagle3Config,
    params, eparams, rope,
    cache: KVCache,
    ekv: KVCache,
    chunk_tokens, positions, n_valid, logits_idx,
    pend_embed, pend_taps, pend_valid, ehist,
    *, temperature=0.0, top_k=0, top_p=1.0, attn_impl="auto",
    sparse_select: bool = False,
):
    """Base prefill chunk (collecting taps) + lagged draft prefill of the
    previous chunk (the EAGLE prefill-lag pattern, spec_engine.py)."""
    C = chunk_tokens.shape[0]
    emb_cur = _embed(base_cfg, params, chunk_tokens)

    logits, cache, taps = llama.forward(
        base_cfg, params, rope, cache, chunk_tokens, positions,
        logits_idx=logits_idx, logits_mode="index",
        attn_impl=attn_impl, sparse_select=sparse_select,
        tap_layers=ecfg.tap_layers,
    )

    # drafter input row i = (embed of token i+1, taps of token i); the
    # pending chunk's last embed row is the current chunk's first token
    pe = pend_embed.at[jnp.clip(pend_valid - 1, 0, C - 1)].set(emb_cur[0])
    epos = ehist + jnp.arange(C, dtype=jnp.int32)
    _, ekv = _run_prefix(
        ecfg, eparams, pe, pend_taps, epos, ekv, rope, ehist, attn_impl
    )

    new_pend_embed = jnp.zeros_like(pend_embed).at[: C - 1].set(emb_cur[1:])
    return logits, cache, ekv, new_pend_embed, taps, n_valid, ehist + pend_valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "ecfg", "temperature", "top_k", "top_p", "attn_impl",
        "sparse_select",
    ),
    donate_argnames=("cache", "ekv", "pend_embed", "pend_taps"),
)
def e3_step_first(
    base_cfg, ecfg, params, eparams, rope, cache, ekv,
    pend_embed, pend_taps, pend_valid, ehist, draft0, key,
    *, temperature, top_k, top_p, attn_impl, sparse_select: bool = False,
):
    C = pend_embed.shape[0]
    emb0 = _embed(base_cfg, params, jnp.asarray(draft0, jnp.int32)[None])[0]
    pe = pend_embed.at[jnp.clip(pend_valid - 1, 0, C - 1)].set(emb0)
    epos = ehist + jnp.arange(C, dtype=jnp.int32)
    h, ekv = _run_prefix(
        ecfg, eparams, pe, pend_taps, epos, ekv, rope, ehist, attn_impl
    )
    h_root = h[jnp.clip(pend_valid - 1, 0, C - 1)]
    return _expand_and_verify(
        base_cfg, ecfg, params, eparams, rope, cache, ekv, h_root, draft0, key,
        temperature=temperature, top_k=top_k, top_p=top_p, attn_impl=attn_impl,
        sparse_select=sparse_select,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "ecfg", "temperature", "top_k", "top_p", "attn_impl",
        "sparse_select", "defer_compress",
    ),
    donate_argnames=("cache", "estate"),
)
def e3_step(
    base_cfg, ecfg, params, eparams, rope, cache, estate: Eagle3State,
    draft0, key,
    *, temperature, top_k, top_p, attn_impl, sparse_select: bool = False,
    defer_compress: bool = False,
):
    S = ecfg.tree_size
    positions = estate.pos0 + jnp.arange(S, dtype=jnp.int32)
    h, ekv = _run_prefix(
        ecfg, eparams, estate.prev_embed, estate.prev_taps, positions,
        estate.kv, rope, estate.pos0, attn_impl,
    )
    h_root = h[jnp.clip(estate.num_prev - 1, 0, S - 1)]
    return _expand_and_verify(
        base_cfg, ecfg, params, eparams, rope, cache, ekv, h_root, draft0, key,
        temperature=temperature, top_k=top_k, top_p=top_p, attn_impl=attn_impl,
        sparse_select=sparse_select, defer_compress=defer_compress,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_cfg", "ecfg", "k", "temperature", "top_k", "top_p", "attn_impl",
        "sparse_select",
    ),
    donate_argnames=("cache", "estate"),
)
def e3_segment(
    base_cfg, ecfg, params, eparams, rope, cache, estate: Eagle3State,
    draft0, key,
    *, k: int, temperature, top_k, top_p, attn_impl,
    sparse_select: bool = False,
):
    """K EAGLE-3 rounds fused into one device program, one host sync (the
    spec_engine.spec_segment analog — per-round dispatch pays a full
    tunnel round trip otherwise)."""

    base_len = cache.length

    def body(carry, _):
        cache, estate, d0, key = carry
        emitted, alen, cache, estate, key, _ = e3_step.__wrapped__(
            base_cfg, ecfg, params, eparams, rope, cache, estate, d0, key,
            temperature=temperature, top_k=top_k, top_p=top_p,
            attn_impl=attn_impl, sparse_select=sparse_select,
            defer_compress=True,
        )
        nxt = emitted[jnp.clip(alen - 1, 0, emitted.shape[0] - 1)]
        return (cache, estate, nxt, key), (emitted, alen)

    (cache, estate, root, key), (emitted, alens) = jax.lax.scan(
        body, (cache, estate, draft0, key), None, length=k
    )
    if hasattr(cache, "c1"):
        from ..cache.sparse_kv import compress_span

        cache = compress_span(cache, base_len, max_new=k * ecfg.tree_size)
    # root = next segment's draft0 ON DEVICE (pipelined segments)
    return emitted, alens, cache, estate, root, key


class Eagle3Engine(Engine):
    """Engine with EAGLE-3 tree speculation (LLM_with_eagle v3 analog)."""

    def __init__(
        self,
        cfg: ModelConfig,
        ecfg: Eagle3Config,
        eng: EngineConfig = EngineConfig(),
        params=None,
        eparams=None,
        attn_impl: str = "auto",
        mesh=None,
    ):
        super().__init__(cfg, eng, params, attn_impl, mesh=mesh)
        self.ecfg = ecfg
        self.ekv = KVCache.create(ecfg.model, self.max_total_length + 128, 1)
        if mesh is not None:
            # the one-layer drafter replicates across the mesh (small; no
            # collective in the tree expansion), like SpecEngine
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            if eparams is not None:
                eparams = jax.tree.map(lambda x: jax.device_put(x, rep),
                                       eparams)
            self.ekv = jax.tree.map(lambda x: jax.device_put(x, rep),
                                    self.ekv)
        self.eparams = eparams
        C = eng.chunk_length
        self._reset_pending(C, cfg.hidden_size)
        self.estate = None
        self.accept_lengths: List[int] = []
        self.last_path_logits = None

    def _reset_pending(self, C, H):
        dt = self.cfg.jnp_dtype
        n = len(self.ecfg.tap_layers)
        self.pend_embed = jnp.zeros((C, H), dt)
        self.pend_taps = jnp.zeros((C, n * H), dt)
        self.pend_valid = jnp.zeros((), jnp.int32)
        self.ehist = jnp.zeros((), jnp.int32)

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
             self.pend_embed, self.pend_taps, self.pend_valid, self.ehist) = (
                e3_prefill_chunk(
                    self.cfg, self.ecfg, self.params, self.eparams, self.rope,
                    self.cache, self.ekv,
                    jnp.asarray(chunk), jnp.asarray(pos),
                    jnp.asarray(n, jnp.int32), jnp.asarray(n - 1, jnp.int32),
                    self.pend_embed, self.pend_taps, self.pend_valid, self.ehist,
                    attn_impl=self.attn_impl,
                    sparse_select=self.sparse_engaged(),
                )
            )
            from ..cache.sparse_kv import commit_any

            self.cache = commit_any(self.cache, n, max_new=C)
            self.host_len += n
            if progress_callback:
                progress_callback("advance", {"current_tokens": min(i + C, total)})
        np.asarray(logits)
        self._last_prefill_time = time.time() - t0
        if progress_callback:
            progress_callback("finish", {"total_time": self._last_prefill_time})
        self.estate = None
        return logits

    def _spec_round(self, draft0: int):
        kw = dict(
            temperature=self.eng.temperature,
            top_k=self.eng.top_k,
            top_p=self.eng.top_p,
            attn_impl=self.attn_impl,
            sparse_select=self.sparse_engaged(),
        )
        if self.estate is None:
            (emitted, accept_len, self.cache, self.estate, self.key,
             path_logits) = e3_step_first(
                self.cfg, self.ecfg, self.params, self.eparams, self.rope,
                self.cache, self.ekv,
                self.pend_embed, self.pend_taps, self.pend_valid, self.ehist,
                jnp.asarray(draft0, jnp.int32), self.key, **kw,
            )
        else:
            (emitted, accept_len, self.cache, self.estate, self.key,
             path_logits) = e3_step(
                self.cfg, self.ecfg, self.params, self.eparams, self.rope,
                self.cache, self.estate,
                jnp.asarray(draft0, jnp.int32), self.key, **kw,
            )
        n = int(accept_len)
        self.host_len += n
        self.last_path_logits = np.asarray(path_logits, np.float32)[:n]
        toks = np.asarray(emitted)[:n].tolist()
        return toks, n

    def _round_rows(self) -> int:
        return self.ecfg.tree_size

    def _segment_ready(self) -> bool:
        return self.estate is not None

    def _dispatch_rounds(self, root, k: int):
        """Dispatch one fused K-round segment without fetching (pipelined
        segments — see spec_engine.SpecEngine._dispatch_rounds)."""
        emitted, alens, self.cache, self.estate, root_out, self.key = (
            e3_segment(
                self.cfg, self.ecfg, self.params, self.eparams, self.rope,
                self.cache, self.estate,
                jnp.asarray(root, jnp.int32), self.key,
                k=k,
                temperature=self.eng.temperature,
                top_k=self.eng.top_k,
                top_p=self.eng.top_p,
                attn_impl=self.attn_impl,
                sparse_select=self.sparse_engaged(),
            )
        )
        self._root_dev = root_out
        self.last_path_logits = None  # segment mode skips the parity rows
        packed = jnp.concatenate(
            [emitted, alens[:, None].astype(emitted.dtype)], axis=1
        )
        return packed, k

    def _spec_rounds(self, draft0: int, k: int):
        """K fused EAGLE-3 rounds, one blocking host sync."""
        return self._consume_rounds(self._dispatch_rounds(draft0, k))

    # streaming loop shared with SpecEngine
    from .spec_engine import SpecEngine as _S

    _generate_stream = _S._generate_stream
    _consume_rounds = _S._consume_rounds
    _inflight_rounds = _S._inflight_rounds
    mean_accept_length = _S.mean_accept_length

    def reset(self):
        super().reset()
        if self.estate is not None:
            self.ekv = self.estate.kv.with_length(0)
        self.estate = None
        self._reset_pending(self.eng.chunk_length, self.cfg.hidden_size)
        self.accept_lengths = []
        self._root_dev = None
        self._inflight = 0
