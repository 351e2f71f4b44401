"""Pipeline-parallel (GPipe) training step over a ``pp`` mesh axis.

Completes the parallelism inventory (SURVEY.md §2.9 — the reference is
single-GPU with NO parallel axes; dp/tp/sp live in pspecs.py/seq.py): the
stacked per-layer params (L, ...) are sharded on the layer axis over ``pp``
stages, and a GPipe schedule streams ``num_microbatches`` microbatches
through the stages inside one ``shard_map`` program:

  * step ``t``: stage ``s`` applies its LOCAL layer shard (a ``lax.scan``
    over L/pp layers) to microbatch ``t - s``;
  * activations move stage->stage with ``jax.lax.ppermute`` (rides ICI;
    its autodiff transpose is the reverse permute, so one
    ``jax.value_and_grad`` differentiates the whole schedule);
  * the loop is a static Python unroll of ``M + pp - 1`` steps — XLA sees
    straight-line code; bubble fraction is the usual (pp-1)/(M+pp-1).

SPMD notes (honest costs): embedding/lm_head/loss are computed by every
stage and masked to stages 0 / pp-1 with ``jnp.where`` — dead lockstep
compute, not extra wall-clock, since stages run the same program anyway.
Data parallelism composes on a leading ``dp`` mesh axis (each dp row runs
an independent pipeline; grads reduce over dp in the shard_map transpose).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import ModelConfig
from ..core.mesh import AXIS_DP
from ..layers.modules import embedding, lm_head, rms_norm
from ..models import llama
from ..models.llama import batch_layer_stack
from .train import cross_entropy

AXIS_PP = "pp"


def create_pp_mesh(pp_size: int, dp_size: int = 1) -> Mesh:
    devs = np.array(jax.devices()[: dp_size * pp_size]).reshape(
        dp_size, pp_size
    )
    return Mesh(devs, (AXIS_DP, AXIS_PP))


def pp_param_specs(params: dict) -> dict:
    """Layer-stacked leaves shard axis 0 over pp; everything else is
    replicated (embed/lm_head are consumed by the masked first/last-stage
    compute on every device)."""
    return {
        "embed": P(),
        "layers": jax.tree.map(lambda _: P(AXIS_PP), params["layers"]),
        "final_norm": P(),
        "lm_head": jax.tree.map(lambda _: P(), params["lm_head"]),
    }


def _pipeline_loss(cfg: ModelConfig, num_microbatches: int, pp_size: int,
                   params: dict, tokens: jax.Array) -> jax.Array:
    """Runs per-device inside shard_map: tokens is the local dp shard
    (B_local, T); params['layers'] leaves are the local (L/pp, ...) shard."""
    stage = jax.lax.axis_index(AXIS_PP)
    M = num_microbatches
    B, T = tokens.shape
    assert B % M == 0, f"local batch {B} must divide into {M} microbatches"
    mb = B // M
    xs = tokens.reshape(M, mb, T)
    rope_cos, rope_sin = llama.rope_tables(cfg.rope, cfg.head_dim, T - 1)

    carry = jnp.zeros((mb, T - 1, cfg.hidden_size), cfg.jnp_dtype)
    perm = [(i, i + 1) for i in range(pp_size - 1)]
    loss_sum = jnp.float32(0.0)
    for t in range(M + pp_size - 1):
        i_in = min(t, M - 1)  # stage 0 re-feeds the last mb in drain steps;
        # the duplicates never reach a live loss window (see i_out bound)
        x_emb = embedding(params["embed"], xs[i_in][:, :-1], cfg.scale_emb,
                          cfg.jnp_dtype)
        inp = jnp.where(stage == 0, x_emb, carry)
        y = batch_layer_stack(cfg, params["layers"], inp, rope_cos, rope_sin)
        i_out = t - (pp_size - 1)
        if 0 <= i_out < M:
            normed = rms_norm(y, params["final_norm"], cfg.rms_norm_eps)
            logits = lm_head(params["lm_head"], normed, cfg.scale_lmhead,
                             n_out=cfg.vocab_size).astype(jnp.float32)
            nll = cross_entropy(logits, xs[i_out][:, 1:])
            loss_sum = loss_sum + jnp.where(stage == pp_size - 1, nll, 0.0)
        if pp_size > 1:
            carry = jax.lax.ppermute(y, AXIS_PP, perm)
    loss = jax.lax.psum(loss_sum, AXIS_PP) / M  # only the last stage is live
    return jax.lax.pmean(loss, AXIS_DP)


def make_pp_loss_fn(cfg: ModelConfig, mesh: Mesh, params_example: dict,
                    num_microbatches: int = 4):
    """(params, tokens) -> scalar loss, pipelined over mesh['pp']."""
    pp_size = mesh.shape[AXIS_PP]
    assert cfg.num_layers % pp_size == 0, (
        f"num_layers {cfg.num_layers} must divide over pp={pp_size}")
    return jax.shard_map(
        functools.partial(_pipeline_loss, cfg, num_microbatches, pp_size),
        mesh=mesh,
        in_specs=(pp_param_specs(params_example), P(AXIS_DP, None)),
        out_specs=P(),
        check_vma=False,
    )


def make_pp_train_state(cfg: ModelConfig, mesh: Mesh, key, lr: float = 1e-4):
    import optax

    params = llama.init_params(cfg, key)
    specs = pp_param_specs(params)
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
    tx = optax.adamw(lr)
    opt_state = jax.jit(tx.init)(params)
    return params, opt_state, tx


def make_pp_train_step(cfg: ModelConfig, mesh: Mesh, tx, params_example: dict,
                       num_microbatches: int = 4):
    import optax

    loss_fn = make_pp_loss_fn(cfg, mesh, params_example, num_microbatches)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(p, tokens))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
