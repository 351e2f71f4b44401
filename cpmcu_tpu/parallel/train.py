"""Mesh-sharded training step (dp x tp).

The inference engine is the product; this module exists so the framework's
parallel layer is exercised end-to-end with gradients too (and it powers the
multichip dry-run): forward_batch -> cross-entropy -> grads -> optax update,
all under jit over a (dp, tp) mesh with GSPMD propagating the Megatron-style
param shardings from ``pspecs.param_pspecs``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import ModelConfig
from ..core.mesh import AXIS_DP
from ..models import llama
from .pspecs import param_pspecs, shard_params


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1).squeeze(-1)
    return jnp.mean(nll)


def make_train_state(cfg: ModelConfig, mesh: Mesh, key, lr: float = 1e-4):
    params = llama.init_params(cfg, key)
    params = shard_params(params, cfg, mesh)
    tx = optax.adamw(lr)
    opt_state = jax.jit(tx.init)(params)  # mu/nu inherit param shardings
    return params, opt_state, tx


def make_train_step(cfg: ModelConfig, mesh: Mesh, tx):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, tokens):
        tokens = jax.lax.with_sharding_constraint(
            tokens, NamedSharding(mesh, P(AXIS_DP, None))
        )

        def loss_fn(p):
            logits = llama.forward_batch(cfg, p, tokens[:, :-1])
            return cross_entropy(logits, tokens[:, 1:])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
