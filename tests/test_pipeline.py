"""Pipeline-parallel (GPipe) training step: parity vs the unpipelined step.

The reference is single-GPU (SURVEY.md §2.9); this exercises the pp axis of
the TPU-native parallel layer on the 8-virtual-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from cpmcu_tpu.core.config import ModelConfig, RopeConfig
from cpmcu_tpu.models import llama
from cpmcu_tpu.parallel.pipeline import (
    create_pp_mesh,
    make_pp_loss_fn,
    make_pp_train_state,
    make_pp_train_step,
)
from cpmcu_tpu.parallel.train import cross_entropy


def _cfg(num_layers=4):
    return ModelConfig(
        vocab_size=512,
        num_layers=num_layers,
        hidden_size=128,
        intermediate_size=256,
        num_heads=4,
        num_kv_heads=2,
        head_dim=32,
        rope=RopeConfig(theta=10000.0),
        scale_emb=12.0,
        scale_lmhead=0.25,
        scale_residual=1.4 / 2.0,
        dtype="float32",
    )


def _ref_loss(cfg, params, tokens):
    logits = llama.forward_batch(cfg, params, tokens[:, :-1])
    return cross_entropy(logits, tokens[:, 1:])


def test_pp_loss_and_grads_match_unpipelined():
    cfg = _cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, size=(8, 12)),
        jnp.int32,
    )
    mesh = create_pp_mesh(pp_size=4, dp_size=1)
    loss_fn = make_pp_loss_fn(cfg, mesh, params, num_microbatches=4)

    want_loss, want_grads = jax.value_and_grad(
        lambda p: _ref_loss(cfg, p, tokens)
    )(params)
    got_loss, got_grads = jax.value_and_grad(
        lambda p: loss_fn(p, tokens)
    )(params)

    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=1e-5, atol=1e-6)
    flat_w, _ = jax.tree.flatten(want_grads)
    flat_g, _ = jax.tree.flatten(got_grads)
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5)


def test_pp_train_step_runs_dp_x_pp():
    cfg = _cfg()
    mesh = create_pp_mesh(pp_size=4, dp_size=2)
    params, opt_state, tx = make_pp_train_state(cfg, mesh,
                                                jax.random.PRNGKey(1))
    step = make_pp_train_step(cfg, mesh, tx, params, num_microbatches=2)
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, size=(8, 16)),
        jnp.int32,
    )
    params, opt_state, l0 = step(params, opt_state, tokens)
    params, opt_state, l1 = step(params, opt_state, tokens)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    assert float(l1) < float(l0)  # two steps on the same batch reduce loss
