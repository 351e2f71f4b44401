"""Expert-parallel MoE FFN (parallel/moe.py): EP-sharded == single-device,
grads flow, capacity drop semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from cpmcu_tpu.parallel.moe import (
    create_ep_mesh,
    init_moe_params,
    make_ep_moe_ffn,
    make_ep_train_step,
    moe_ffn_reference,
)

H, I, E, T = 64, 128, 8, 32


def _setup(seed=0):
    params = init_moe_params(jax.random.PRNGKey(seed), H, I, E)
    x = jnp.asarray(
        np.random.default_rng(seed).normal(size=(T, H)).astype(np.float32)
    )
    return params, x


def test_ep_sharded_matches_reference():
    params, x = _setup()
    want = moe_ffn_reference(params, x)
    mesh = create_ep_mesh(4)
    got = make_ep_moe_ffn(mesh, num_experts=E)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ep_grads_match_reference():
    params, x = _setup(1)
    tgt = jnp.asarray(
        np.random.default_rng(9).normal(size=(T, H)).astype(np.float32)
    )

    def loss(fn):
        return lambda p: jnp.mean((fn(p, x) - tgt) ** 2)

    ref_fn = lambda p, xx: moe_ffn_reference(p, xx)
    mesh = create_ep_mesh(4)
    ep_fn = make_ep_moe_ffn(mesh, num_experts=E)
    gw = jax.grad(loss(ref_fn))(params)
    gg = jax.grad(loss(ep_fn))(params)
    for w, g in zip(jax.tree.leaves(gw), jax.tree.leaves(gg)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=1e-6)


def test_capacity_drop_zeroes_overflow():
    """With capacity_factor small enough, overflowed tokens contribute 0
    (never NaN/garbage) — the GShard drop semantics."""
    params, x = _setup(2)
    y = moe_ffn_reference(params, x, capacity_factor=0.25)
    assert np.all(np.isfinite(np.asarray(y)))
    # with a huge capacity nothing drops; outputs must differ (proves the
    # small capacity actually dropped someone)
    y_full = moe_ffn_reference(params, x, capacity_factor=8.0)
    assert not np.allclose(np.asarray(y), np.asarray(y_full))


def test_ep_train_step_reduces_loss():
    params, x = _setup(3)
    tgt = jnp.asarray(
        np.random.default_rng(7).normal(size=(T, H)).astype(np.float32) * 0.1
    )
    mesh = create_ep_mesh(2)
    step, tx = make_ep_train_step(mesh, num_experts=E, lr=3e-3)
    import optax  # noqa: F401

    opt_state = jax.jit(tx.init)(params)
    losses = []
    for _ in range(8):
        params, opt_state, l = step(params, opt_state, x, tgt)
        losses.append(float(l))
    assert losses[-1] < losses[0]
