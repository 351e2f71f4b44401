"""Expert parallelism: a GShard-style top-k routed MoE FFN over an ``ep``
mesh axis.

Completes the parallel-axis inventory (dp/tp/pp/sp live in pspecs.py,
pipeline.py, seq.py; the reference is single-GPU with no MoE models —
SURVEY.md §2.9 lists EP as absent upstream, so this is a beyond-reference
capability, kept self-contained rather than threaded through the inference
engines).

TPU-idiomatic design (static shapes, MXU-friendly, no ragged all-to-all):

  * router: ``logits = x @ wr`` → top-k experts per token with softmax
    gates renormalized over the chosen k;
  * capacity dispatch: each expert processes at most ``C`` tokens
    (capacity_factor · T · k / E); a position-in-expert cumsum builds a
    one-hot dispatch tensor (T, E, C) — overflowed tokens drop (their
    gate contribution is 0), exactly the GShard/Switch static-shape
    scheme;
  * experts: stacked gated-SiLU FFNs (E, H, I) — einsum over the
    dispatched (E, C, H) block keeps every matmul batched on the MXU;
  * EP: inside ``shard_map`` the expert stack is sharded on E over
    ``ep``; every device routes ALL tokens but dispatches/computes only
    its local E/ep experts, then the combine einsum's partial outputs
    ``psum`` over ``ep`` (each token's k experts live on ≤k devices, the
    rest contribute zeros). Activations never reshard — the only
    collective is one psum on (T, H), riding ICI.

Autodiff: the one-hot dispatch derives from integer ``top_k`` indices (no
gradient path by construction — if a future edit makes positions
float-derived, add an explicit ``stop_gradient``); gradients flow to the
router only through the softmaxed gates in ``combine``, and to the experts
through the einsums and the psum, without custom rules.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_EP = "ep"


def create_ep_mesh(ep_size: int) -> Mesh:
    devs = np.array(jax.devices()[:ep_size])
    return Mesh(devs, (AXIS_EP,))


def init_moe_params(key, hidden: int, inter: int, num_experts: int,
                    dtype=jnp.float32, scale: float = 0.02) -> dict:
    kr, kg, ku, kd = jax.random.split(key, 4)
    w = lambda k, shape: (jax.random.normal(k, shape) * scale).astype(dtype)
    return {
        "wr": w(kr, (hidden, num_experts)),           # router
        "w_gate": w(kg, (num_experts, hidden, inter)),
        "w_up": w(ku, (num_experts, hidden, inter)),
        "w_down": w(kd, (num_experts, inter, hidden)),
    }


def moe_param_specs() -> dict:
    return {
        "wr": P(),
        "w_gate": P(AXIS_EP),
        "w_up": P(AXIS_EP),
        "w_down": P(AXIS_EP),
    }


def _route(wr, x, num_experts: int, top_k: int, capacity: int):
    """Router + capacity-based one-hot dispatch (all experts).

    Returns (dispatch (T, E, C) one-hot, combine (T, E, C) gated)."""
    T = x.shape[0]
    logits = jnp.dot(x, wr, preferred_element_type=jnp.float32)  # (T, E)
    topv, topi = jax.lax.top_k(logits, top_k)  # (T, k)
    gates = jax.nn.softmax(topv, axis=-1)  # renormalized over chosen k
    # expert-assignment mask per routing slot: (k, T, E)
    onehot = jax.nn.one_hot(topi.T, num_experts, dtype=jnp.float32)
    # position of each (slot, token) within its expert's capacity, counting
    # slot-major then token-major (GShard order)
    flat = onehot.reshape(top_k * T, num_experts)
    pos = (jnp.cumsum(flat, axis=0) - flat).astype(jnp.int32)  # (k*T, E)
    keep = (pos < capacity) * flat
    posc = jax.nn.one_hot(pos, capacity, dtype=jnp.float32)  # (k*T, E, C)
    disp_flat = posc * keep[..., None]  # (k*T, E, C) one-hot
    dispatch = disp_flat.reshape(top_k, T, num_experts, capacity)
    combine = dispatch * gates.T[..., None, None]
    # a token appears at most once per expert slot; sum over slots
    return dispatch.sum(0), combine.sum(0)


def _expert_ffn(p_local, xe):
    """Gated-SiLU expert FFN batched over the local expert axis:
    (El, C, H) -> (El, C, H)."""
    g = jnp.einsum("ech,ehi->eci", xe, p_local["w_gate"])
    u = jnp.einsum("ech,ehi->eci", xe, p_local["w_up"])
    a = jax.nn.silu(g.astype(jnp.float32)).astype(xe.dtype) * u
    return jnp.einsum("eci,eih->ech", a, p_local["w_down"])


def moe_ffn_reference(params: dict, x: jax.Array, top_k: int = 2,
                      capacity_factor: float = 2.0) -> jax.Array:
    """Single-device oracle: (T, H) -> (T, H)."""
    T = x.shape[0]
    E = params["wr"].shape[1]
    C = _capacity(T, E, top_k, capacity_factor)
    dispatch, combine = _route(params["wr"], x, E, top_k, C)
    xe = jnp.einsum("tec,th->ech", dispatch, x.astype(jnp.float32)).astype(
        x.dtype
    )
    ye = _expert_ffn(params, xe)
    return jnp.einsum("tec,ech->th", combine,
                      ye.astype(jnp.float32)).astype(x.dtype)


def _capacity(T: int, E: int, top_k: int, factor: float) -> int:
    return max(1, int(factor * T * top_k / E))


def make_ep_moe_ffn(mesh: Mesh, num_experts: int, top_k: int = 2,
                    capacity_factor: float = 2.0):
    """(params, x (T, H)) -> (T, H), experts sharded over mesh['ep']."""
    ep = mesh.shape[AXIS_EP]
    assert num_experts % ep == 0, (
        f"num_experts {num_experts} must divide over ep={ep}")

    def local_fn(params, x):
        T = x.shape[0]
        C = _capacity(T, num_experts, top_k, capacity_factor)
        dispatch, combine = _route(params["wr"], x, num_experts, top_k, C)
        # local expert block: shard_map hands us (E/ep, H, I) expert
        # weights; slice the matching columns of the (replicated-input)
        # routing tensors
        el = num_experts // ep
        e0 = jax.lax.axis_index(AXIS_EP) * el
        disp_l = jax.lax.dynamic_slice_in_dim(dispatch, e0, el, axis=1)
        comb_l = jax.lax.dynamic_slice_in_dim(combine, e0, el, axis=1)
        xe = jnp.einsum("tec,th->ech", disp_l,
                        x.astype(jnp.float32)).astype(x.dtype)
        ye = _expert_ffn(params, xe)
        y = jnp.einsum("tec,ech->th", comb_l, ye.astype(jnp.float32))
        return jax.lax.psum(y, AXIS_EP).astype(x.dtype)

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(moe_param_specs(), P()),
        out_specs=P(),
        check_vma=False,
    )


def make_ep_train_step(mesh: Mesh, num_experts: int, top_k: int = 2,
                       capacity_factor: float = 2.0, lr: float = 1e-3):
    """Tiny regression objective over the EP MoE — exercises grads through
    router + dispatch + experts + psum (powers the dry-run)."""
    import optax

    ffn = make_ep_moe_ffn(mesh, num_experts, top_k, capacity_factor)
    tx = optax.adam(lr)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, target):
        def loss_fn(p):
            err = ffn(p, x) - target
            return jnp.mean(err.astype(jnp.float32) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, tx
