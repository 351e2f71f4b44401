"""Draft-tree utilities: ancestor closure, mask packing.

The reference threads uint64 ancestor masks through its kernels
(src/model/mask.cuh, tree_drafter.py pack_mask); we keep boolean (T, T)
matrices on device and provide pack/unpack only for interop/tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ancestor_closure(parent: jax.Array, include_self: bool = True) -> jax.Array:
    """(T,) parent indices (parent[0] ignored; root=0) -> (T, T) bool where
    row i has bits set for every ancestor of i (and itself).

    Vectorized replacement for the sequential mask build in
    ``build_dynamic_tree_kernel`` (src/model/eagle.cuh:188-222): boolean
    matrix squaring, log2(T) steps.
    """
    T = parent.shape[0]
    eye = jnp.eye(T, dtype=jnp.bool_)
    step = eye.at[jnp.arange(1, T), parent[1:]].set(True)  # self + parent
    closure = step
    n = 1
    while n < T:
        closure = (closure.astype(jnp.float32) @ closure.astype(jnp.float32)) > 0
        n *= 2
    if not include_self:
        closure = closure & ~eye
    return closure


def pack_mask_u64(mask: np.ndarray) -> np.ndarray:
    """(T, T<=64) bool -> (T,) uint64, bit j of row i = mask[i, j]
    (tree_drafter.py:9-26 pack_mask equivalent)."""
    T = mask.shape[0]
    out = np.zeros((T,), np.uint64)
    for j in range(mask.shape[1]):
        out |= (mask[:, j].astype(np.uint64)) << np.uint64(j)
    return out


def unpack_mask_u64(packed: np.ndarray, width: int) -> np.ndarray:
    T = packed.shape[0]
    out = np.zeros((T, width), bool)
    for j in range(width):
        out[:, j] = (packed >> np.uint64(j)) & np.uint64(1)
    return out
