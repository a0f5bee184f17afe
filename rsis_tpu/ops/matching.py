"""Batched, jit-compilable Hungarian assignment on device.

The reference escapes to CPU and runs the pure-Python Munkres solver per
sample per step (reference: src/train.py:110-145, src/utils/hungarian.py:
91-125), costing a GPU->CPU->GPU round-trip every training step. Here the
whole batch is solved inside the XLA program: a Jonker-Volgenant shortest
augmenting path solver over fixed-shape (N, N) matrices, expressed with
``lax.while_loop``/``fori_loop`` and vmapped over the batch. For the RSIS
workload N = gt_maxseqlen = 20, so each solve is trivially cheap; the win is
never leaving the device.

Rectangular cost matrices are handled the way the Munkres library pads them:
extra columns get cost 0, which yields the same optimal assignment over the
real columns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_INF = jnp.float32(1e9)


def _solve_square(cost: jnp.ndarray) -> jnp.ndarray:
    """Optimal assignment of an (N, N) cost matrix.

    Returns ``row_of_col``: int32 (N,) where ``row_of_col[j]`` is the row
    assigned to column j. Jonker-Volgenant with dual potentials; every loop
    bound is fixed at N+1 iterations so the program shape is static.
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)

    def assign_row(i, state):
        u, v, p = state
        row = i + 1  # 1-indexed
        p = p.at[0].set(row)
        minv = jnp.full(n + 1, _INF)
        way = jnp.zeros(n + 1, jnp.int32)
        used = jnp.zeros(n + 1, dtype=bool)
        j0 = jnp.int32(0)

        def path_cond(carry):
            u, v, p, minv, way, used, j0 = carry
            return p[j0] != 0

        def path_body(carry):
            u, v, p, minv, way, used, j0 = carry
            used = used.at[j0].set(True)
            i0 = p[j0]
            cols = jnp.arange(n + 1)
            cur = cost[i0 - 1, jnp.clip(cols - 1, 0, n - 1)] - u[i0] - v
            cur = jnp.where((cols == 0) | used, _INF, cur)
            better = cur < minv
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            reachable = jnp.where(used | (cols == 0), _INF, minv)
            j1 = jnp.argmin(reachable).astype(jnp.int32)
            delta = reachable[j1]
            # dual update: u[p[j]] += delta for used j; v[j] -= delta for
            # used j; minv[j] -= delta for unused j
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = v - jnp.where(used, delta, 0.0)
            minv = minv - jnp.where(used, 0.0, delta)
            return u, v, p, minv, way, used, j1

        u, v, p, minv, way, used, j0 = lax.while_loop(
            path_cond, path_body, (u, v, p, minv, way, used, j0))

        def unroll_cond(carry):
            p, j = carry
            return j != 0

        def unroll_body(carry):
            p, j = carry
            j1 = way[j]
            p = p.at[j].set(p[j1])
            return p, j1

        p, _ = lax.while_loop(unroll_cond, unroll_body, (p, j0))
        return u, v, p

    u = jnp.zeros(n + 1, jnp.float32)
    v = jnp.zeros(n + 1, jnp.float32)
    p = jnp.zeros(n + 1, jnp.int32)
    _, _, p = lax.fori_loop(0, n, assign_row, (u, v, p))
    return p[1:] - 1  # row_of_col, 0-indexed


def hungarian(costs: jnp.ndarray) -> jnp.ndarray:
    """Batched optimal assignment.

    Args:
      costs: (B, N, M) with N >= M (rows = GT slots, cols = predictions).
        When N > M the matrix is padded with zero-cost columns, matching the
        Munkres pad convention used by the reference.
    Returns:
      (B, N) int32 ``perm`` with ``perm[b, j]`` = GT row assigned to
      prediction column j (columns >= M get the rows absorbed by padding).
    """
    b, n, m = costs.shape
    if m < n:
        pad = jnp.zeros((b, n, n - m), costs.dtype)
        costs = jnp.concatenate([costs, pad], axis=-1)
    elif m > n:
        raise ValueError("more prediction columns than GT rows")
    return jax.vmap(_solve_square)(costs)


def match_gt_to_predictions(y_mask: jnp.ndarray, y_class: jnp.ndarray,
                            costs: jnp.ndarray):
    """Permute ground truth to align with prediction order.

    Args:
      y_mask: (B, N, HW) ground-truth binary masks.
      y_class: (B, N) ground-truth class ids.
      costs: (B, N, M) assignment costs (rows GT, cols predictions).
    Returns:
      (y_mask_perm, y_class_perm, perm) — GT reordered so index t matches
      prediction timestep t, like the reference ``match``
      (reference: src/utils/hungarian.py:91-125).
    """
    perm = hungarian(costs)
    y_mask_perm = jnp.take_along_axis(y_mask, perm[:, :, None], axis=1)
    y_class_perm = jnp.take_along_axis(y_class, perm, axis=1)
    return y_mask_perm, y_class_perm, perm
