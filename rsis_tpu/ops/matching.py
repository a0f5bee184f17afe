"""Batched, jit-compilable Hungarian assignment on device.

The reference escapes to CPU and runs the pure-Python Munkres solver per
sample per step (reference: src/train.py:110-145, src/utils/hungarian.py:
91-125), costing a GPU->CPU->GPU round-trip every training step. Here the
whole batch is solved inside the XLA program: a Jonker-Volgenant shortest
augmenting path solver over fixed-shape (N, N) matrices, python-unrolled
(see _solve_square) and vmapped over the batch. For the RSIS workload
N = gt_maxseqlen = 20, each solve is trivially cheap; the win is never
leaving the device.

Rectangular cost matrices are handled the way the Munkres library pads them:
extra columns get cost 0, which yields the same optimal assignment over the
real columns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# plain float, NOT jnp.float32(...): a module-level device constant would
# initialise the XLA backend at import time, breaking
# jax.distributed.initialize (which must run before any backend use)
_INF = 1e9


def _solve_square(cost: jnp.ndarray) -> jnp.ndarray:
    """Optimal assignment of an (N, N) cost matrix.

    Returns ``row_of_col``: int32 (N,) where ``row_of_col[j]`` is the row
    assigned to column j. Jonker-Volgenant with dual potentials.

    Every loop is PYTHON-unrolled with done-masking instead of
    lax.while/fori: on this backend a lax loop iteration carries a ~0.7 ms
    floor regardless of body size (docs/PERF.md), which made the
    data-dependent JV whiles the single most expensive part of the train
    step (~80 ms/step at N=20, B*T=160 vmapped problems). Unrolled, the
    whole batched solve is a few thousand tiny fused ops with no loop
    floor. The augmenting path for row i visits at most i+1 assigned
    columns, so its trip bound is i+2 (and the path-reconstruction bound
    likewise), keeping the unrolled program ~N^2/2 segments, not N^2.
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)
    cols = jnp.arange(n + 1)

    u = jnp.zeros(n + 1, jnp.float32)
    v = jnp.zeros(n + 1, jnp.float32)
    p = jnp.zeros(n + 1, jnp.int32)

    for i in range(n):
        row = i + 1  # 1-indexed
        p = p.at[0].set(row)
        minv = jnp.full(n + 1, _INF)
        way = jnp.zeros(n + 1, jnp.int32)
        used = jnp.zeros(n + 1, dtype=bool)
        j0 = jnp.int32(0)

        for _ in range(i + 2):
            active = p[j0] != 0
            used_n = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[jnp.maximum(i0 - 1, 0),
                       jnp.clip(cols - 1, 0, n - 1)] - u[i0] - v
            cur = jnp.where((cols == 0) | used_n, _INF, cur)
            better = cur < minv
            minv_n = jnp.where(better, cur, minv)
            way_n = jnp.where(better, j0, way)
            reachable = jnp.where(used_n | (cols == 0), _INF, minv_n)
            j1 = jnp.argmin(reachable).astype(jnp.int32)
            delta = reachable[j1]
            u_n = u.at[p].add(jnp.where(used_n, delta, 0.0))
            v_n = v - jnp.where(used_n, delta, 0.0)
            minv_n = minv_n - jnp.where(used_n, 0.0, delta)
            # freeze all state once the path has terminated
            u = jnp.where(active, u_n, u)
            v = jnp.where(active, v_n, v)
            minv = jnp.where(active, minv_n, minv)
            way = jnp.where(active, way_n, way)
            used = jnp.where(active, used_n, used)
            j0 = jnp.where(active, j1, j0)

        for _ in range(i + 2):
            active = j0 != 0
            j1 = way[j0]
            p = jnp.where(active, p.at[j0].set(p[j1]), p)
            j0 = jnp.where(active, j1, j0)

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
