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


def _solve_lap(cost: jnp.ndarray) -> jnp.ndarray:
    """Optimal assignment of an (R, C) cost matrix, R <= C.

    Returns ``row_of_col``: int32 (C,) where ``row_of_col[j]`` is the
    1-indexed row assigned to column j (0 = unassigned). Jonker-Volgenant
    with dual potentials, one augmenting path per ROW — for the training
    matcher the rows are the T predictions and the columns the N >= T GT
    slots, so the unrolled program has sum_{i<T}(i+2) path segments
    instead of the sum_{i<N}(i+2) of solving the zero-padded square
    (~12x fewer tiny ops at T=5, N=20; measured ~20 ms -> ~2 ms, the
    optimum over the real columns is identical — zero-cost pad columns
    only absorb unused rows).

    Every loop is PYTHON-unrolled with done-masking instead of
    lax.while/fori: on this backend a lax loop iteration carries a ~0.7 ms
    floor regardless of body size (docs/PERF.md), which made the
    data-dependent JV whiles the single most expensive part of the train
    step (~80 ms/step at N=20, B*T=160 vmapped problems). Unrolled, the
    whole batched solve is tiny fused ops with no loop floor. The
    augmenting path for row i visits at most i+1 assigned columns, so its
    trip bound is i+2 (and the path-reconstruction bound likewise).
    """
    nr, n = cost.shape
    assert nr <= n
    cost = cost.astype(jnp.float32)
    cols = jnp.arange(n + 1)

    u = jnp.zeros(nr + 1, jnp.float32)
    v = jnp.zeros(n + 1, jnp.float32)
    p = jnp.zeros(n + 1, jnp.int32)

    for i in range(nr):
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

    return p[1:]  # 1-indexed row per column, 0 = unassigned


def _perm_from_rect(row_of_col: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """Convert the transposed-rectangular solution (predictions as rows,
    GT as columns) into the (N,) ``perm`` convention: perm[j] = GT row for
    prediction column j (j < M), remaining GT rows ascending after —
    equivalent to any optimal completion of the zero-cost pad columns."""
    taken = row_of_col > 0                       # (n,) GT slot assigned?
    gt = jnp.arange(n, dtype=jnp.int32)
    # scatter each assigned GT slot to its prediction; unassigned slots
    # get an out-of-range index and are dropped
    idx = jnp.where(taken, row_of_col - 1, m)
    head = jnp.zeros(m, jnp.int32).at[idx].set(gt, mode="drop")
    # unassigned GT rows, ascending, for the pad columns
    order = jnp.argsort(jnp.where(taken, n + gt, gt))
    return jnp.concatenate([head, order[:n - m].astype(jnp.int32)])


def _perm_from_row4col(row4col: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """Like _perm_from_rect for the Pallas kernel's 0-indexed convention:
    ``row4col[j]`` is the 0-indexed prediction assigned to GT slot j, -1
    for unassigned slots."""
    taken = row4col >= 0
    gt = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.where(taken, row4col, m)
    head = jnp.zeros(m, jnp.int32).at[idx].set(gt, mode="drop")
    order = jnp.argsort(jnp.where(taken, n + gt, gt))
    return jnp.concatenate([head, order[:n - m].astype(jnp.int32)])


def hungarian_pallas(costs: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """`hungarian` via the single-kernel Pallas LAP solver
    (ops/pallas_matching.py) — same (B, N) perm contract, picked on real
    TPU where the unrolled XLA path pays ~38 ms/step of per-op dispatch
    at T=20 (docs/PERF.md round 3). Ties between cost-equal optima may
    resolve differently than `hungarian`; every caller is tie-agnostic."""
    from .pallas_matching import solve_lap_batch

    b, n, m = costs.shape
    if m > n:
        raise ValueError("more prediction columns than GT rows")
    row4col = solve_lap_batch(costs.transpose(0, 2, 1), interpret=interpret)
    return jax.vmap(lambda rc: _perm_from_row4col(rc, n, m))(row4col)


def hungarian(costs: jnp.ndarray) -> jnp.ndarray:
    """Batched optimal assignment.

    Args:
      costs: (B, N, M) with N >= M (rows = GT slots, cols = predictions).
        When N > M the optimum equals the Munkres zero-cost-pad
        convention of the reference; the solver works on the transposed
        (M, N) rectangle (M augmenting paths, not N).
    Returns:
      (B, N) int32 ``perm`` with ``perm[b, j]`` = GT row assigned to
      prediction column j (columns >= M get the leftover rows ascending).
    """
    b, n, m = costs.shape
    if m > n:
        raise ValueError("more prediction columns than GT rows")
    if m == n:
        row_of_col = jax.vmap(_solve_lap)(costs.transpose(0, 2, 1))
        # square: row_of_col is a full 1-indexed assignment
        perm = jnp.zeros((b, n), jnp.int32)
        gt = jnp.arange(n, dtype=jnp.int32)
        return jax.vmap(
            lambda rc: jnp.zeros(n, jnp.int32).at[
                jnp.maximum(rc - 1, 0)].set(gt))(row_of_col)
    row_of_col = jax.vmap(_solve_lap)(costs.transpose(0, 2, 1))
    return jax.vmap(lambda rc: _perm_from_rect(rc, n, m))(row_of_col)


def match_gt_to_predictions(y_mask: jnp.ndarray, y_class: jnp.ndarray,
                            costs: jnp.ndarray, solver=hungarian):
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
    perm = solver(costs)
    y_mask_perm = jnp.take_along_axis(y_mask, perm[:, :, None], axis=1)
    y_class_perm = jnp.take_along_axis(y_class, perm, axis=1)
    return y_mask_perm, y_class_perm, perm
