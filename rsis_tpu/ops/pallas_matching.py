"""Batched exact LAP solver as ONE Pallas kernel.

The train-step matcher (ops/matching.py) needs a batch of exact (T, N)
linear assignments per step. The python-unrolled XLA Jonker-Volgenant
there is correct but pays XLA's per-op scheduling overhead on ~460 tiny
(B, 21)-vector ops: measured 15 ms per (32, 20, 20) solve batch in
isolation and ~38 ms of a 350 ms T=20 train step (docs/PERF.md round 3).
Inside a single Pallas program the same sequential algorithm runs as
hardware loops over VPU vectors with no per-op dispatch, and the
data-dependent Dijkstra terminates EARLY instead of paying the
worst-case unroll.

Algorithm: shortest augmenting path with dual potentials — the same
formulation scipy.optimize.linear_sum_assignment uses (Crouse 2016,
DOI 10.1109/TAES.2016.140952) — one Dijkstra per row over lane-parallel
column vectors. Grid is (B,); one batch element per program.

Two Mosaic lowering rules this kernel is shaped around (both observed
the hard way on v5e):

1. Loop-varying VECTORS live in VMEM scratch refs, never in
   `lax.while_loop` carries — mixed vector layouts in an `scf.yield`
   fail to legalize. While-carries are scalars only.
2. NO implicit lane/sublane padding anywhere: every vector is an exact
   (8k, 1) or (1, 128) tile. Reductions over implicitly padded vectors
   read garbage from the padded lanes of scratch refs (writes only
   cover the logical region), which sent the Dijkstra chasing phantom
   columns — an infinite loop on silicon that interpret mode cannot
   reproduce. The cost matrix is padded to (nr_pad, 128) OUTSIDE the
   kernel; padded columns are handled exactly (not by cost magnitude)
   by initializing them as already-scanned, so they can never be
   selected, and the dual update masks them via ``spc < _INF/2``.

Column-indexed state (v, shortest-path costs, predecessors, scanned
mask, row4col) is (1, 128) lane vectors; row-indexed state (u, col4row,
scanned-rows mask) is (nr_pad, 1) SUBLANE vectors so no lane<->sublane
transpose is ever needed: the one cross-axis contraction (shortest-path
cost at each row's assigned column) is a one-hot (nr_pad, 128) reduce
built by broadcasting the two orientations against each other. Dynamic
indexing is where-select against an iota (gather/scatter-free).

Exactness: any cost-optimal assignment is acceptable to every caller
(ties between optima may resolve differently than scipy's tie-break
toward unassigned columns); oracle-tested against scipy on total cost in
tests/test_ops.py and tests/test_pallas_matching.py.

Reference context: replaces the per-sample CPU Munkres escape of the
reference trainer (reference: src/train.py:110-145).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e9  # plain float: a jnp constant would be a captured tracer in the kernel
_LANES = 128


def _lap_kernel(cost_ref, out_ref, u_ref, v_ref, r4c_ref, c4r_ref,
                spc_ref, pred_ref, sc_ref, sr_ref, *, nr: int, nc: int,
                nr_pad: int):
    """Solve one (nr, nc) problem, nr <= nc <= 128; refs are padded to
    (nr_pad, 1) / (1, 128) exact tiles. out (1, 1, 128) int32 row4col
    (0-indexed assigned row per column, -1 = unassigned/padded)."""
    lane_c = lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)  # column ids
    sub_r = lax.broadcasted_iota(jnp.int32, (nr_pad, 1), 0)   # row ids

    def col_at(vec, j):
        """scalar vec[0, j] via select-reduce (no dynamic lane index)."""
        return jnp.sum(jnp.where(lane_c == j, vec, 0))

    def row_at(vec, i):
        """scalar vec[i, 0] of an (nr_pad, 1) sublane vector."""
        return jnp.sum(jnp.where(sub_r == i, vec, 0))

    u_ref[...] = jnp.zeros((nr_pad, 1), jnp.float32)
    v_ref[...] = jnp.zeros((1, _LANES), jnp.float32)
    r4c_ref[...] = jnp.full((1, _LANES), -1, jnp.int32)
    c4r_ref[...] = jnp.full((nr_pad, 1), -1, jnp.int32)

    def per_row(cur_row, carry):
        spc_ref[...] = jnp.full((1, _LANES), _INF, jnp.float32)
        pred_ref[...] = jnp.zeros((1, _LANES), jnp.int32)
        # padded columns start life already-scanned: dm stays _INF there,
        # so they are never selected — exact for any cost magnitude
        sc_ref[...] = (lane_c >= nc).astype(jnp.int32)
        sr_ref[...] = jnp.zeros((nr_pad, 1), jnp.int32)

        # ---- Dijkstra over columns from cur_row (scalar-only carry) ----
        def dij_cond(c):
            return c[0] == -1

        def dij_body(c):
            (sink, icur, min_val) = c
            sr_ref[...] = jnp.where(sub_r == icur, 1, sr_ref[...])
            ui = row_at(u_ref[...], icur)
            crow = cost_ref[0, pl.ds(icur, 1), :].astype(
                jnp.float32)                               # (1, 128)
            red = min_val + crow - ui - v_ref[...]
            sc = sc_ref[...] == 1
            upd = jnp.logical_not(sc) & (red < spc_ref[...])
            spc_ref[...] = jnp.where(upd, red, spc_ref[...])
            pred_ref[...] = jnp.where(upd, icur, pred_ref[...])
            dm = jnp.where(sc, _INF, spc_ref[...])
            lowest = jnp.min(dm)
            # tie-break toward an unassigned column (scipy's preference;
            # shortens paths, any choice is optimal)
            tie_free = (dm == lowest) & (r4c_ref[...] < 0)
            j = jnp.where(
                jnp.sum(tie_free.astype(jnp.int32)) > 0,
                jnp.min(jnp.where(tie_free, lane_c, _LANES)),
                jnp.min(jnp.where(dm == lowest, lane_c, _LANES)))
            rj = col_at(r4c_ref[...], j)
            sink = jnp.where(rj < 0, j, jnp.int32(-1))
            icur = jnp.where(rj < 0, icur, rj)
            sc_ref[...] = jnp.where(lane_c == j, 1, sc_ref[...])
            return (sink, icur, lowest)

        sink, _, min_val = lax.while_loop(
            dij_cond, dij_body,
            (jnp.int32(-1), cur_row, jnp.float32(0.0)))

        # ---- dual update ----
        # spc at each row's assigned column: one-hot reduce over the
        # (nr_pad, 128) broadcast; padded sublanes hold c4r = -1 and
        # never match a lane id
        hot = c4r_ref[...] == lane_c                       # (nr_pad, 128)
        spc_at = jnp.sum(jnp.where(hot, spc_ref[...], 0.0),
                         axis=1, keepdims=True)            # (nr_pad, 1)
        sr = sr_ref[...] == 1
        du = jnp.where(sub_r == cur_row, min_val,
                       jnp.where(sr, min_val - spc_at, 0.0))
        u_ref[...] = u_ref[...] + du
        # scanned & actually-reached columns only: padded columns are
        # "scanned" from init but keep spc = _INF — exclude them or the
        # subtraction would poison v with ±_INF
        scanned = (sc_ref[...] == 1) & (spc_ref[...] < _INF * 0.5)
        v_ref[...] = v_ref[...] - jnp.where(
            scanned, min_val - spc_ref[...], 0.0)

        # ---- augment along the predecessor chain ----
        def aug_cond(j):
            return j >= 0

        def aug_body(j):
            ipred = col_at(pred_ref[...], j)
            jnext = row_at(c4r_ref[...], ipred)
            r4c_ref[...] = jnp.where(lane_c == j, ipred, r4c_ref[...])
            c4r_ref[...] = jnp.where(sub_r == ipred, j, c4r_ref[...])
            return jnp.where(ipred == cur_row, jnp.int32(-1), jnext)

        lax.while_loop(aug_cond, aug_body, sink)
        return carry

    lax.fori_loop(0, nr, per_row, jnp.int32(0))
    out_ref[0, 0] = r4c_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_lap_batch(costs: jnp.ndarray, interpret: bool = False
                    ) -> jnp.ndarray:
    """Batched exact rectangular LAP.

    Args:
      costs: (B, R, C) f32, R <= C <= 128 (rows = predictions, cols = GT
        slots; the RSIS workload is C = gt_maxseqlen = 20).
    Returns:
      (B, C) int32 ``row4col``: 0-indexed assigned row per column, -1 for
      unassigned columns (C - R of them).
    """
    b, nr, nc = costs.shape
    assert nr <= nc <= _LANES, (nr, nc)
    nr_pad = max(8, ((nr + 7) // 8) * 8)
    # pad to exact tiles; pad contents are irrelevant (padded columns are
    # pre-scanned inside the kernel, padded rows unreachable)
    costs_p = jnp.pad(costs.astype(jnp.float32),
                      ((0, 0), (0, nr_pad - nr), (0, _LANES - nc)))
    kern = functools.partial(_lap_kernel, nr=nr, nc=nc, nr_pad=nr_pad)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, nr_pad, _LANES), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, _LANES), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, _LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nr_pad, 1), jnp.float32),   # u (row duals)
            pltpu.VMEM((1, _LANES), jnp.float32),   # v (column duals)
            pltpu.VMEM((1, _LANES), jnp.int32),     # row4col
            pltpu.VMEM((nr_pad, 1), jnp.int32),     # col4row
            pltpu.VMEM((1, _LANES), jnp.float32),   # shortest path costs
            pltpu.VMEM((1, _LANES), jnp.int32),     # predecessor rows
            pltpu.VMEM((1, _LANES), jnp.int32),     # scanned columns
            pltpu.VMEM((nr_pad, 1), jnp.int32),     # scanned rows
        ],
        interpret=interpret,
    )(costs_p)
    return out[:, 0, :nc]
