"""Pallas-accelerated inference decode loop in the (B, H, C, W) layout.

The third decode implementation (after models/decoder.py — flax reference —
and models/fast_decoder.py — pure-XLA with hoisted skip convs), and the
fastest on TPU: each ConvLSTM cell step is ONE fused Pallas kernel
(ops/pallas_decode.py) operating on row-major (B, H, C, W) tensors whose
HBM tiles are compact (XLA's channels-minor layout lane-pads C=8..32 to
128 and inflates decode HBM traffic ~16x at the finest cells — measured
~5.1 ms/step for the XLA cell4 composition vs ~0.5 ms for the fused
kernel at the bench geometry).

Math per step mirrors the reference decoder exactly
(reference: src/modules/model.py:122-184):
  - skip contributions are scan-constant and hoisted into S terms exactly
    like fast_decoder._hoist_cells (same channel-split identity);
  - inter-cell upsampling is align-corners bilinear expressed as the same
    interpolation matmuls as ops/upsample.py, einsum'd in row-major;
  - the mask head reuses ops/mask_head.mask_head_fused on a per-step
    transposed view of the finest hidden state.

Equivalence vs the flax decoder is tested in tests/test_rowmajor_decoder.py
(interpret mode on the CPU mesh) and the TPU path is exercised by bench.py.
Inference-only: training keeps the flax path for autodiff.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.pallas_decode import fused_cell_rowmajor, pack_cell_weights
from ..ops.upsample import _interp_matrix
from .decoder import decoder_widths, init_carry
from .fast_decoder import _conv2d


def _to_rowmajor(x_nhwc: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x_nhwc, -1, 2)


def _conv2d_rowmajor_out(x_nhwc, kernel, bias=None):
    """SAME conv reading NHWC and writing (B, H, C, W) directly.

    Functionally identical to ``_to_rowmajor(_conv2d(x, k, b))`` but the
    transpose lives inside the convolution's output dimension numbers,
    so XLA can lay the result out for its row-major consumers (the
    Pallas cells) without a separate full-tensor relayout — in both the
    forward and the autodiff backward, which XLA derives with the same
    dimension numbers (docs/PERF.md round-5 copy anatomy: the
    conv<->Pallas layout seam)."""
    out = lax.conv_general_dilated(
        x_nhwc, kernel.astype(x_nhwc.dtype), window_strides=(1, 1),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHCW"))
    if bias is not None:
        out = out + bias.astype(out.dtype)[None, None, :, None]
    return out


def _hoist_rmconv_enabled() -> bool:
    """RSIS_HOIST_RMCONV=1: compute the hoisted S terms with the
    row-major-out conv instead of the NHWC conv + moveaxis seam.
    Default OFF — the step-level A/B is a wash (T=20: 251.10 vs
    250.96 ms, v5e 2026-08-20): XLA realizes the permuted output dims
    with the same internal relayout the explicit moveaxis costs, so the
    conv<->Pallas layout seam is not removable from the conv side (the
    measured negative result for docs/PERF.md round-5 copy anatomy).
    Resolved at trace-build time, like every kernel env-switch (cached
    jits ignore env flips — docs/PERF.md round-4 stale-trace rule)."""
    return os.environ.get("RSIS_HOIST_RMCONV", "0") == "1"


def _hoist_cells_rowmajor(dec_params: dict, skips: Sequence[jnp.ndarray],
                          hidden_size: int, skip_mode: str):
    """Per-cell (packed weight, S term, cx) with S in row-major layout.

    Same channel-split identity as fast_decoder._hoist_cells: the gate conv
    over concat(up, skip, h) splits into conv_x(up) + conv_s(skip) +
    conv_h(h), and conv_s(skip) + bias is constant across the scan."""
    widths = decoder_widths(hidden_size)
    rm = _hoist_rmconv_enabled()
    conv_s = _conv2d_rowmajor_out if rm else _conv2d
    cells = []
    for i in range(len(widths)):
        gates = dec_params[f"clstm{i}"]["gates"]
        kernel, bias = gates["kernel"], gates["bias"]
        ch = widths[i]
        if i == 0:
            cs = skips[0].shape[-1]
            ks, kh = kernel[:, :, :cs], kernel[:, :, cs:]
            s_term = conv_s(skips[0], ks, bias)
            step_kernel = kh
            cx = 0
        else:
            cp = widths[i - 1]
            if skip_mode == "concat":
                cs = skips[i].shape[-1]
                kx = kernel[:, :, :cp]
                ks = kernel[:, :, cp:cp + cs]
                kh = kernel[:, :, cp + cs:]
                s_term = conv_s(skips[i], ks, bias)
            elif skip_mode == "sum":
                kx = kernel[:, :, :cp]
                kh = kernel[:, :, cp:]
                s_term = conv_s(skips[i], kx, bias)
            elif skip_mode == "none":
                kx = kernel[:, :, :cp]
                kh = kernel[:, :, cp:]
                b_ = bias.astype(skips[i].dtype)
                b, h, w = skips[i].shape[:3]
                s_term = (jnp.broadcast_to(b_[:, None], (b, h, 4 * ch, w))
                          if rm else
                          jnp.broadcast_to(b_, (b, h, w, 4 * ch)))
            else:
                raise ValueError(
                    f"skip_mode {skip_mode!r} is not channel-separable")
            step_kernel = jnp.concatenate([kx, kh], axis=2)
            cx = cp
        wt = pack_cell_weights(step_kernel, cx, ch,
                               dtype=s_term.dtype)
        cells.append({"wt": wt, "s": s_term if rm else _to_rowmajor(s_term),
                      "cx": cx, "ch": ch})
    return cells


def _upsample_rowmajor(x: jnp.ndarray, out_h: int, out_w: int,
                       pad: bool = False) -> jnp.ndarray:
    """(B, H, C, W) -> (B, out_h, C, out_w), align-corners bilinear via the
    same interpolation matrices as ops/upsample.py. pad=True emits the
    (out_h+2, out_w+2) zero-halo-ringed tensor the cell kernel consumes
    directly — the pad rides along as zero rows/cols of the interp
    matrices, removing a separate XLA pad op per cell per step."""
    import numpy as np
    b, h, c, w = x.shape
    dtype = x.dtype
    rm = _interp_matrix(h, out_h)
    cm = _interp_matrix(w, out_w)
    if pad:
        rm = np.pad(rm, ((1, 1), (0, 0)))
        cm = np.pad(cm, ((1, 1), (0, 0)))
    rm = jnp.asarray(rm, dtype)
    cm = jnp.asarray(cm, dtype)
    x = jnp.einsum("oh,bhcw->bocw", rm, x,
                   preferred_element_type=jnp.float32).astype(dtype)
    x = jnp.einsum("bocw,pw->bocp", x, cm,
                   preferred_element_type=jnp.float32).astype(dtype)
    return x


@functools.lru_cache(maxsize=64)
def _make_gmax_sparse(hh: int, w: int, dtype_name: str):
    """Global max-pool over (H, W) of a row-major (B, H, C, W) tensor with
    SPARSE backward residuals: saves two (B, C) int32 argmax index maps
    instead of the full activation.

    Why: ``jnp.max``'s vjp keeps its (B, H, C, W) input alive for the
    backward — inside the decode scan that stacked every cell's hidden
    state a second time (it is already stored as the next step's carry
    residual), ~0.66 GB of the T=20 b32 save set
    (scripts/analyze_residuals.py). The backward rebuilds the gradient
    mask from iota-vs-index compares — no saved activation.

    Deviation from jnp.max's vjp under TIES: the cotangent routes to the
    first argmax position instead of splitting equally across tied
    maxima. Ties are measure-zero for continuous activations; the
    expected gradient is unchanged."""
    dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def gmax(h):
        return jnp.max(h, axis=(1, 3))

    def fwd(h):
        mw = jnp.max(h, axis=3)                     # (B, H, C)
        iw = jnp.argmax(h, axis=3)                  # (B, H, C)
        ih = jnp.argmax(mw, axis=1)                 # (B, C)
        feats = jnp.max(mw, axis=1)                 # (B, C)
        iw_sel = jnp.take_along_axis(
            iw, ih[:, None, :], axis=1)[:, 0]       # (B, C)
        return feats, (ih.astype(jnp.int32), iw_sel.astype(jnp.int32))

    def bwd(res, dfeat):
        ih, iw = res
        row = lax.broadcasted_iota(
            jnp.int32, (1, hh, 1, 1), 1) == ih[:, None, :, None]
        col = lax.broadcasted_iota(
            jnp.int32, (1, 1, 1, w), 3) == iw[:, None, :, None]
        dh = jnp.where(row & col, dfeat[:, None, :, None].astype(dtype),
                       jnp.zeros((), dtype))
        return (dh,)

    gmax.defvjp(fwd, bwd)
    return gmax


def gmax_sparse(h: jnp.ndarray) -> jnp.ndarray:
    """(B, H, C, W) -> (B, C) max over (H, W), sparse-residual backward."""
    return _make_gmax_sparse(h.shape[1], h.shape[3], h.dtype.name)(h)


def save_small_selected() -> bool:
    """Trace-time policy for the save-small training residuals (the
    upsample-fused cell vjp + sparse gmax). Default OFF: it halves the
    scan-stacked residual bytes (3609 -> 1952 MB at T=20 b32) but
    measured a 1.3% step REGRESSION on v5e (253.3 -> 256.7 ms — the DUS
    stacking it removes was already overlapped, and the backward replay
    + argmax forward are real work; docs/PERF.md round 5). Opt in with
    RSIS_SAVE_SMALL=1 as a memory lever at geometries where the save
    set pressures HBM before remat must turn on. Resolved at step-build
    time like RSIS_DYFOLD (never inside a cached jit)."""
    return os.environ.get("RSIS_SAVE_SMALL", "0") == "1"


def rowmajor_decoder_step(dec_params: dict, cells, carry,
                          interpret: bool = False,
                          differentiable: bool = False, mesh=None):
    """One decode step; carry is a tuple of (h, c) in (B, H, C, W).

    Returns the finest hidden state instead of mask logits; the caller owns
    the mask head (measured per-step on the transposed state beats both a
    row-major per-step head and a deferred T*B-batched head — the dense
    interp matmul FLOPs dominate, not layout: 1.76 vs 2.2 vs 3.05 ms/step
    at the bench geometry; the banded ops/pallas_mask_head halves the
    remainder). differentiable=True routes through the custom_vjp cells
    (ops/pallas_decode_vjp) so the training step can backprop through the
    Pallas kernels. Under a >1-device ``mesh`` every cell call is wrapped
    in shard_map over the batch axis (ops/pallas_decode.shard_cell_fn) —
    the kernels have no GSPMD partitioning rule."""
    from ..ops.pallas_decode import shard_cell_fn

    n = len(cells)
    side_feats = []
    new_carry = []
    h = None
    sharded = mesh is not None and mesh.devices.size > 1
    save_small = differentiable and save_small_selected()
    for i in range(n):
        h_prev, c_prev = carry[i]
        if save_small and i > 0:
            # save-small path: the upsample lives INSIDE the cell vjp, so
            # the scan saves the small h instead of the 4x-bigger x_pad
            from ..ops.pallas_decode_vjp import make_fused_cell_up_vjp
            cell_fn = make_fused_cell_up_vjp(cells[i]["cx"],
                                             cells[i]["ch"],
                                             interpret=interpret)
            if sharded:
                cell_fn = shard_cell_fn(cell_fn, mesh)
            h, c = cell_fn(h, h_prev, c_prev, cells[i]["s"],
                           cells[i]["wt"])
        else:
            x_pad = None
            if i > 0:
                # upsample with the halo pad fused into the interp
                # matrices
                x_pad = _upsample_rowmajor(h, h_prev.shape[1],
                                           h_prev.shape[3], pad=True)
            if differentiable:
                from ..ops.pallas_decode_vjp import make_fused_cell_vjp
                cell_fn = make_fused_cell_vjp(cells[i]["cx"],
                                              cells[i]["ch"],
                                              interpret=interpret)
            else:
                cx_i, ch_i = cells[i]["cx"], cells[i]["ch"]

                def cell_fn(hp, xp, cp, s, w_, _cx=cx_i, _ch=ch_i):
                    return fused_cell_rowmajor(hp, xp, cp, s, w_, cx=_cx,
                                               ch=_ch, interpret=interpret)
            if sharded:
                cell_fn = shard_cell_fn(cell_fn, mesh)
            h, c = cell_fn(h_prev, x_pad, c_prev, cells[i]["s"],
                           cells[i]["wt"])
        new_carry.append((h, c))
        side_feats.append(gmax_sparse(h) if save_small
                          else jnp.max(h, axis=(1, 3)))

    feats = jnp.concatenate(side_feats, axis=-1)
    fc_c = dec_params["fc_class"]
    class_logits = feats @ fc_c["kernel"].astype(feats.dtype) \
        + fc_c["bias"].astype(feats.dtype)
    class_probs = jax.nn.softmax(class_logits, axis=-1)
    fc_s = dec_params["fc_stop"]
    stop_logits = feats @ fc_s["kernel"].astype(feats.dtype) \
        + fc_s["bias"].astype(feats.dtype)
    return (h, class_probs, stop_logits), tuple(new_carry)


def decode_sequence_rowmajor(dec_params: dict, skips, T: int,
                             hidden_size: int, skip_mode: str = "concat",
                             dtype=jnp.bfloat16, interpret: bool = False):
    """T-step scan over the Pallas step; same returns as decode_sequence."""
    from ..ops.mask_head import mask_head_fused
    from ..ops.pallas_mask_head import (
        mask_head_pallas, pallas_head_available)

    cells = _hoist_cells_rowmajor(dec_params, skips, hidden_size, skip_mode)
    carry_nhwc = init_carry(skips, hidden_size, dtype)
    carry0 = tuple((_to_rowmajor(h), _to_rowmajor(c))
                   for h, c in carry_nhwc)
    fine_shape = carry0[-1][0].shape
    use_pallas_head = pallas_head_available(fine_shape) or interpret

    def step(carry, _):
        (h_fine, cls, stop), new_carry = rowmajor_decoder_step(
            dec_params, cells, carry, interpret=interpret)
        if use_pallas_head:
            mask = mask_head_pallas(h_fine,
                                    dec_params["conv_out"]["kernel"],
                                    dec_params["conv_out"]["bias"],
                                    interpret=interpret)
        else:
            mask = mask_head_fused(jnp.moveaxis(h_fine, 2, -1),
                                   dec_params["conv_out"]["kernel"],
                                   dec_params["conv_out"]["bias"])
        # drop the singleton channel BEFORE the scan stacks: a trailing
        # size-1 minor dim on the (T, B, 2H, 2W, 1) output buffer provokes
        # a pathological lane-padded layout (measured ~62 ms of the T=20
        # bench decode in relayout passes)
        return new_carry, (mask[..., 0], cls, stop)

    _, (masks, clss, stops) = lax.scan(step, carry0, None, length=T)
    masks = jnp.moveaxis(masks, 0, 1)  # (B, T, 2H, 2W)
    clss = jnp.moveaxis(clss, 0, 1)
    stops = jnp.moveaxis(stops, 0, 1)
    return masks, clss, stops


def training_rowmajor_selected(cfg, skips, single_device: bool = True
                               ) -> bool:
    """Whether the training step routes through the differentiable Pallas
    cells. Exposed so tests can assert which path they are exercising
    (a prior test silently compared the XLA path to flax because the
    tiny pyramid's H=1 failed the geometry guard).

    Multi-device meshes are supported: the step wraps each cell call in
    shard_map over the batch axis (shard_cell_fn), so ``single_device``
    no longer gates the path; it is kept for call compatibility."""
    del single_device
    # hardware kill-switch (trace-time, like RSIS_DYFOLD): lets bench.py
    # fall back to the XLA training path when a Pallas training kernel
    # regresses on silicon without losing the whole train metric
    if os.environ.get("RSIS_TRAIN_ROWMAJOR", "") == "0":
        return False
    if cfg.pallas == "off" or cfg.skip_mode not in ("concat", "sum",
                                                    "none"):
        return False
    if not all(s.shape[1] % 2 == 0 for s in skips):
        return False  # the kernels' 2-row halo blocks need even H
    # pallas="on" forces the kernels anywhere (interpret off-TPU — slow
    # but exact, used by the CPU parity tests); "auto" gates on hardware
    if cfg.pallas == "on":
        return True
    return (jax.default_backend() == "tpu"
            and all(s.shape[1] % 8 == 0 for s in skips))


def rowmajor_path_available(cfg, skips=None, platform: str | None = None
                            ) -> bool:
    """The Pallas row-major decode needs channel-separable skip fusion and
    tile-friendly geometry (every pyramid level's H divisible by 8)."""
    platform = platform or jax.default_backend()
    if platform != "tpu" or cfg.skip_mode not in ("concat", "sum", "none"):
        return False
    if skips is not None:
        for s in skips:
            if s.shape[1] % 8 != 0:
                return False
    return True
