"""Fused on-device augmentation: batched affine warp + flip in one jit.

The geometric twin of augment.py (same center-origin inverse warp, clamped
gather interpolation, R @ T @ Sh @ Z composition) expressed in jnp over a
whole batch, so augmentation runs on the TPU fused into the input pipeline
instead of per-sample on the host (BASELINE.json north star: "resize /
normalize / flip augmentation ... as fused on-device image transforms").

Masks use nearest interpolation, images follow ``interp``; one matrix per
sample is drawn with jax.random so the whole thing lives inside the train
step if desired.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def sample_affine_matrices(rng: jax.Array, batch: int, h: int, w: int,
                           rotation: float = 0.0, translation: float = 0.0,
                           shear: float = 0.0,
                           zoom_range: Tuple[float, float] | None = None
                           ) -> jnp.ndarray:
    """(B, 3, 3) fused matrices with the reference composition order."""
    ks = jax.random.split(rng, 5)
    deg = jax.random.uniform(ks[0], (batch,), minval=-rotation,
                             maxval=rotation)
    t = deg * (math.pi / 180.0)
    cos, sin = jnp.cos(t), jnp.sin(t)
    zero = jnp.zeros_like(t)
    one = jnp.ones_like(t)
    rot = jnp.stack([cos, -sin, zero, sin, cos, zero, zero, zero, one],
                    -1).reshape(batch, 3, 3)

    tx = jax.random.uniform(ks[1], (batch,), minval=-translation,
                            maxval=translation) * h
    ty = jax.random.uniform(ks[2], (batch,), minval=-translation,
                            maxval=translation) * w
    trans = jnp.stack([one, zero, tx, zero, one, ty, zero, zero, one],
                      -1).reshape(batch, 3, 3)

    sdeg = jax.random.uniform(ks[3], (batch,), minval=-shear, maxval=shear)
    st = sdeg * (math.pi / 180.0)
    sh = jnp.stack([one, -jnp.sin(st), zero, zero, jnp.cos(st), zero,
                    zero, zero, one], -1).reshape(batch, 3, 3)

    m = rot @ trans @ sh
    if zoom_range is not None:
        z = jax.random.uniform(ks[4], (batch, 2), minval=zoom_range[0],
                               maxval=zoom_range[1])
        zm = jnp.stack([z[:, 0], zero, zero, zero, z[:, 1], zero,
                        zero, zero, one], -1).reshape(batch, 3, 3)
        m = m @ zm
    return m


def _warp_one(img: jnp.ndarray, matrix: jnp.ndarray,
              mode: str) -> jnp.ndarray:
    """Warp (H, W, C) by one 3x3 matrix; center-origin inverse map."""
    h, w, c = img.shape
    a = matrix[:2, :2]
    b = matrix[:2, 2]
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    coords = jnp.stack([rows - (h / 2.0 - 0.5),
                        cols - (w / 2.0 - 0.5)], axis=-1).reshape(-1, 2)
    new = coords @ a.T + b
    nr = new[:, 0] + (h / 2.0 - 0.5)
    nc = new[:, 1] + (w / 2.0 - 0.5)
    flat = img.reshape(-1, c)
    if mode == "nearest":
        ri = jnp.clip(jnp.round(jnp.clip(nr, 0, h - 1)), 0,
                      h - 1).astype(jnp.int32)
        ci = jnp.clip(jnp.round(jnp.clip(nc, 0, w - 1)), 0,
                      w - 1).astype(jnp.int32)
        out = flat[ri * w + ci]
    else:
        r = jnp.clip(nr, 0, h - 2)
        cc = jnp.clip(nc, 0, w - 2)
        r0 = jnp.floor(r)
        c0 = jnp.floor(cc)
        rd = (r - r0)[:, None]
        cd = (cc - c0)[:, None]
        r0 = r0.astype(jnp.int32)
        c0 = c0.astype(jnp.int32)
        v00 = flat[r0 * w + c0]
        v10 = flat[(r0 + 1) * w + c0]
        v01 = flat[r0 * w + c0 + 1]
        v11 = flat[(r0 + 1) * w + c0 + 1]
        out = (v00 * (1 - rd) * (1 - cd) + v10 * rd * (1 - cd)
               + v01 * (1 - rd) * cd + v11 * rd * cd)
    return out.reshape(h, w, c).astype(img.dtype)


def affine_warp_batch(imgs: jnp.ndarray, matrices: jnp.ndarray,
                      mode: str = "bilinear") -> jnp.ndarray:
    """(B, H, W, C) warped per-sample by (B, 3, 3) matrices."""
    return jax.vmap(lambda im, m: _warp_one(im, m, mode))(imgs, matrices)


def random_flip_batch(rng: jax.Array, imgs: jnp.ndarray,
                      *mask_batches) -> tuple:
    """Per-sample 50% horizontal flip applied consistently to image + masks."""
    b = imgs.shape[0]
    flip = jax.random.bernoulli(rng, 0.5, (b,))

    def apply(x):
        flipped = jnp.flip(x, axis=2)
        shape = (b,) + (1,) * (x.ndim - 1)
        return jnp.where(flip.reshape(shape), flipped, x)

    return (apply(imgs),) + tuple(apply(m) for m in mask_batches)


def _nearest_index_map(matrix: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(H*W,) flat source indices for a nearest-neighbour inverse warp —
    one gather map per sample serves the image and every packed mask."""
    a = matrix[:2, :2]
    b = matrix[:2, 2]
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    coords = jnp.stack([rows - (h / 2.0 - 0.5),
                        cols - (w / 2.0 - 0.5)], axis=-1).reshape(-1, 2)
    new = coords @ a.T + b
    ri = jnp.clip(jnp.round(new[:, 0] + (h / 2.0 - 0.5)), 0,
                  h - 1).astype(jnp.int32)
    ci = jnp.clip(jnp.round(new[:, 1] + (w / 2.0 - 0.5)), 0,
                  w - 1).astype(jnp.int32)
    return ri * w + ci


def zoom_range_for(cfg) -> Tuple[float, float] | None:
    """The dataset-dependent zoom range of the host pipeline
    (data/base.py InstanceDataset.__init__), shared by the device path."""
    if not cfg.resize and cfg.dataset != "pascal":
        return None
    if cfg.dataset == "pascal":
        return (cfg.zoom, max(cfg.zoom * 2, 1.0))
    return (cfg.zoom, 1.0)


def augment_wire_batch(rng: jax.Array, x: jnp.ndarray, y_mask: jnp.ndarray,
                       rotation: float, translation: float, shear: float,
                       zoom_range: Tuple[float, float] | None,
                       mesh=None, force_warp: bool | None = None):
    """On-device train-batch augmentation: per-sample 50% flip + one fused
    affine, applied consistently to images (B, H, W, 3) and the packed
    instance masks (B, N, H*W) the wire format carries.

    Geometric twin of the host path (data/base.py:169-175): flip first,
    then the fused R @ T @ Sh @ Z inverse warp with nearest interpolation
    (the host pipeline warps images with nearest too, matching the
    reference's transform engine, src/dataloader/transforms/transforms.py).
    Nearest sampling is a gather, so it commutes with both the per-instance
    binarization of the packed masks and the mean/std normalization of the
    image — warping after packing/normalizing equals the host's
    warp-then-pack order, except that instances warped fully out of frame
    keep their (now all-zero) slot instead of being re-sorted out.
    """
    from ..ops.pallas_warp import affine_warp_planes, warp_available

    b, h, w = x.shape[:3]
    n = y_mask.shape[1]
    k_flip, k_aff = jax.random.split(rng)

    masks = y_mask.reshape(b, n, h, w)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    ms = sample_affine_matrices(k_aff, b, h, w, rotation, translation,
                                shear, zoom_range)
    # instance masks are disjoint (sequence_from_masks splits an instance
    # map), so the N mask planes collapse into ONE id plane for the warp,
    # and the N-plane expansion afterwards is a cheap elementwise compare.
    # ids <= N are exact in either payload dtype. The reduction stays u8
    # end-to-end: products n*mask <= N < 256 fit a byte, and max (not
    # sum) needs no wider accumulator — equal to the weighted sum on
    # disjoint planes. The previous int32 einsum lowered to a dot whose
    # converted operand materialized the full (B, N, H, W) tensor as s32
    # in HBM (335 MB + a 1.0 ms relayout copy at the train geometry,
    # docs/PERF.md round 5); the u8 multiply+max fuses into one pass over
    # the 4x-smaller wire bytes.
    ids = jnp.max(masks * jnp.arange(1, n + 1, dtype=jnp.uint8)
                  [None, :, None, None], axis=1)

    use_warp = (warp_available(h, w, rotation, shear, zoom_range,
                               translation)
                and jax.default_backend() == "tpu")
    if force_warp is not None:
        use_warp = force_warp
    if use_warp:
        # two-pass Pallas warp (ops/pallas_warp): one-hot MXU matmuls
        # replace the per-element gather (31 -> 7.6 ms at the train
        # geometry), and the flip folds into the index map for free.
        # pallas_call has no GSPMD partitioning rule, so multi-device
        # meshes run the warp per-shard through shard_map (everything is
        # batch-parallel; matrices/flips shard with the batch).
        interp = jax.default_backend() != "tpu"
        planes = jnp.concatenate(
            [jnp.moveaxis(x, -1, 1), ids[:, None].astype(x.dtype)],
            axis=1)                                     # (B, C+1, H, W)
        if mesh is not None and mesh.devices.size > 1:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            bsp = P(tuple(mesh.axis_names))
            warp = shard_map(
                lambda pl_, ms_, fl_: affine_warp_planes(
                    pl_, ms_, flip=fl_, interpret=interp),
                mesh=mesh, in_specs=(bsp, bsp, bsp), out_specs=bsp,
                check_vma=False)
            warped = warp(planes, ms, flip)
        else:
            warped = affine_warp_planes(planes, ms, flip=flip,
                                        interpret=interp)
        x = jnp.moveaxis(warped[:, :-1], 1, -1)
        ids_w = warped[:, -1].reshape(b, 1, h * w)
    else:
        # fallback: physical flip + per-element gather (TPU gathers are
        # per-row-expensive — measured 143 ms for the (B*HW, N) f32
        # gather at the train geometry vs ~7 ms for the id plane; the
        # payload follows the image's compute dtype, halving bytes trims
        # ~20%)
        x = jnp.where(flip[:, None, None, None], jnp.flip(x, axis=2), x)
        ids = jnp.where(flip[:, None, None], jnp.flip(ids, axis=2), ids)
        idx = jax.vmap(lambda m: _nearest_index_map(m, h, w))(ms)
        payload = jnp.concatenate(
            [x.reshape(b, h * w, -1),
             ids.reshape(b, h * w, 1).astype(x.dtype)], axis=-1)
        warped = jax.vmap(lambda im, ix: im[ix])(payload, idx)
        x = warped[..., :-1].reshape(b, h, w, -1)
        ids_w = warped[..., -1].reshape(b, 1, h * w)

    lbl = jnp.arange(1, n + 1, dtype=x.dtype)[None, :, None]
    masks = (ids_w == lbl).astype(y_mask.dtype)
    return x, masks.reshape(b, n, h * w)


def augment_batch(rng: jax.Array, imgs: jnp.ndarray, ins: jnp.ndarray,
                  seg: jnp.ndarray, rotation: float = 10.0,
                  translation: float = 0.1, shear: float = 0.1,
                  zoom_range=None, interp: str = "nearest"):
    """Full on-device augmentation: flip + one fused affine per sample.

    imgs: (B, H, W, 3) float; ins/seg: (B, H, W) integer maps.
    """
    b, h, w = imgs.shape[:3]
    k_flip, k_aff = jax.random.split(rng)
    imgs, ins, seg = random_flip_batch(k_flip, imgs, ins, seg)
    ms = sample_affine_matrices(k_aff, b, h, w, rotation, translation,
                                shear, zoom_range)
    imgs = affine_warp_batch(imgs, ms, interp)
    ins = affine_warp_batch(ins[..., None].astype(jnp.float32), ms,
                            "nearest")[..., 0].astype(ins.dtype)
    seg = affine_warp_batch(seg[..., None].astype(jnp.float32), ms,
                            "nearest")[..., 0].astype(seg.dtype)
    return imgs, ins, seg
