"""On-device augmentation must match the host (NumPy) geometry exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from rsis_tpu.data.augment import (
    affine_warp, rotation_matrix, shear_matrix, translation_matrix,
    zoom_matrix)
from rsis_tpu.data.base import sequence_from_masks, unpack_target
from rsis_tpu.data.device_aug import (
    _nearest_index_map, affine_warp_batch, augment_batch, augment_wire_batch,
    random_flip_batch, sample_affine_matrices)


class TestDeviceWarpMatchesHost:
    def test_same_matrix_same_result(self):
        rng = np.random.default_rng(0)
        imgs = rng.random((3, 16, 12, 2)).astype(np.float32)
        m = (rotation_matrix(23.0) @ translation_matrix(1.0, -1.5)
             @ shear_matrix(4.0) @ zoom_matrix(0.9, 1.1))
        ms = jnp.asarray(np.stack([m] * 3).astype(np.float32))
        for mode in ["nearest", "bilinear"]:
            got = np.asarray(affine_warp_batch(jnp.asarray(imgs), ms, mode))
            for b in range(3):
                want = affine_warp(np.moveaxis(imgs[b], -1, 0), m, mode)
                want = np.moveaxis(want, 0, -1)
                np.testing.assert_allclose(got[b], want, atol=1e-4)

    def test_per_sample_matrices_differ(self):
        img = np.tile(np.arange(8, dtype=np.float32)[None, :, None],
                      (8, 1, 1))[None]
        imgs = jnp.asarray(np.concatenate([img, img]))
        m_id = np.eye(3, dtype=np.float32)
        m_tr = translation_matrix(0.0, 2.0).astype(np.float32)
        out = np.asarray(affine_warp_batch(
            imgs, jnp.asarray(np.stack([m_id, m_tr])), "nearest"))
        np.testing.assert_array_equal(out[0], np.asarray(img[0]))
        assert not np.array_equal(out[1], np.asarray(img[0]))


class TestFlipAndFullAug:
    def test_flip_consistent_across_tensors(self):
        rng = jax.random.PRNGKey(0)
        imgs = jnp.asarray(np.random.default_rng(1).random(
            (4, 8, 8, 3)).astype(np.float32))
        ins = (imgs[..., 0] > 0.5).astype(jnp.int32)
        out_imgs, out_ins = random_flip_batch(rng, imgs, ins)
        np.testing.assert_array_equal(
            np.asarray((out_imgs[..., 0] > 0.5).astype(jnp.int32)),
            np.asarray(out_ins))

    def test_augment_batch_jits_and_preserves_labels(self):
        rng = jax.random.PRNGKey(2)
        b, h, w = 2, 16, 16
        imgs = jnp.zeros((b, h, w, 3), jnp.float32)
        ins = jnp.zeros((b, h, w), jnp.int32).at[:, 4:10, 4:10].set(2)
        seg = (ins > 0).astype(jnp.int32)
        fn = jax.jit(lambda r, i, n, s: augment_batch(
            r, i, n, s, rotation=15.0, translation=0.05, shear=2.0))
        out_imgs, out_ins, out_seg = fn(rng, imgs, ins, seg)
        assert out_imgs.shape == imgs.shape
        # label values survive nearest warp (no interpolation of ids)
        assert set(np.unique(np.asarray(out_ins))) <= {0, 2}
        np.testing.assert_array_equal(np.asarray(out_ins > 0),
                                      np.asarray(out_seg > 0))


class TestWireBatchAugment:
    """The on-device wire-path augmentation (inside the jitted train step)
    must reproduce the host path's warp-then-pack result for the same
    matrix and flip decision (VERDICT round 1 item 6)."""

    def _instance_scene(self, h=40, w=48):
        ins = np.zeros((h, w), np.int64)
        seg = np.zeros((h, w), np.int64)
        ins[8:16, 10:20] = 1
        seg[8:16, 10:20] = 2
        ins[22:34, 26:40] = 2
        seg[22:34, 26:40] = 1
        img = np.random.default_rng(0).normal(
            size=(h, w, 3)).astype(np.float32)
        return img, ins, seg

    def test_wire_warp_equals_host_warp_then_pack(self):
        img, ins, seg = self._instance_scene()
        h, w = ins.shape
        n = 4
        # one fixed, modest matrix (blobs stay in frame, area order stable)
        m = (rotation_matrix(7.0) @ translation_matrix(2.0, -3.0)
             @ shear_matrix(3.0))

        # host path: warp raw tensors per-sample, then pack
        img_chw = np.moveaxis(img, -1, 0)
        img_h = affine_warp(img_chw, m, mode="nearest")
        ins_h = affine_warp(ins[None].astype(np.float64), m,
                            mode="nearest")[0].astype(np.int64)
        seg_h = affine_warp(seg[None].astype(np.float64), m,
                            mode="nearest")[0].astype(np.int64)
        target_h = sequence_from_masks(ins_h, seg_h, n)
        y_mask_h, _, _, _ = unpack_target(target_h[None])

        # device path: pack first, then warp image + packed masks with the
        # same matrix through the wire-batch augmenter's gather map
        target_d = sequence_from_masks(ins, seg, n)
        y_mask_d, _, _, _ = unpack_target(target_d[None])
        idx = np.asarray(_nearest_index_map(jnp.asarray(m, jnp.float32),
                                            h, w))
        x_d = img.reshape(h * w, 3)[idx].reshape(h, w, 3)
        masks_d = np.asarray(y_mask_d[0])[:, idx]

        np.testing.assert_allclose(x_d, np.moveaxis(img_h, 0, -1),
                                   atol=1e-5)
        np.testing.assert_array_equal(masks_d, y_mask_h[0])

    def test_augment_wire_batch_consistency(self):
        """Image and masks move together; weights/classes are untouched;
        identity config (0 ranges, no zoom) + unlucky flip still possible,
        so check structural invariants over a real random draw."""
        img, ins, seg = self._instance_scene()
        h, w = ins.shape
        n = 4
        target = sequence_from_masks(ins, seg, n)
        y_mask, _, _, _ = unpack_target(target[None])
        x = jnp.asarray(np.stack([img, img]))
        masks = jnp.asarray(np.stack([y_mask[0], y_mask[0]]))

        fn = jax.jit(lambda k, x, mk: augment_wire_batch(
            k, x, mk, rotation=10.0, translation=0.1, shear=5.0,
            zoom_range=None))
        x2, m2 = fn(jax.random.PRNGKey(3), x, masks)
        assert x2.shape == x.shape and m2.shape == masks.shape
        m2 = np.asarray(m2)
        # masks stay binary and instances survive a modest warp
        assert set(np.unique(m2)) <= {0.0, 1.0}
        assert (m2.reshape(2, n, -1).sum(-1)[:, :2] > 0).all()
        # the two samples got independent transforms (w.h.p.)
        assert not np.array_equal(m2[0], m2[1])

    def test_zero_ranges_noop_geometry(self):
        """rotation=translation=shear=0, no zoom: the affine is the
        identity gather; only the random flip can change anything."""
        img, ins, seg = self._instance_scene()
        h, w = ins.shape
        m = np.asarray(sample_affine_matrices(
            jax.random.PRNGKey(0), 3, h, w, 0.0, 0.0, 0.0, None))
        np.testing.assert_allclose(m, np.broadcast_to(np.eye(3), (3, 3, 3)),
                                   atol=1e-7)
        idx = np.asarray(_nearest_index_map(jnp.asarray(np.eye(3),
                                                        jnp.float32), h, w))
        np.testing.assert_array_equal(idx, np.arange(h * w))


class TestShardedWarpAug:
    def test_mesh_warp_matches_single_device(self):
        """The shard_map-wrapped Pallas warp (pallas_call has no GSPMD
        rule) must reproduce the single-device augmentation exactly on a
        2-device mesh (interpret mode, force_warp)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        b, h, w, n = 4, 128, 128, 3
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((b, h, w, 3)).astype(np.float32))
        y = jnp.asarray((rng.random((b, n, h * w)) > 0.7).astype(np.uint8))
        key = jax.random.PRNGKey(5)

        single = augment_wire_batch(key, x, y, 10.0, 0.1, 5.0, (0.8, 1.0),
                                    force_warp=True)

        mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("data",))
        bsh = NamedSharding(mesh, P("data"))
        fn = jax.jit(
            lambda k, x, y: augment_wire_batch(
                k, x, y, 10.0, 0.1, 5.0, (0.8, 1.0), mesh=mesh,
                force_warp=True),
            in_shardings=(NamedSharding(mesh, P()), bsh, bsh),
            out_shardings=(bsh, bsh))
        sharded = fn(key, jax.device_put(x, bsh), jax.device_put(y, bsh))

        np.testing.assert_array_equal(np.asarray(single[0]),
                                      np.asarray(sharded[0]))
        np.testing.assert_array_equal(np.asarray(single[1]),
                                      np.asarray(sharded[1]))
