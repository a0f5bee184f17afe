"""On-device augmentation must match the host (NumPy) geometry exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from rsis_tpu.data.augment import (
    affine_warp, rotation_matrix, shear_matrix, translation_matrix,
    zoom_matrix)
from rsis_tpu.data.device_aug import (
    affine_warp_batch, augment_batch, random_flip_batch)


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
