"""One-pass Pallas weight-gradient kernel vs the shifted-einsum oracle.

weight_grad_rowmajor (ops/pallas_decode_vjp.py) accumulates
dwt = sum_pixels dgates ⊗ taps across the whole (B, H/th) grid with a
VMEM-resident accumulator — replacing _weight_grad's 9 (h) + 9 (x)
full-tensor einsums per cell per backward step. These tests pin exact
layout + halo/SAME-pad parity against _weight_grad at the pyramid's
geometry extremes; the full custom_vjp path (which now routes through
the kernel by default) is covered by tests/test_pallas_vjp.py and
tests/test_pallas_dyfold.py::test_dyfold_full_vjp_matches_jax_grad.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rsis_tpu.ops.pallas_decode import pad_hcw
from rsis_tpu.ops.pallas_decode_vjp import _weight_grad, weight_grad_rowmajor


def _case(seed, b, h, w, cx, ch, dt):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    hp = jax.random.normal(ks[0], (b, h, ch, w), dt)
    x = (jax.random.normal(ks[1], (b, h, cx, w), dt) if cx else None)
    dg = jax.random.normal(ks[2], (b, h, 4 * ch, w), dt)
    return hp, x, dg


def test_dwt_fine_cell_parity():
    # cell4-shaped: pack=1, multiple row tiles, x-input present
    hp, x, dg = _case(0, 2, 32, 128, 16, 8, jnp.float32)
    x_pad = pad_hcw(x)
    ref = _weight_grad(hp, x_pad, dg, 16, 8)
    out = weight_grad_rowmajor(hp, x_pad, dg, cx=16, ch=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_dwt_coarse_packed_no_x():
    # cell0-shaped: lane pack 8, single row tile, no up-input
    hp, _, dg = _case(1, 2, 8, 16, 0, 16, jnp.float32)
    ref = _weight_grad(hp, None, dg, 0, 16)
    out = weight_grad_rowmajor(hp, None, dg, cx=0, ch=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_dwt_packed_with_x():
    # mid-pyramid: pack 2 (w=64), x-input present, several tiles
    hp, x, dg = _case(2, 2, 16, 64, 8, 8, jnp.float32)
    x_pad = pad_hcw(x)
    ref = _weight_grad(hp, x_pad, dg, 8, 8)
    out = weight_grad_rowmajor(hp, x_pad, dg, cx=8, ch=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_dwt_bf16_inputs():
    # the train path's compute dtype: bf16 operands, fp32 accumulation.
    # _weight_grad also accumulates fp32 (preferred_element_type), so the
    # two should agree to bf16-input noise
    hp, x, dg = _case(3, 2, 32, 128, 16, 8, jnp.bfloat16)
    x_pad = pad_hcw(x)
    ref = np.asarray(_weight_grad(hp, x_pad, dg, 16, 8), np.float32)
    out = np.asarray(weight_grad_rowmajor(hp, x_pad, dg, cx=16, ch=8,
                                          interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, atol=5e-2, rtol=5e-2)
