"""The Pallas kernels' matmul precision must be pinned, not inherited.

Under the process-global ``jax_default_matmul_precision = "highest"``
(which this suite's conftest and scripts/tpu_smoke.py both set for the
torch-parity comparisons), an unpinned bf16 ``jnp.dot`` lowers to a
``tpu.matmul`` with ``contract_precision<fp32>`` — and Mosaic rejects
that combination on v5e with "Bad lhs type" (observed 2026-08-19 in
tpu_smoke's check_dyfold: the *standard* cell kernel failed to compile
on silicon only because the harness had flipped the global default).

ops/pallas_decode.mxu_dot pins DEFAULT for sub-fp32 operands (bf16
multiplies accumulate exactly into fp32 regardless, so nothing is lost)
and HIGHEST for fp32 operands (exact — the configuration the f32 parity
checks validated on hardware). These tests lock the pin by inspecting
the traced jaxpr, which works on CPU: the bug is a lowering-input
property, visible without a TPU.
"""

import jax
import jax.numpy as jnp
import pytest

from rsis_tpu.ops.pallas_decode import mxu_dot


def _dot_precision(a_dtype):
    a = jnp.zeros((8, 128), a_dtype)
    b = jnp.zeros((128, 128), a_dtype)
    jaxpr = jax.make_jaxpr(mxu_dot)(a, b)
    eqns = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert len(eqns) == 1, jaxpr
    return eqns[0].params["precision"]


@pytest.mark.parametrize("global_prec", ["default", "highest"])
def test_bf16_dot_pins_default_precision(global_prec):
    with jax.default_matmul_precision(global_prec):
        prec = _dot_precision(jnp.bfloat16)
    assert prec == (jax.lax.Precision.DEFAULT,) * 2 or \
        prec == jax.lax.Precision.DEFAULT, prec


@pytest.mark.parametrize("global_prec", ["default", "highest"])
def test_f32_dot_pins_highest_precision(global_prec):
    with jax.default_matmul_precision(global_prec):
        prec = _dot_precision(jnp.float32)
    assert prec == (jax.lax.Precision.HIGHEST,) * 2 or \
        prec == jax.lax.Precision.HIGHEST, prec


def test_no_unpinned_kernel_dots():
    """No Pallas kernel may call jnp.dot/lax.dot_general directly — every
    MXU contraction goes through mxu_dot so the precision pin is global."""
    import pathlib

    import rsis_tpu.ops as ops_pkg
    ops_dir = pathlib.Path(ops_pkg.__file__).parent
    offenders = []
    for f in sorted(ops_dir.glob("pallas_*.py")):
        src = f.read_text()
        # strip the mxu_dot definition itself (pallas_decode.py)
        if f.name == "pallas_decode.py":
            src = src.replace("lax.dot_general(a, b, dimension_numbers", "")
        for needle in ("jnp.dot(", "lax.dot_general(", "jax.lax.dot("):
            if needle in src:
                offenders.append(f"{f.name}: {needle}")
    assert not offenders, offenders
