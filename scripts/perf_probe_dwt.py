"""Isolated probe: per-step cost of the cell weight-gradient einsums.

_weight_grad (ops/pallas_decode_vjp.py) computes dwt as 9 (h) + 9 (x)
shifted "bhgw,bhcw->gc" einsums per cell per backward step — each one
re-reads the full dgates tensor, so at cell4 of the T=20 train step the
HBM traffic may dominate. This measures, at each train-geometry cell:
  (a) the shipped _weight_grad,
  (b) a single same-FLOPs jnp.dot roofline (one read of both operands),
with the fori-loop serial-dependency protocol (docs/PERF.md): subtract
the 0.74 ms/iter floor mentally when bodies are tiny.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_dwt.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from rsis_tpu.ops.pallas_decode_vjp import (_weight_grad,  # noqa: E402
                                            weight_grad_rowmajor)

# train-geometry pyramid (cityscapes recipe, 256x512 input):
# (name, cx, ch, H, W)
CELLS = [
    ("cell0", 0, 128, 8, 16),
    ("cell1", 128, 64, 16, 32),
    ("cell2", 64, 32, 32, 64),
    ("cell3", 32, 16, 64, 128),
    ("cell4", 16, 8, 128, 256),
]
B, ITERS = 32, 10


def timed(fn, *args) -> float:
    """ms/iter of fn under a serially-dependent fori loop."""

    @jax.jit
    def loop(*args):
        def body(i, acc):
            out = fn(*[a + acc.astype(a.dtype) * 1e-6 if j == 0 else a
                       for j, a in enumerate(args)])
            return acc + out.astype(jnp.float32).ravel()[0] * 1e-6
        return lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    print(f"backend={jax.default_backend()} B={B}", flush=True)
    k = jax.random.PRNGKey(0)
    total_a = total_b = total_p = 0.0
    for name, cx, ch, h, w in CELLS:
        ks = jax.random.split(jax.random.fold_in(k, h), 3)
        dt = jnp.bfloat16
        dg = jax.random.normal(ks[0], (B, h, 4 * ch, w), dt)
        hp = jax.random.normal(ks[1], (B, h, ch, w), dt)
        xp = (jnp.pad(jax.random.normal(ks[2], (B, h, cx, w), dt),
                      ((0, 0), (1, 1), (0, 0), (1, 1))) if cx else None)

        ms_a = timed(lambda d, hh: _weight_grad(hh, xp, d, cx, ch), dg, hp)
        ms_p = timed(lambda d, hh: weight_grad_rowmajor(
            hh, xp, d, cx=cx, ch=ch), dg, hp)

        # roofline twin: same FLOPs as ONE tap pair's einsum x9, single
        # pass over both operands
        cn = cx + ch
        a2 = jax.random.normal(ks[0], (4 * ch, B * h * w), dt)
        b2 = jax.random.normal(ks[1], (B * h * w, 9 * cn), dt)
        ms_b = timed(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
            a2, b2)
        total_a += ms_a
        total_b += ms_b
        total_p += ms_p
        print(f"{name}: einsum {ms_a:7.3f} ms   pallas {ms_p:7.3f} ms   "
              f"one-matmul roofline {ms_b:7.3f} ms", flush=True)
    print(f"TOTAL per backward step: einsum {total_a:.2f} ms, "
          f"pallas {total_p:.2f} ms (roofline {total_b:.2f})", flush=True)


if __name__ == "__main__":
    main()
