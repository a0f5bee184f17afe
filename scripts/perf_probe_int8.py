"""Feasibility probe: int8 conv throughput vs bf16 on v5e.

The decode-bench encoder is at the bf16 compute floor (docs/PERF.md);
the only way past it is a lower-precision MXU path. This probe times
the resnet101 layer3 bottleneck conv shapes (the ~31 ms bulk of the
encoder) as bf16 vs int8 (`preferred_element_type=int32`) inside one
jit with a serial fori chain, floor-subtracted per docs/PERF.md
protocol. If int8 isn't >=1.5x here, the quantized-encoder idea dies.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_int8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def timed(fn, *args, iters=3):
    fn_j = jax.jit(fn)
    float(jnp.sum(fn_j(*args)))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = fn_j(*args)
    s = float(jnp.sum(out))  # forces completion (block_until_ready lies
    # over the tunnel — docs/PERF.md)
    dt = (time.time() - t0) / iters * 1e3
    return dt, s


def conv(x, k, dims=("NHWC", "HWIO", "NHWC")):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=dims)


def conv_i8(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def chain(convfn, x, k, n):
    # serial dependency so XLA can't overlap iterations; cast the output
    # back to the input dtype to keep the chain type-stable
    def body(_, acc):
        y = convfn(acc, k)
        return (y & 127).astype(x.dtype) if y.dtype == jnp.int32 \
            else y.astype(x.dtype)
    return jax.lax.fori_loop(0, n, body, x)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(3)
    # layer3 bottleneck 3x3 at the decode-bench geometry
    b, h, w, c = 32, 32, 64, 256
    n = 16
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)
    xi = jnp.asarray(rng.integers(-100, 100, (b, h, w, c)), jnp.int8)
    ki = jnp.asarray(rng.integers(-100, 100, (3, 3, c, c)), jnp.int8)

    for tag, fn, xx, kk in (
        ("bf16", conv, x.astype(jnp.bfloat16), k.astype(jnp.bfloat16)),
        ("int8", conv_i8, xi, ki),
    ):
        try:
            dt, s = timed(lambda a, b_: chain(fn, a, b_, n), xx, kk)
            per = dt / n
            gflop = 2 * b * h * w * c * c * 9 / 1e9
            print(f"{tag}: {per:7.3f} ms/conv  "
                  f"{gflop / per * 1e3 / 1e3:6.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)

    # int8 matmul reference point (known-good MXU int8 path)
    m = 4096
    a8 = jnp.asarray(rng.integers(-100, 100, (m, m)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-100, 100, (m, m)), jnp.int8)
    ab = a8.astype(jnp.bfloat16)
    bb = b8.astype(jnp.bfloat16)

    def mm_i8(a, b_):
        def body(_, acc):
            y = jax.lax.dot(acc, b_, preferred_element_type=jnp.int32)
            return (y & 127).astype(jnp.int8)
        return jax.lax.fori_loop(0, 8, body, a)

    def mm_bf(a, b_):
        def body(_, acc):
            return jax.lax.dot(acc, b_).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, 8, body, a)

    for tag, fn, a, b_ in (("bf16 mm", mm_bf, ab, bb),
                           ("int8 mm", mm_i8, a8, b8)):
        try:
            dt, s = timed(fn, a, b_)
            per = dt / 8
            tf = 2 * m**3 / per / 1e9
            print(f"{tag}: {per:7.3f} ms  {tf:6.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)


if __name__ == "__main__":
    main()
