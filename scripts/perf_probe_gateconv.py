"""Silicon shape-probe of gate-conv matmul factorisations (VERDICT r4 #3).

The decode cells' 9-tap gate conv is one MXU matmul per row-tile whose
weight operand is FIXED at 4C x 9(Cx+C) elements. On a 128x128 systolic
array, any single-matmul factorisation of that weight into (M, K) with
M, K <= 128 has PE occupancy M*K/128^2 — so the weight's element count
is a hard ceiling on MFU no matter how the taps are folded:

  cell4 (cx=16, ch=8):  4C*9Cn = 32*216 = 6912 -> ceiling 6912/16384 = 42.2%
  cell3 (cx=32, ch=16): 64*432 = 27648          -> ceiling 27648/(2*16384) = 84%

Candidate factorisations at cell4 (identical FLOPs per call):

  standard  (32, 216) @ (216, N)   M=25% of rows, K streams 2 tiles -> 21%
  dy-fold   (96,  72) @ ( 72, N)   both dims in ONE tile -> 42.2% = ceiling
  full-fold (288, 24) @ ( 24, N)   all 9 taps in M -> 3 row-tiles -> 14%

dy-fold (shipped round 4, ops/pallas_decode.repack_dyfold) achieves the
ceiling exactly; this probe measures the three shapes as raw serial MXU
chains on silicon to confirm the tile model ranks them correctly — the
measured retirement VERDICT r4 item 3 asks for. Anything past 42% at
cell4 needs fewer FLOPs (Winograd: bf16-unstable + VPU-bound transforms
at C=8) or a wider cell (a model change), not a better matmul shape.

Probe design: a fully SERIAL chain of sub-microsecond matmuls measures
its own dependency plumbing, not the MXU (first attempt: all three
shapes ~2.8-3.1 us behind a ~2.7 us scalar-extract floor). Instead each
chain iteration issues G=64 independent batched matmuls (one
batch-dim dot_general) and carries a cheap (G, N) vector dependency
into the next iteration — the per-iteration overhead amortizes 64x and
the matmul term dominates.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/perf_probe_gateconv.py
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

N = 512         # lane dim (W*pack scale), multiple of 128
G = 64          # independent matmuls per chain iteration
ITERS = 3_000   # chain length inside ONE jit (no dispatch noise)
REPS = 3

# (label, M, K) — all M*K equal => identical FLOPs per call
SHAPES = [
    ("standard  (32,216)", 32, 216),
    ("dy-fold   (96, 72)", 96, 72),
    ("full-fold (288,24)", 288, 24),
]


@jax.jit
def chain(a, b):
    def body(_, carry):
        bb, acc = carry
        y = lax.dot_general(a, bb, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (G, M, N)
        dep = y[:, 0, :].astype(bb.dtype) * 1e-9                 # (G, N)
        return bb.at[:, 0, :].add(dep), acc + jnp.sum(y[:, 0, 0])
    _, acc = lax.fori_loop(0, ITERS, body, (b, jnp.float32(0)))
    return acc


def main():
    print(f"backend={jax.default_backend()} N={N} G={G} iters={ITERS}",
          flush=True)
    flop = 2 * SHAPES[0][1] * SHAPES[0][2] * N  # same for all arms
    for label, m, k in SHAPES:
        key = jax.random.PRNGKey(m)
        a = jax.random.normal(key, (G, m, k), jnp.bfloat16)
        b = jax.random.normal(key, (G, k, N), jnp.bfloat16)
        float(chain(a, b))  # compile + warm
        best = min(_timed(a, b) for _ in range(REPS))
        us = best / (ITERS * G) * 1e6
        tf = flop * ITERS * G / best / 1e12
        occ = m * k / (((m + 127) // 128) * ((k + 127) // 128) * 128 * 128)
        print(f"{label}  {us:7.3f} us/matmul  {tf:6.1f} TF/s  "
              f"tile-model occupancy {occ * 100:4.1f}%", flush=True)


def _timed(a, b):
    t0 = time.perf_counter()
    float(chain(a, b))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
