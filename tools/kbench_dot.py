#!/usr/bin/env python3
"""Isolate mm2 phase costs on TPU: int8 dot vs product phase, at the
decrypt (L=129) and encrypt (L=257) shapes."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pailliercryptolib_python_tpu.ops import pallas_mont2 as pm2  # noqa: E402

TB = 128


def timeit(fn, iters=5):
    out = fn()
    np.asarray(out[:1, :8])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out[:1, :8])
    return (time.perf_counter() - t0) / iters


def dot_kernel_chain(K):
    """16 chained int8 dots (M=K rows out) inside one kernel."""
    def kern(w_ref, a_ref, o_ref):
        w = w_ref[...]

        def body(_, acc):
            y = lax.dot_general(w, acc, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            return (y & 15).astype(jnp.int8)

        o_ref[...] = lax.fori_loop(0, 16, body, a_ref[...]).astype(jnp.int32)

    @jax.jit
    def call(w, a):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((K, TB), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(w, a)
    return call


def prod_kernel_chain(L):
    """16 chained bare products (no reduction) inside one kernel."""
    def kern(a_ref, b_ref, o_ref, t_scr):
        def body(_, acc):
            T = pm2._mm2_product(acc, b_ref[...], t_scr, L)
            return T[:L]

        o_ref[...] = lax.fori_loop(0, 16, body, a_ref[...])

    @jax.jit
    def call(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((L, TB), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM(
                (2 * L + pm2.PROD_UNROLL + 2, TB), jnp.uint32)],
        )(a, b)
    return call


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    for L in (129, 257):
        K = 4 * L
        w = jnp.asarray(rng.integers(0, 16, size=(K, 2 * K)), dtype=jnp.int8)
        a = jnp.asarray(rng.integers(0, 16, size=(2 * K, TB)),
                        dtype=jnp.int8)
        # shape like matmul-1+2 combined: (4L, 8L)@(8L, TB)
        fn = dot_kernel_chain(K)

        def run(fn=fn, w=w, a=a):
            return fn(w, a)
        try:
            dt = timeit(run)
            macs = 16 * K * 2 * K * TB
            print(f"dot L={L}: {dt * 1e3:.2f} ms/16 "
                  f"({dt / 16 * 1e6:.1f} us/dot, "
                  f"{macs / dt / 1e12:.1f} TMAC/s)", flush=True)
        except Exception as e:
            print(f"dot L={L}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

        av = jnp.asarray(rng.integers(0, 1 << 16, size=(L, TB)),
                         dtype=jnp.uint32)
        bv = jnp.asarray(rng.integers(0, 1 << 16, size=(L, TB)),
                         dtype=jnp.uint32)
        fnp = prod_kernel_chain(L)

        def runp(fnp=fnp, av=av, bv=bv):
            return fnp(av, bv)
        try:
            dt = timeit(runp)
            print(f"prod L={L}: {dt * 1e3:.2f} ms/16 "
                  f"({dt / 16 * 1e6:.1f} us/product)", flush=True)
        except Exception as e:
            print(f"prod L={L}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
