"""Probe: which ops Mosaic compiles for the fused rx kernel.

Tiny kernels, each exercising one questionable op at [128, 128]:
  atan2, sin/cos, int32 xor/shift/and, round+clip, lane-dim concat,
  matmul with f32 const, f32 -> uint8 cast + store.

Run nohup'd:  setsid nohup python3 tools/exp_pallas_probe.py > /tmp/exp_probe.log 2>&1 &
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def try_kernel(name, kernel, out_dtype, *inputs, ref=None):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), out_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        t0 = time.time()
        out = np.asarray(jax.jit(f)(*inputs))
        dt = time.time() - t0
        ok = True if ref is None else np.allclose(out, ref, atol=1e-5)
        log(f"{name}: OK compile+run {dt:.1f}s, matches={ok}")
    except Exception as e:
        log(f"{name}: FAILED {repr(e)[:300]}")


def main():
    log("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    an, bn = np.asarray(a), np.asarray(b)

    def k_atan2(ar, br, o):
        o[:] = jnp.arctan2(ar[:], br[:])
    try_kernel("atan2", k_atan2, jnp.float32, a, b, ref=np.arctan2(an, bn))

    def k_trig(ar, o):
        o[:] = jnp.sin(ar[:]) + jnp.cos(ar[:])
    try_kernel("sin+cos", k_trig, jnp.float32, a, ref=np.sin(an) + np.cos(an))

    def k_int(ar, o):
        r = jnp.clip(jnp.round((ar[:] + 7.0) * 0.5), 0, 7).astype(jnp.int32)
        g = r ^ (r >> 1)
        o[:] = ((g >> 1) & 1).astype(jnp.float32)
    rn = np.clip(np.round((an + 7.0) * 0.5), 0, 7).astype(np.int32)
    gn = rn ^ (rn >> 1)
    try_kernel("round+clip+xor+shift", k_int, jnp.float32, a,
               ref=((gn >> 1) & 1).astype(np.float32))

    def k_concat(ar, br, o):
        c = jnp.concatenate([ar[:, :64], br[:, :64]], axis=1)
        o[:] = c
    try_kernel("lane concat", k_concat, jnp.float32, a, b,
               ref=np.concatenate([an[:, :64], bn[:, :64]], axis=1))

    def k_mm(ar, br, o):
        o[:] = jnp.dot(ar[:], br[:], preferred_element_type=jnp.float32)
    try_kernel("matmul", k_mm, jnp.float32, a, b, ref=an @ bn)

    def k_u8(ar, o):
        o[:] = jnp.clip(ar[:] * 20 + 128, 0, 255).astype(jnp.uint8)
    try_kernel("f32->uint8 store", k_u8, jnp.uint8, a,
               ref=np.clip(an * 20 + 128, 0, 255).astype(np.uint8))

    # composite: the actual demod+pack shape of work
    W = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    Wn = np.asarray(W)

    def k_comp(ar, w, o):
        y = jnp.dot(ar[:], w[:], preferred_element_type=jnp.float32)
        phi = jnp.mean(jnp.arctan2(y[:, 48:52], y[:, 0:4] + 3.0),
                       axis=1, keepdims=True)
        c, s = jnp.cos(phi), jnp.sin(phi)
        dr = y[:, :48] * c + y[:, 48:96] * s
        r = jnp.clip(jnp.round((dr + 7.0) * 0.5), 0, 7).astype(jnp.int32)
        g = r ^ (r >> 1)
        planes = [((g >> t) & 1).astype(jnp.float32) for t in range(3)]
        bits = jnp.concatenate(planes, axis=1)       # [128, 144]
        o[:] = bits[:, :128]
    try_kernel("composite demod", k_comp, jnp.float32, a, W)

    log("DONE")


if __name__ == "__main__":
    main()
