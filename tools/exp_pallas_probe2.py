"""Probe 2: HIGHEST-precision matmul, int32 output + left shift, and a
full software atan2 (polynomial) inside a Mosaic kernel.

Run nohup'd:  setsid nohup python3 tools/exp_pallas_probe2.py > /tmp/exp_probe2.log 2>&1 &
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


def try_kernel(name, kernel, out_dtype, *inputs, ref=None, atol=1e-5):
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
        if ref is None:
            ok = "n/a"
        else:
            ok = bool(np.allclose(out, ref, atol=atol))
            if not ok:
                err = np.max(np.abs(out.astype(np.float64)
                                    - ref.astype(np.float64)))
                ok = f"False (max err {err:.2e})"
        log(f"{name}: OK compile+run {dt:.1f}s, matches={ok}")
    except Exception as e:
        log(f"{name}: FAILED {repr(e)[:300]}")


def atan2_soft(y, x):
    """Software atan2 on f32 vectors (Mosaic-friendly ops only)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-37)
    s = t * t
    # minimax-style poly for atan(t), t in [0,1] (Estrin of the classic 9-term)
    p = jnp.float32(-0.0117212)
    p = p * s + jnp.float32(0.0528266)
    p = p * s + jnp.float32(-0.1169332)
    p = p * s + jnp.float32(0.1936566)
    p = p * s + jnp.float32(-0.3325680)
    p = p * s + jnp.float32(0.9999706)
    r = p * t
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def main():
    log("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    an, bn = np.asarray(a), np.asarray(b)

    def k_mm_hi(ar, br, o):
        o[:] = jax.lax.dot_general(
            ar[:], br[:], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    try_kernel("matmul HIGHEST", k_mm_hi, jnp.float32, a, b,
               ref=(an.astype(np.float64) @ bn.astype(np.float64)), atol=1e-3)

    def k_i32(ar, o):
        lo = jnp.clip(jnp.round(jnp.abs(ar[:]) * 1000), 0, 65535).astype(jnp.int32)
        hi = jnp.clip(jnp.round(jnp.abs(ar[:]) * 500), 0, 65535).astype(jnp.int32)
        o[:] = lo + (hi << 16)
    lon = np.clip(np.round(np.abs(an) * 1000), 0, 65535).astype(np.int64)
    hin = np.clip(np.round(np.abs(an) * 500), 0, 65535).astype(np.int64)
    ref = (lon + (hin << 16)).astype(np.int64).astype(np.int32)
    try_kernel("int32 out + lshift", k_i32, jnp.int32, a, ref=ref, atol=0)

    def k_atan2(yr, xr, o):
        o[:] = atan2_soft(yr[:], xr[:])
    try_kernel("software atan2", k_atan2, jnp.float32, a, b,
               ref=np.arctan2(an, bn), atol=2e-4)

    # CPU reference check of atan2_soft accuracy over a dense grid
    ys, xs = np.meshgrid(np.linspace(-8, 8, 301), np.linspace(-8, 8, 301))
    got = np.asarray(jax.jit(atan2_soft, backend="cpu")(
        jnp.asarray(ys.astype(np.float32)), jnp.asarray(xs.astype(np.float32))))
    err = np.max(np.abs(got - np.arctan2(ys, xs)))
    log(f"atan2_soft dense-grid max err: {err:.2e} rad")

    log("DONE")


if __name__ == "__main__":
    main()
