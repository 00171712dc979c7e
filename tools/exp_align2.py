"""TPU experiment: alignment-gather layout variants (the ~0.55 ms slice of
the 1.66 ms decode chain).

Variants, align-only, chained cache-proof (carry enters through the offsets
via min(carry, 0) — zero at runtime but opaque to XLA, so every dispatch is
dependency-linked and unique without touching the 39 MB input):

  1. production: [R, 2, T] planar, one (2, need) dynamic_slice per row
  2. per-plane:  [R, T] f32 x2 planes, two 1-D slices per row
  3. complex row gather (prior reference point, ~1.4x slower end-to-end)
  4. planar single-plane [R, 2T] interleave-free: real and imag planes
     concatenated on the time axis, one (need,)+(need,) pair via a single
     (2*need) slice of a [R, 2T] layout where imag starts at T (start offsets
     differ per half -> two slices; kept for layout-lowering comparison)

Run nohup'd:  setsid nohup python3 tools/exp_align2.py > /tmp/exp_align2.log 2>&1 &
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import ofdm_tpu as ot

BATCH = 256
PAYLOAD = 8192
STEPS = 64


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def align_prod(flat, offs, need):
    f = jnp.stack([jnp.real(flat), jnp.imag(flat)], axis=1)   # [R, 2, T]

    def take(row, off):
        return jax.lax.dynamic_slice(row, (0, off), (2, need))

    a = jax.vmap(take)(f, offs)
    return jax.lax.complex(a[:, 0], a[:, 1])


def align_planes(flat, offs, need):
    re, im = jnp.real(flat), jnp.imag(flat)                   # [R, T] x2

    def take(row, off):
        return jax.lax.dynamic_slice(row, (off,), (need,))

    return jax.lax.complex(jax.vmap(take)(re, offs), jax.vmap(take)(im, offs))


def align_complex(flat, offs, need):
    def take(row, off):
        return jax.lax.dynamic_slice(row, (off,), (need,))

    return jax.vmap(take)(flat, offs)


def align_cat(flat, offs, need):
    t = flat.shape[-1]
    f = jnp.concatenate([jnp.real(flat), jnp.imag(flat)], axis=-1)  # [R, 2T]

    def take(row, off):
        re = jax.lax.dynamic_slice(row, (off,), (need,))
        im = jax.lax.dynamic_slice(row, (off + t,), (need,))
        return re, im

    re, im = jax.vmap(take)(f, offs)
    return jax.lax.complex(re, im)


def run(name, fn, rx, offs, need):
    @jax.jit
    def step(s, o, carry):
        o = o + jnp.minimum(carry, 0.0).astype(o.dtype)
        a = fn(s, o, need)
        chk = jnp.real(a[0, 0]) + jnp.imag(a[-1, -1])
        return carry + 1.0 + chk.astype(jnp.float32) * 1e-9

    carry = step(rx, offs, jnp.float32(0.0))
    float(carry)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        carry = step(rx, offs, carry)
    float(carry)
    dt = (time.perf_counter() - t0) / STEPS
    log(f"{name:16s}: {dt*1e3:6.3f} ms")


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    frame = 880 + nb * 80
    need = frame

    rng = np.random.default_rng(0)
    d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
    tx = ot.encode(d, guard_bands=True, modulation=mod)
    rx = ot.channel(tx, snr=45.0, key=jax.random.key(0))
    rx = jnp.pad(rx, ((0, 0), (0, max(0, frame + 128 - rx.shape[-1]))))
    rx = jax.block_until_ready(rx)
    offs = jnp.asarray(rng.integers(0, 64, BATCH, dtype=np.int32))

    run("planar [R,2,T]", align_prod, rx, offs, need)
    run("planes x2", align_planes, rx, offs, need)
    run("complex rows", align_complex, rx, offs, need)
    run("concat [R,2T]", align_cat, rx, offs, need)
    log("DONE")


if __name__ == "__main__":
    main()
