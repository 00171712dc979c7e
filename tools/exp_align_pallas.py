"""TPU experiment: Pallas per-row alignment copy vs the XLA planar gather.

The production alignment is a vmapped dynamic_slice of a [2, need] tile per
row (0.87 ms standalone at the headline shape, tools/exp_align2.py) — ~90
GB/s effective, well under HBM speed-of-light.  This kernel pulls each row
into VMEM once and does the unaligned lane-dim slice there:

    grid (R,);  in block [1, 2, T] VMEM;  out block [1, 2, need];
    off via scalar prefetch;  out = in[0, :, pl.ds(off, need)].

Run nohup'd: setsid nohup python3 tools/exp_align_pallas.py > /tmp/exp_align_pallas.log 2>&1 &
"""

import functools
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

BATCH = 256
NEED = 19120
T = 152 * 128  # multiple of 128, covers need + one carry tile
STEPS = 64


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def _kernel(offs_ref, in_ref, out_ref, *, n_out_tiles):
    # View: [2, n_tiles, 128] (tile = 128 lanes).  off = 128 q + s:
    # dynamic-slice q on the tile dim (aligned), rotate lanes by s with a
    # cross-tile carry select — out[i, j] = w[i + (j + s >= 128), (j+s)%128].
    off = offs_ref[pl.program_id(0)]
    q = off // 128
    s = off - q * 128
    w = in_ref[0, :, pl.ds(q, n_out_tiles + 1), :]       # [2, T+1, 128]
    rolled = pltpu.roll(w, shift=-s, axis=2)
    down = jnp.concatenate([rolled[:, 1:, :], rolled[:, :1, :]], axis=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
    sel = jnp.where(lanes < 128 - s, rolled, down)
    out_ref[0] = sel[:, :n_out_tiles, :]


def align_pallas(f, offs, need, interpret=False):
    """f: [R, 2, T] f32 (T multiple of 128) -> [R, 2, ceil128(need)]."""
    r, two, t = f.shape
    assert t % 128 == 0
    n_out_tiles = -(-need // 128)
    tiles = f.reshape(r, 2, t // 128, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[pl.BlockSpec((1, 2, t // 128, 128),
                               lambda i, offs: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 2, n_out_tiles, 128),
                               lambda i, offs: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_out_tiles=n_out_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, 2, n_out_tiles, 128), f.dtype),
        interpret=interpret,
    )(offs, tiles)
    return out.reshape(r, 2, n_out_tiles * 128)[:, :, :need]


def align_xla(f, offs, need):
    def take(row, off):
        return jax.lax.dynamic_slice(row, (0, off), (2, need))

    return jax.vmap(take)(f, offs)


def run(name, fn, f, offs, need):
    @jax.jit
    def step(s, o, carry):
        o = o + jnp.minimum(carry, 0.0).astype(o.dtype)
        a = fn(s, o, need)
        chk = a[0, 0, 0] + a[-1, -1, -1]
        return carry + 1.0 + chk.astype(jnp.float32) * 1e-9

    carry = step(f, offs, jnp.float32(0.0))
    float(carry)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        carry = step(f, offs, carry)
    float(carry)
    dt = (time.perf_counter() - t0) / STEPS
    log(f"{name:16s}: {dt*1e3:6.3f} ms")


def main():
    log("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((BATCH, 2, T), dtype=np.float32))
    offs = jnp.asarray(rng.integers(0, 64, BATCH, dtype=np.int32))
    f = jax.block_until_ready(f)

    # correctness first (against the XLA path)
    want = np.asarray(align_xla(f, offs, NEED))
    got = np.asarray(align_pallas(f, offs, NEED))
    assert np.array_equal(want, got), "pallas align mismatch"
    log("pallas align matches XLA gather")

    run("xla planar", align_xla, f, offs, NEED)
    run("pallas vmem", align_pallas, f, offs, NEED)
    log("DONE")


if __name__ == "__main__":
    main()
