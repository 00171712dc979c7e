"""Pallas alignment-copy kernel: per-row dynamic frame extraction.

The receive chain must slice ``need`` samples starting at a per-row sync
offset (the reference's ``split_off(offset)``, src/receiver.rs:20-25).  The
XLA lowering of the planar per-row dynamic_slice moves ~90 GB/s on a v5e
chip; this kernel reaches ~120 GB/s by doing the unaligned shift in
registers:

  - the planar [R, 2, T] f32 view is tiled to [R, 2, T/128, 128];
  - per row, ``off = 128 q + s``: the q-tile window is a *tile-dim* dynamic
    slice (Mosaic requires lane-dim indices provably 128-aligned, so the
    lane-dim shift cannot be a dynamic_slice);
  - the residual s is an aligned lane rotate (`pltpu.roll`) with a
    cross-tile carry select: out[i, j] = w[i + (j+s >= 128), (j+s) % 128].

Bit-exact vs the XLA gather (it is a pure copy); parity locked by
tests/test_kernels.py in interpret mode and by the byte-equality gates on
TPU (bench.py, tools/exp_align_pallas.py measured 0.655 vs 0.864 ms at the
headline shape, batch 256 x 19120 samples).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(offs_ref, in_ref, out_ref, *, n_out_tiles):
    off = offs_ref[pl.program_id(0)]
    q = off // 128
    s = off - q * 128
    w = in_ref[0, :, pl.ds(q, n_out_tiles + 1), :]       # [2, T+1, 128]
    rolled = pltpu.roll(w, shift=-s, axis=2)
    down = jnp.concatenate([rolled[:, 1:, :], rolled[:, :1, :]], axis=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
    sel = jnp.where(lanes < 128 - s, rolled, down)
    out_ref[0] = sel[:, :n_out_tiles, :]


def planar_align(flat: jnp.ndarray, offsets: jnp.ndarray, need: int,
                 interpret: bool = False) -> jnp.ndarray:
    """complex[R, T], int[R] -> complex[R, need]; row r holds
    ``flat[r, offsets[r] : offsets[r] + need]``.  Offsets must already be
    clipped to [0, T - need] (decode_frame does)."""
    r, t = flat.shape
    f = jnp.stack([jnp.real(flat), jnp.imag(flat)], axis=1)   # [R, 2, T]
    n_out_tiles = -(-need // 128)
    # enough tiles that the largest legal q still has a full window + carry
    tiles = max(-(-t // 128), (t - need) // 128 + n_out_tiles + 1)
    f = jnp.pad(f, ((0, 0), (0, 0), (0, tiles * 128 - t)))
    f = f.reshape(r, 2, tiles, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[pl.BlockSpec((1, 2, tiles, 128),
                               lambda i, offs: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 2, n_out_tiles, 128),
                               lambda i, offs: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_out_tiles=n_out_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, 2, n_out_tiles, 128), f.dtype),
        interpret=interpret,
    )(offsets.astype(jnp.int32), f)
    a = out.reshape(r, 2, n_out_tiles * 128)[:, :, :need]
    return jax.lax.complex(a[:, 0], a[:, 1])
