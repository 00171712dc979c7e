"""Pallas TPU kernel: fused frame-sync correlation + power + argmax.

The XLA path (ops/xcorr.py) computes the sliding correlation with a conv,
materializes the [B, T] complex correlation in HBM, then reduces it.  This
kernel fuses the whole search: each grid program owns 8 batch rows (the VPU
sublane dimension), streams overlapping [8, TILE+K-1] windows of the sample
stream from HBM to VMEM, accumulates the 80-tap complex correlation on the
VPU, and reduces power -> per-tile (max, argmax) — the correlation itself
never touches HBM.

The running (max power, argmax) pair is carried through the tile loop with a
strict-greater update, which preserves the reference argmax's
first-occurrence tie-breaking (src/signals/mod.rs:205-214); positions are
carried as f32 (< 2^24, exact).  Output: [B, 128] with columns 0/1 holding
the final (max, argmax) per row.

Status: verified bit-identical to the XLA path in interpret mode
(tests/test_kernels.py).  On the current remote-compile toolchain the
80-tap static unroll makes Mosaic compilation impractically slow, and the
XLA conv path already runs the same search at ~0.1 ms/64 streams (MXU), so
the conv path is the production default; this kernel documents the fused
VMEM-resident formulation for toolchains where it compiles quickly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512       # lag positions per tile (VPU lane dim)
ROWS = 8         # batch rows per program (VPU sublane dim)
WIN = TILE + 128  # DMA window: covers TILE + K-1 taps, 128-lane aligned
OUT_COLS = 128   # output lane padding: col 0 = max power, col 1 = argmax


def _kernel(sr_hbm, si_hbm, tr_ref, ti_ref, out_ref, sr_buf, si_buf, sems,
            *, k: int, t_valid: int, n_tiles: int):
    prog = pl.program_id(0)
    r0 = prog * ROWS

    def tile_body(t, carry):
        best_max, best_arg = carry
        start = t * TILE
        cp0 = pltpu.make_async_copy(
            sr_hbm.at[pl.ds(r0, ROWS), pl.ds(start, WIN)],
            sr_buf, sems.at[0])
        cp1 = pltpu.make_async_copy(
            si_hbm.at[pl.ds(r0, ROWS), pl.ds(start, WIN)],
            si_buf, sems.at[1])
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()

        # static unroll over the K taps: slice starts become compile-time
        # constants, which Mosaic can lower as (unaligned) vector loads —
        # dynamic starts would need 128-alignment proofs.
        acc_re = jnp.zeros((ROWS, TILE), jnp.float32)
        acc_im = jnp.zeros((ROWS, TILE), jnp.float32)
        for j in range(k):
            xr = sr_buf[:, j:j + TILE]
            xi = si_buf[:, j:j + TILE]
            trj = tr_ref[j]
            tij = ti_ref[j]
            acc_re = acc_re + xr * trj + xi * tij
            acc_im = acc_im + xi * trj - xr * tij
        power = acc_re * acc_re + acc_im * acc_im

        pos = start + jax.lax.broadcasted_iota(jnp.int32, (ROWS, TILE), 1)
        power = jnp.where(pos < t_valid, power, -1.0)

        tile_max = jnp.max(power, axis=1)
        tile_arg = (start + jnp.argmax(power, axis=1)).astype(jnp.float32)
        # strict > keeps the first occurrence across tiles (reference argmax
        # tie-breaking, src/signals/mod.rs:205-214)
        better = tile_max > best_max
        return (jnp.where(better, tile_max, best_max),
                jnp.where(better, tile_arg, best_arg))

    init = (jnp.full((ROWS,), -2.0, jnp.float32),
            jnp.zeros((ROWS,), jnp.float32))
    best_max, best_arg = jax.lax.fori_loop(0, n_tiles, tile_body, init)
    # build the output with masked selects (scatter is not lowerable on TPU)
    col = jax.lax.broadcasted_iota(jnp.int32, (ROWS, OUT_COLS), 1)
    out = jnp.where(col == 0, best_max[:, None],
                    jnp.where(col == 1, best_arg[:, None], 0.0))
    out_ref[...] = out


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _tiled_search(sr, si, tr, ti, *, k: int, interpret: bool = False):
    b_sz, t_ext = sr.shape
    t_valid = t_ext - (k - 1)
    n_tiles = -(-t_valid // TILE)
    b_pad = -b_sz % ROWS
    need = n_tiles * TILE + WIN
    sr = jnp.pad(sr, ((0, b_pad), (0, need - t_ext)))
    si = jnp.pad(si, ((0, b_pad), (0, need - t_ext)))
    bp = b_sz + b_pad

    kern = functools.partial(_kernel, k=k, t_valid=t_valid, n_tiles=n_tiles)
    out = pl.pallas_call(
        kern,
        grid=(bp // ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, OUT_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, OUT_COLS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROWS, WIN), jnp.float32),
            pltpu.VMEM((ROWS, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(sr, si, tr, ti)
    return out[:b_sz, 0], out[:b_sz, 1]


def sync_offset_pallas(samples: jnp.ndarray, template: np.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.xcorr.locking_sync_offset on TPU.

    samples: complex[B, T] (or [T]); template: complex[K].
    Returns offsets[B] = peak_lag - 1 (reference semantics, lags >= 0).
    """
    squeeze = samples.ndim == 1
    if squeeze:
        samples = samples[None, :]
    k = int(template.shape[-1])
    sr = jnp.real(samples).astype(jnp.float32)
    si = jnp.imag(samples).astype(jnp.float32)
    # extend right so every lag in [0, T-1] has a full window
    sr = jnp.pad(sr, ((0, 0), (0, k - 1)))
    si = jnp.pad(si, ((0, 0), (0, k - 1)))
    tr = jnp.real(template).astype(jnp.float32)
    ti = jnp.imag(template).astype(jnp.float32)

    _, args = _tiled_search(sr, si, tr, ti, k=k, interpret=interpret)
    off = args.astype(jnp.int32) - 1
    return off[0] if squeeze else off
