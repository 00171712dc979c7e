"""Pallas TPU kernel: fused frame-sync correlation + power + argmax.

The XLA path (ops/xcorr.py) computes the sliding correlation with a conv,
materializes the [B, T] complex correlation in HBM, then reduces it.  This
kernel fuses the whole search: each grid program owns 8 batch rows (the VPU
sublane dimension), streams overlapping [8, TILE+K-1] windows of the sample
stream from HBM to VMEM, accumulates the 80-tap complex correlation on the
VPU, and reduces power -> per-tile (max, argmax) — the correlation itself
never touches HBM.

Outputs: [B, 2*TCOLS] f32 where column t holds tile t's max power and column
TCOLS+t its argmax (as f32; positions < 2^24 are exact).  The final
cross-tile argmax with first-occurrence tie-breaking (matching
src/signals/mod.rs:205-214) is a tiny XLA reduction in
``sync_offset_pallas``.
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
TCOLS = 128      # max tiles supported -> T <= TILE * TCOLS samples


def _kernel(sr_hbm, si_hbm, tr_ref, ti_ref, out_ref, sr_buf, si_buf, sems,
            *, k: int, t_valid: int, n_tiles: int):
    prog = pl.program_id(0)
    r0 = prog * ROWS

    out_ref[...] = jnp.full((ROWS, 2 * TCOLS), -1.0, jnp.float32)

    def tile_body(t, _):
        start = t * TILE
        cp0 = pltpu.make_async_copy(
            sr_hbm.at[pl.ds(r0, ROWS), pl.ds(start, TILE + k - 1)],
            sr_buf, sems.at[0])
        cp1 = pltpu.make_async_copy(
            si_hbm.at[pl.ds(r0, ROWS), pl.ds(start, TILE + k - 1)],
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

        out_ref[:, t] = jnp.max(power, axis=1)
        out_ref[:, TCOLS + t] = (start + jnp.argmax(power, axis=1)).astype(
            jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _tiled_search(sr, si, tr, ti, *, k: int, interpret: bool = False):
    b_sz, t_ext = sr.shape
    t_valid = t_ext - (k - 1)
    n_tiles = -(-t_valid // TILE)
    assert n_tiles <= TCOLS, f"stream too long for sync kernel: {n_tiles} tiles"
    b_pad = -b_sz % ROWS
    need = n_tiles * TILE + k - 1
    sr = jnp.pad(sr, ((0, b_pad), (0, need - t_ext)))
    si = jnp.pad(si, ((0, b_pad), (0, need - t_ext)))
    bp = b_sz + b_pad

    kern = functools.partial(_kernel, k=k, t_valid=t_valid, n_tiles=n_tiles)
    out = pl.pallas_call(
        kern,
        grid=(bp // ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, 2 * TCOLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 2 * TCOLS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROWS, TILE + k - 1), jnp.float32),
            pltpu.VMEM((ROWS, TILE + k - 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(sr, si, tr, ti)
    return out[:b_sz, :TCOLS], out[:b_sz, TCOLS:]


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

    maxes, args = _tiled_search(sr, si, tr, ti, k=k, interpret=interpret)
    # first-occurrence tie-break: among tiles with the global max, lowest index
    gmax = jnp.max(maxes, axis=-1, keepdims=True)
    cand = jnp.where(maxes == gmax, args, jnp.inf)
    lag = jnp.min(cand, axis=-1).astype(jnp.int32)
    off = lag - 1
    return off[0] if squeeze else off
