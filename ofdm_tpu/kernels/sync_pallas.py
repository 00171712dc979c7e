"""Pallas TPU kernel: fused frame-sync correlation + power + argmax.

The XLA path (ops/xcorr.py) computes the sliding correlation with an MXU
conv, materializes the [B, T] complex correlation in HBM, then reduces it.
This kernel fuses the whole search: each grid program DMAs an overlapping
window of the sample stream into VMEM, accumulates the 80-tap complex
correlation on the VPU, and reduces power -> (tile max, tile argmax) without
ever writing the correlation out.  HBM traffic drops from ~3x the stream to
~1x, which matters when sync scans long capture buffers.

Outputs per (batch, tile): max power and argmax position; the final cross-tile
argmax (with first-occurrence tie-breaking like src/signals/mod.rs:205-214)
is a tiny XLA reduction in ``sync_offset_pallas``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _kernel(sr_hbm, si_hbm, tr_ref, ti_ref, max_ref, arg_ref,
            sr_buf, si_buf, sems, *, k: int, t_valid: int):
    b = pl.program_id(0)
    tile = pl.program_id(1)
    start = tile * TILE

    # DMA the overlapping [TILE + k - 1] window from HBM to VMEM.
    cp0 = pltpu.make_async_copy(sr_hbm.at[b, pl.ds(start, TILE + k - 1)],
                                sr_buf, sems.at[0])
    cp1 = pltpu.make_async_copy(si_hbm.at[b, pl.ds(start, TILE + k - 1)],
                                si_buf, sems.at[1])
    cp0.start()
    cp1.start()
    cp0.wait()
    cp1.wait()

    def body(j, acc):
        acc_re, acc_im = acc
        xr = sr_buf[pl.ds(j, TILE)]
        xi = si_buf[pl.ds(j, TILE)]
        trj = tr_ref[j]
        tij = ti_ref[j]
        # (xr + j xi) * conj(trj + j tij)
        acc_re = acc_re + xr * trj + xi * tij
        acc_im = acc_im + xi * trj - xr * tij
        return acc_re, acc_im

    zero = jnp.zeros((TILE,), jnp.float32)
    acc_re, acc_im = jax.lax.fori_loop(0, k, body, (zero, zero))
    power = acc_re * acc_re + acc_im * acc_im

    # mask positions beyond the valid scan range
    pos = start + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0]
    power = jnp.where(pos < t_valid, power, -1.0)

    max_ref[0, 0] = jnp.max(power)
    arg_ref[0, 0] = start + jnp.argmax(power).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _tiled_search(sr, si, tr, ti, *, k: int, interpret: bool = False):
    b_sz, t_ext = sr.shape
    t_valid = t_ext - (k - 1)
    n_tiles = -(-t_valid // TILE)
    # pad so every tile's window load is in range
    need = n_tiles * TILE + k - 1
    sr = jnp.pad(sr, ((0, 0), (0, need - t_ext)))
    si = jnp.pad(si, ((0, 0), (0, need - t_ext)))

    kern = functools.partial(_kernel, k=k, t_valid=t_valid)
    maxes, args = pl.pallas_call(
        kern,
        grid=(b_sz, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda b, t: (b, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b, t: (b, t), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_sz, n_tiles), jnp.float32),
            jax.ShapeDtypeStruct((b_sz, n_tiles), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE + k - 1,), jnp.float32),
            pltpu.VMEM((TILE + k - 1,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(sr, si, tr, ti)
    return maxes, args


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
    cand = jnp.where(maxes == gmax, args, jnp.iinfo(jnp.int32).max)
    lag = jnp.min(cand, axis=-1)
    off = lag - 1
    return off[0] if squeeze else off
