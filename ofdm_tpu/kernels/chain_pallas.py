"""Slot-major fused sync+align chunk kernel (the "chunked" route).

One Pallas pass per row: banded-Toeplitz sync correlation + first-occurrence
argmax + window take + chunk regroup into SLOT-MAJOR chunk planes
f32[2, slots, 128] (chunk c at slot (c % n_cls) * m_per + c // n_cls,
samples at lanes 0:sym_len).  The decode tail (phy/rx.py
decode_chunked_matrix) then consumes the planes directly: the
contiguous-window route's output relayout / [.., n_chunks, sym] reshape /
plane-split copies never exist (round-4 HLO audit: 578 -> 421 MB/step of
entry writes at the headline shape).

MEASURED STATUS (round 5, healthy-band A/B, tools/exp_r5_harness.py): the
traffic saving does NOT translate to time on the attached chip — the
chunked route ran ~0.22 ms/step SLOWER than the fused contiguous route
(1.10 vs 0.88 ms best), the extra per-program selection-matmul work and
constant DMAs outweighing the saved copies.  It stays in the tree as a
tested alternative for runtimes whose XLA relayout behavior differs, and
as the living home of the chunk-regroup techniques.

The round-4 one-pass FULL-chain kernel (sync through byte pack in one
Pallas program) that this file previously carried was byte-perfect but
1.6x slower and was removed in round 5; its techniques and the measured
reasons it lost are preserved in docs/MOSAIC_TECHNIQUES.md (the code is in
git history).

Mosaic constraints baked in here: lane-dim dynamic indices must be provably
128-aligned (slice tiles, roll lanes); static roll shifts must be
non-negative; rolled (offset-layout) views can't be concatenated or
matmul'd — decompose into partial matmuls.
"""

from __future__ import annotations

import functools
from functools import lru_cache
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_CONFIG, FrameConfig
from .align_pallas import _take_window

LANE = 128


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


@lru_cache(maxsize=None)
def _class_geometry(sym: int, n_chunks: int):
    n_cls = 128 // gcd(sym, 128)
    span = sym * n_cls // 128
    m_per = -(-n_chunks // n_cls)
    m_per = -(-m_per // 8) * 8
    # +2: the high-tile select (S1) reads row k0 + span*m + 1
    k_rows = 2 + max((sym * q - (sym * q) % 128) // 128 + span * (m_per - 1)
                     for q in range(n_cls))
    k_pad = -(-k_rows // 8) * 8
    return n_cls, span, m_per, k_pad


@lru_cache(maxsize=None)
def _select_matrix(sym: int, n_chunks: int, hi: bool = False) -> np.ndarray:
    """[n_cls * m_per, k_pad] 0/1 gather: row q*m_per + m selects window
    tile row floor(sym*(m*n_cls + q)/128) (+1 for the ``hi`` carry tile) —
    chunk c = m*n_cls + q starts at lane (sym*q) % 128 of that tile."""
    n_cls, span, m_per, k_pad = _class_geometry(sym, n_chunks)
    s = np.zeros((n_cls * m_per, k_pad), np.float32)
    for q in range(n_cls):
        k0 = (sym * q - (sym * q) % 128) // 128
        for m in range(m_per):
            s[q * m_per + m, k0 + span * m + (1 if hi else 0)] = 1.0
    return s


def _sync_chunk_kernel(in_ref, w_ref, s_ref, s1_ref, outr_ref, outi_ref, *,
                       t, max_off, sym, n_cls, m_per, k_pad,
                       n_lag_tiles, lag_bound, real_template):
    """sync + align + chunk regroup ONLY: emits slot-major chunk planes
    f32[2, slots, 128] (chunk c at slot (c % n_cls) * m_per + c // n_cls,
    samples at lanes 0:sym).  The decode tail then never needs the
    row-major -> batch-minor relayout + [.., n_chunks, sym] reshape copies
    of the contiguous-window output (round-4 HLO audit: ~136 MB/step)."""
    sr = in_ref[0, 0]
    si = in_ref[0, 1]
    n_tiles = sr.shape[0]
    srn = pltpu.roll(sr, shift=n_tiles - 1, axis=0)
    sin = pltpu.roll(si, shift=n_tiles - 1, axis=0)
    n = n_lag_tiles
    if real_template:
        cre = _dot(sr[:n], w_ref[0:128, :]) + _dot(srn[:n], w_ref[128:256, :])
        cim = _dot(si[:n], w_ref[0:128, :]) + _dot(sin[:n], w_ref[128:256, :])
    else:
        c = (_dot(sr[:n], w_ref[0:128, :]) + _dot(srn[:n], w_ref[128:256, :])
             + _dot(si[:n], w_ref[256:384, :])
             + _dot(sin[:n], w_ref[384:512, :]))
        cre, cim = c[:, :128], c[:, 128:]
    power = cre * cre + cim * cim
    tiles_i = jax.lax.broadcasted_iota(jnp.int32, power.shape, 0)
    lanes_i = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1)
    lag = tiles_i * 128 + lanes_i
    p = jnp.where(lag < lag_bound, power, -1.0)
    peak = jnp.max(p)
    idx = jnp.min(jnp.where(p == peak, lag, jnp.int32(2 * t)))
    off = jnp.clip(idx - 1, 0, max_off)

    w = _take_window(in_ref, off, k_pad)
    xlr = _dot(s_ref[:, :], w[0])
    xli = _dot(s_ref[:, :], w[1])
    xhr = _dot(s1_ref[:, :], w[0])
    xhi = _dot(s1_ref[:, :], w[1])

    def regroup(xl, xh):
        parts = []
        for q in range(n_cls):
            s_q = (sym * q) % 128
            lo = xl[q * m_per:(q + 1) * m_per, :]
            hi = xh[q * m_per:(q + 1) * m_per, :]
            if s_q == 0:
                parts.append(lo)
                continue
            rl = pltpu.roll(lo, shift=128 - s_q, axis=1)
            rh = pltpu.roll(hi, shift=128 - s_q, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, rl.shape, 1)
            parts.append(jnp.where(lane < 128 - s_q, rl, rh))
        return jnp.concatenate(parts, axis=0)

    # two separate plane outputs: a single [2, slots, 128] output gets
    # split into dense per-plane copies by the XLA tail (67 MB/step)
    outr_ref[0] = regroup(xlr, xhr)
    outi_ref[0] = regroup(xli, xhi)


def sync_align_chunked(flat, template, *, n_chunks: int,
                       cfg: FrameConfig = DEFAULT_CONFIG,
                       search_window: int | None = None,
                       interpret: bool = False):
    """complex64[R, T] or planar f32[R, 2, T] -> two f32[R, slots, 128]
    slot-major chunk planes (see _sync_chunk_kernel; separate re/im
    outputs so the tail never splits a stacked tensor).  Returns
    ((re, im), slots, m_per) — slot/chunk mapping as in the module docstring."""
    from ..ops.xcorr import (_TEMPLATE_STORE, _template_is_real,
                             _toeplitz_template, _toeplitz_template_real)
    sym = cfg.sym_len
    assert sym <= 128
    need = n_chunks * sym
    tpl = np.asarray(template)
    k = tpl.shape[-1]
    assert k <= 128
    key = (tpl.tobytes(), k)
    _TEMPLATE_STORE[key] = tpl
    real_template = _template_is_real(tpl)
    if real_template:
        w = jnp.asarray(_toeplitz_template_real(key, k, "float32"))
    else:
        w = jnp.asarray(_toeplitz_template(key, k, "float32"))

    if flat.ndim == 3:
        r, _, t = flat.shape
        planes = flat.astype(jnp.float32)
    else:
        r, t = flat.shape
        planes = jnp.stack([jnp.real(flat), jnp.imag(flat)],
                           axis=1).astype(jnp.float32)
    assert t >= need

    n_cls, span, m_per, k_pad = _class_geometry(sym, n_chunks)
    lag_bound = t if search_window is None else min(t, search_window + k)
    n_lag_tiles = -(-lag_bound // 128)
    if flat.ndim == 3 and t % 128 == 0 and t // 128 >= k_pad + 2:
        tiles = t // 128
        n_lag_tiles = min(n_lag_tiles, tiles - 1)
        lag_bound = min(lag_bound, n_lag_tiles * 128)
    else:
        tiles = max(n_lag_tiles + 1, (t - need) // 128 + k_pad + 2)
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, tiles * 128 - t)))
    planes = planes.reshape(r, 2, tiles, 128)
    max_off = min(t - need, (tiles - k_pad - 1) * 128 - 1)
    assert max_off >= 0

    smat = jnp.asarray(_select_matrix(sym, n_chunks))
    smat1 = jnp.asarray(_select_matrix(sym, n_chunks, hi=True))
    slots = n_cls * m_per
    kern = functools.partial(
        _sync_chunk_kernel, t=t, max_off=max_off, sym=sym, n_cls=n_cls,
        m_per=m_per, k_pad=k_pad, n_lag_tiles=n_lag_tiles,
        lag_bound=lag_bound, real_template=real_template)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 2, tiles, 128), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(tuple(w.shape), lambda i: (0, 0)),
            pl.BlockSpec((slots, k_pad), lambda i: (0, 0)),
            pl.BlockSpec((slots, k_pad), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, slots, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, slots, 128), lambda i: (i, 0, 0)),
        ],
    )
    outr, outi = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r, slots, 128), jnp.float32),
            jax.ShapeDtypeStruct((r, slots, 128), jnp.float32),
        ],
        interpret=interpret,
    )(planes, w, smat, smat1)
    return (outr, outi), slots, m_per
