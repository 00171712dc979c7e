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


def _take_window(in_ref, off, n_out_tiles):
    """[2, n_out_tiles, 128] window of in_ref starting at sample ``off``:
    tile-dim dynamic slice at off // 128, then an aligned lane rotate by
    off % 128 with a cross-tile carry select."""
    q = off // 128
    s = off - q * 128
    w = in_ref[0, :, pl.ds(q, n_out_tiles + 1), :]       # [2, T+1, 128]
    rolled = pltpu.roll(w, shift=-s, axis=2)
    down = jnp.concatenate([rolled[:, 1:, :], rolled[:, :1, :]], axis=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
    sel = jnp.where(lanes < 128 - s, rolled, down)
    return sel[:, :n_out_tiles, :]


def _kernel(offs_ref, in_ref, out_ref, *, n_out_tiles):
    off = offs_ref[pl.program_id(0)]
    out_ref[0] = _take_window(in_ref, off, n_out_tiles)


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


def _sync_align_kernel(in_ref, w_ref, out_ref, *, t, max_off, n_out_tiles,
                       n_lag_tiles, lag_bound, real_template):
    """Fused frame sync + alignment, one VMEM-resident pass per row.

    The banded-Toeplitz correlation matmul is the same math as
    ops/xcorr.py sliding_correlation_matmul (c[lag] = sum_j s[lag+j]
    conj(tpl[j]), lag = 128*tile + lane); the offset is the reference's
    argmax(power) - 1 (src/receiver.rs:20-25) clipped to [0, t - need], and
    the aligned window is written directly — the stream is never re-read
    from HBM for alignment.
    """
    sr = in_ref[0, 0]                                    # [tiles, 128]
    si = in_ref[0, 1]
    n_tiles = sr.shape[0]
    # +1-tile shifted views via static sublane roll (slicing at sublane
    # offset 1 yields a layout Mosaic cannot concatenate or matmul)
    srn = pltpu.roll(sr, shift=n_tiles - 1, axis=0)      # out[i] = sr[i+1]
    sin = pltpu.roll(si, shift=n_tiles - 1, axis=0)
    n = n_lag_tiles
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    if real_template:
        # real locking template (ti = 0): c_re/c_im each correlate against
        # the same [256, 128] Tr — HALF the MACs of the generic complex
        # form, whose -ti/ti blocks would multiply zeros (roofline round 3)
        cre = dot(sr[:n], w_ref[0:128, :]) + dot(srn[:n], w_ref[128:256, :])
        cim = dot(si[:n], w_ref[0:128, :]) + dot(sin[:n], w_ref[128:256, :])
    else:
        # decomposed [.., 512] x [512, 256] product: four partial matmuls
        # over the Toeplitz row-blocks (Mosaic cannot concatenate the
        # rolled views)
        c = (dot(sr[:n], w_ref[0:128, :]) + dot(srn[:n], w_ref[128:256, :])
             + dot(si[:n], w_ref[256:384, :]) + dot(sin[:n], w_ref[384:512, :]))
        cre, cim = c[:, :128], c[:, 128:]
    power = cre * cre + cim * cim                        # [n_lag_tiles, 128]
    tiles_i = jax.lax.broadcasted_iota(jnp.int32, power.shape, 0)
    lanes_i = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1)
    lag = tiles_i * 128 + lanes_i
    p = jnp.where(lag < lag_bound, power, -1.0)
    # first-occurrence argmax without dynamic indexing: min lag among maxima
    peak = jnp.max(p)
    idx = jnp.min(jnp.where(p == peak, lag, jnp.int32(2 * t)))
    off = jnp.clip(idx - 1, 0, max_off)
    out_ref[0] = _take_window(in_ref, off, n_out_tiles)


def sync_align(flat: jnp.ndarray, template, need: int,
               interpret: bool = False,
               search_window: int | None = None,
               planar: bool = False) -> jnp.ndarray:
    """Fused sync+align: complex[R, T] -> complex[R, need] starting at each
    row's frame-sync offset (reference argmax semantics, clipped to
    [0, T - need]).  Byte-equivalent to sync_offset + _planar_align; the
    correlation reduction order differs from the XLA matmul, so a near-tie
    between peak lags (possible only on frames already lost to CFO aliasing
    or noise) may resolve to a different, equally-valid peak.

    ``search_window`` bounds the acquisition scan to lags
    [0, search_window + sym_len) like decode_frame's XLA scan slice — the
    correlation matmul then only runs over ceil(bound/128) tiles (streaming
    reacquisition: 2 tiles instead of ~150 at the headline shape).

    Measured 1.13 vs 1.30 ms for the full decode chain at the headline
    shape (tools/exp_sync_align.py); identical bad-row sets and identical
    good-row bytes on all test batches.

    ``planar=True`` returns the kernel's native f32[R, 2, need] real/imag
    planes instead of complex64 — the values the complex view would hold,
    without materializing it.  The planar matrix-derot decode tail
    (phy/rx.py decode_planar_matrix) consumes this directly, so the aligned
    stream is never written as a complex64 intermediate (round-3 VERDICT:
    the complex round-trip was one full extra write + re-read of the
    39 MB aligned stream per headline step).

    ``flat`` may also be PLANAR f32[R, 2, T] (the serving input interface —
    capture deinterleaves to planes and h2d transfers travel as planes).
    When the planes are the jit argument itself and reach this kernel
    unchanged, XLA assigns the parameter the Pallas-required layout and the
    ENTIRE input-side prep of the complex path (X64Split custom-calls +
    plane stack + batch-minor -> row-major relayout, ~118 MB of HBM writes
    per headline step in the round-4 HLO audit) disappears.
    """
    import numpy as np

    from ..ops.xcorr import (_TEMPLATE_STORE, _template_is_real,
                             _toeplitz_template, _toeplitz_template_real)

    if flat.ndim == 3:
        r, _, t = flat.shape
    else:
        r, t = flat.shape
    tpl = np.asarray(template)
    k = tpl.shape[-1]
    assert k <= 128, "sync_align supports templates up to 128 taps"
    key = (tpl.tobytes(), k)
    _TEMPLATE_STORE[key] = tpl
    real_template = _template_is_real(tpl)
    if real_template:
        w = jnp.asarray(_toeplitz_template_real(key, k, "float32"))  # [256,128]
    else:
        w = jnp.asarray(_toeplitz_template(key, k, "float32"))       # [512,256]

    lag_bound = t if search_window is None else min(t, search_window + k)
    n_lag_tiles = -(-lag_bound // 128)
    n_out_tiles = -(-need // 128)
    if flat.ndim == 3 and t % 128 == 0 and t // 128 >= n_out_tiles + 1:
        # pre-padded planar input: no pad/stack at all — when the planes
        # are the jit argument, the parameter gets the Pallas layout and
        # zero input-side copies remain (see docstring).  Contract: at
        # least one all-zero tile beyond the true stream (the roll carry;
        # the lag scan is clipped off that final pad tile, where the
        # contract guarantees no signal).  Sync offsets are clipped to the
        # last position whose full window fits the provided tiles
        # (max_off below) — provide more spare tiles if frames may start
        # deep into the buffer.
        tiles = t // 128
        n_lag_tiles = min(n_lag_tiles, tiles - 1)
        lag_bound = min(lag_bound, n_lag_tiles * 128)
        f = flat.astype(jnp.float32)
    else:
        tiles = max(n_lag_tiles + 1,
                    (t - need) // 128 + n_out_tiles + 1)
        if flat.ndim == 3:
            f = flat.astype(jnp.float32)
        else:
            f = jnp.stack([jnp.real(flat), jnp.imag(flat)], axis=1)
        f = jnp.pad(f, ((0, 0), (0, 0), (0, tiles * 128 - t)))
    f = f.reshape(r, 2, tiles, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 2, tiles, 128), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(tuple(w.shape), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, n_out_tiles, 128),
                               lambda i: (i, 0, 0, 0)),
    )
    # the clip bound also keeps the window slice inside the provided tiles
    # (pre-padded planar inputs may carry fewer spare tiles than the padded
    # path would have allocated)
    max_off = min(t - need, (tiles - n_out_tiles - 1) * 128 + 127)
    out = pl.pallas_call(
        functools.partial(_sync_align_kernel, t=t, max_off=max_off,
                          n_out_tiles=n_out_tiles, n_lag_tiles=n_lag_tiles,
                          lag_bound=lag_bound, real_template=real_template),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, 2, n_out_tiles, 128), jnp.float32),
        interpret=interpret,
    )(f, w)
    a = out.reshape(r, 2, n_out_tiles * 128)[:, :, :need]
    if planar:
        return a
    return jax.lax.complex(a[:, 0], a[:, 1])


def pin_rowmajor(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Identity Pallas copy that guarantees a ROW-MAJOR result buffer.

    XLA auto-assigns batch-minor layouts to large planar arrays, and
    honoring of jit ``out_shardings`` layout pins through the remote
    compile helper was observed to be nondeterministic; Pallas outputs are
    row-major by construction, so this is the deterministic way to produce
    a buffer in ``planar_input_format`` (one extra copy at PREP time).
    """
    blk = (1,) + x.shape[1:]

    def k(i_ref, o_ref):
        o_ref[...] = i_ref[...]

    idx = lambda i: (i,) + (0,) * (x.ndim - 1)
    return pl.pallas_call(
        k, grid=(x.shape[0],),
        in_specs=[pl.BlockSpec(blk, idx)],
        out_specs=pl.BlockSpec(blk, idx),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)
