"""Fused Pallas TPU kernel for the data-block receive path.

The XLA pipeline (phy/rx.py decode_aligned) runs the per-block chain as a
sequence of fused-but-separate HBM passes: derotate -> DFT matmul ->
equalize -> pilot phase -> demod -> bit-pack.  This kernel runs the whole
chain VMEM-resident per tile of 128 OFDM blocks: every intermediate (the
64-bin spectrum, equalized symbols, bit planes) lives only on-chip; HBM
traffic is one read of the raw blocks and one 9-word/block write of the
packed payload bytes.

Per program (grid = batch x block-tiles), for a [TM, 80] tile of blocks:

  1. CP strip (static lane slice 16:80) + within-chunk CFO derotation by
     rotj = exp(-i f j) (the per-chunk phasor rotc commutes through the
     linear DFT and is folded into the equalizer multiply — FFT(a*x)=a*FFT(x)).
  2. packed real DFT restricted to the 52 used bins (48 data in reference
     order + 4 pilots): one [TM,128] x [128,104] MXU matmul (HIGHEST).
  3. equalize: multiply by rotc * (1/h) (per-block scalar x per-batch-row
     52-bin vector, both precomputed in XLA from the training chunks).
  4. pilot residual phase: phi = mean(angle(eq[pilots])) via a software
     atan2 (Mosaic has no atan2 primitive; poly accurate to ~2e-4 rad,
     ~0.02% of a 64QAM decision cell), applied as e^{-i phi} to the data bins.
  5. hard-decision square-QAM demod: per-axis rank = clip(round((v+L-1)/2)),
     Gray code rank ^ (rank>>1), bit planes extracted with int shifts.
  6. byte pack: bit planes concatenated to [TM, 48*bps] and multiplied by a
     constant 0/2^k matrix -> per-block payload bytes packed as little-endian
     int32 words (f32->uint8 casts are unsupported in Mosaic; f32->int32 of
     exact <=65535 values + a 16-bit shift are).

Reference behavior being fused: src/receiver.rs:44-50 (CFO derotation with
global sample index), :67-70 (equalization), :106-145 (retroactive pilot
phase), :147-190 (demod), src/utils.rs:30-36 (LSB-first packing).

Status: EXPERIMENTAL.  Exact in interpret mode on CPU (tests/test_kernels.py).
On the attached TPU chip the Mosaic-compiled kernel measured ~3.8 ms/step vs
~2.9-3.4 ms for the XLA decode_frame path at the benchmark shapes (batch 256 x
8192B 64QAM) AND showed ~0.24% byte mismatches vs decode_frame there
(/tmp/exp_fused*.log) — the XLA path in phy/rx.py remains production.  The
kernel is kept as the starting point for a future fused-VMEM rx path; the HBM
analysis in this docstring still holds, the Mosaic numeric gap is unresolved.
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants
from ..config import DEFAULT_CONFIG, FrameConfig
from ..ops.fft import _dft_matrix, fft
from ..phy.modulation import BITS_PER_SYMBOL, Modulation

TM = 128  # OFDM blocks per program (MXU M dimension)


# ---------------------------------------------------------------------------
# constant matrices


@lru_cache(maxsize=None)
def _wsel_packed(cfg: FrameConfig, guard_bands: bool):
    """Packed real DFT restricted to the used bins, as the two real factors

        [yr | yi] = xr @ Wa + xi @ Wb,   Wa = [Wr | Wi],  Wb = [-Wi | Wr]

    for y = FFT(x) at bins (data_indices ++ pilot_indices) when guard_bands
    else all bins.  Two accumulated matmuls avoid in-kernel lane concats
    (unaligned concatenations are the riskiest Mosaic lowering).
    """
    n = cfg.n_fft
    w = _dft_matrix(n, inverse=False)                    # [n, n] complex
    if guard_bands:
        sel = list(cfg.data_indices) + list(cfg.pilot_indices)
    else:
        sel = list(range(n))
    ws = w[:, sel]
    wr, wi = ws.real, ws.imag
    wa = np.concatenate([wr, wi], axis=1).astype(np.float32)
    wb = np.concatenate([-wi, wr], axis=1).astype(np.float32)
    return wa, wb


@lru_cache(maxsize=None)
def _pack_matrix(n_carriers: int, bps: int) -> np.ndarray:
    """[bps, n_carriers, 2 * n_words] 0/2^k matrices (one per bit plane)
    turning bit planes into (lo16 | hi16) halves of little-endian int32
    payload words: words = sum_t plane_t @ m[t].

    Plane t, symbol s holds stream bit position p = s * bps + t (LSB-first
    packing, src/utils.rs:30-36).  Byte n = p // 8, bit q = p % 8;
    word w = n // 4.
    """
    n_bits = n_carriers * bps
    assert n_bits % 8 == 0
    n_bytes = n_bits // 8
    n_words = -(-n_bytes // 4)
    m = np.zeros((bps, n_carriers, 2 * n_words), dtype=np.float32)
    for t in range(bps):
        for s in range(n_carriers):
            p = s * bps + t
            n_byte, q = divmod(p, 8)
            w, mm = divmod(n_byte, 4)
            if mm < 2:
                m[t, s, w] = float(1 << (q + 8 * mm))
            else:
                m[t, s, n_words + w] = float(1 << (q + 8 * (mm - 2)))
    return m


# ---------------------------------------------------------------------------
# in-kernel helpers


def _atan2_soft(y, x):
    """Software atan2 (Mosaic lacks the primitive).  Max err ~2e-4 rad."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, jnp.float32(1e-37))
    s = t * t
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


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _gray_bits(v, half, n_levels):
    """Hard decision on one axis: odd-integer levels -> Gray bit planes."""
    rank = jnp.clip(jnp.round((v + (n_levels - 1)) * 0.5),
                    0, n_levels - 1).astype(jnp.int32)
    gray = rank ^ (rank >> 1)
    return [((gray >> t) & 1).astype(jnp.float32) for t in range(half)]


# ---------------------------------------------------------------------------
# the kernel


def _rx_kernel(xr_ref, xi_ref, rjr_ref, rji_ref, rcr_ref, rci_ref,
               ihr_ref, ihi_ref, wa_ref, wb_ref, pack_ref, out_ref,
               *, n_fft: int, n_data: int, n_pilots: int,
               bps: int, n_words: int):
    half = bps // 2
    n_levels = 1 << half

    # 1. within-chunk derotation (CP already stripped by the XLA feeder)
    xs_r = xr_ref[0]
    xs_i = xi_ref[0]
    rj_r = rjr_ref[0]
    rj_i = rji_ref[0]
    x_r = xs_r * rj_r - xs_i * rj_i
    x_i = xs_i * rj_r + xs_r * rj_i

    # 2. packed DFT at the selected bins: two accumulated MXU matmuls
    y = _mm(x_r, wa_ref[:]) + _mm(x_i, wb_ref[:])
    nb = n_data + n_pilots
    yr, yi = y[:, :nb], y[:, nb:]

    # 3. equalize by rotc * invh (the per-chunk CFO phasor folded in)
    rc_r = rcr_ref[0]                     # [TM, 1]
    rc_i = rci_ref[0]
    ih_r = ihr_ref[0, :, :nb]             # [1, nb]
    ih_i = ihi_ref[0, :, :nb]
    m_r = rc_r * ih_r - rc_i * ih_i       # [TM, nb]
    m_i = rc_r * ih_i + rc_i * ih_r
    e_r = yr * m_r - yi * m_i
    e_i = yr * m_i + yi * m_r

    # 4. pilot residual phase (guard-bands mode only)
    if n_pilots:
        phi = jnp.mean(_atan2_soft(e_i[:, n_data:], e_r[:, n_data:]),
                       axis=1, keepdims=True)
        c, s = jnp.cos(phi), jnp.sin(phi)
        d_r = e_r[:, :n_data] * c + e_i[:, :n_data] * s
        d_i = e_i[:, :n_data] * c - e_r[:, :n_data] * s
    else:
        d_r, d_i = e_r, e_i

    # 5. hard-decision Gray demod -> bit planes, t-major
    if bps == 1:
        planes = [(d_r > 0.0).astype(jnp.float32)]
    elif bps == 2:
        # reference QPSK decision table incl. the (re<0, im==0) fallthrough
        l = d_r >= 0.0
        r = jnp.where(l, d_i >= 0.0, d_i > 0.0)
        planes = [l.astype(jnp.float32), r.astype(jnp.float32)]
    else:
        planes = _gray_bits(d_r, half, n_levels) + \
            _gray_bits(d_i, half, n_levels)

    # 6. byte pack via per-plane 0/2^k matmuls into little-endian int32
    # words (summed matmuls instead of a lane concat + one matmul)
    lohi = _mm(planes[0], pack_ref[0])
    for t in range(1, bps):
        lohi = lohi + _mm(planes[t], pack_ref[t])
    lo = lohi[:, :n_words].astype(jnp.int32)
    hi = lohi[:, n_words:].astype(jnp.int32)
    out_ref[0] = lo + (hi << 16)


# ---------------------------------------------------------------------------
# host-side wrapper


@functools.partial(jax.jit, static_argnames=("n_blocks", "guard_bands",
                                             "modulation", "cfg", "interpret"))
def decode_frame_fused(samples: jnp.ndarray, *, n_blocks: int,
                       guard_bands: bool = True,
                       modulation: Modulation = Modulation.QAM64,
                       cfg: FrameConfig = DEFAULT_CONFIG,
                       interpret: bool = False) -> jnp.ndarray:
    """Drop-in fast path for phy.rx.decode_frame (same outputs) built on the
    fused Pallas kernel.  complex64[..., T] -> uint8[..., n_bytes].

    Sync, CFO estimation and channel estimation (the once-per-frame work on
    the 800-sample sync region) stay in XLA; the per-block hot loop runs in
    the kernel.  The block axis is padded to a multiple of 128 (TM).
    """
    from ..phy.rx import _cfo_estimate, sync_offset

    squeeze = samples.ndim == 1
    if squeeze:
        samples = samples[None, :]
    assert samples.ndim == 2, "fused path expects [batch, T]"
    b = samples.shape[0]
    sym, cp, n_fft = cfg.sym_len, cfg.cp_len, cfg.n_fft
    n_sync = cfg.n_sync_chunks
    ncp = -(-n_blocks // TM) * TM
    need = (n_sync + ncp) * sym
    # Pad so the offset-clip bound T' - need is no tighter than the
    # unpadded frame's T - (n_sync + n_blocks) * sym: the block-axis
    # padding must not eat the sync-offset slack.
    frame0 = (n_sync + n_blocks) * sym
    pad = (ncp - n_blocks) * sym + max(0, frame0 - samples.shape[-1])
    samples = jnp.pad(samples, ((0, 0), (0, pad)))

    offsets = jnp.clip(sync_offset(samples, cfg), 0, samples.shape[-1] - need)
    aligned = jax.vmap(lambda r, o: jax.lax.dynamic_slice_in_dim(
        r, o, need, axis=0))(samples, offsets)

    # once-per-frame estimates on the sync region (matches decode_aligned)
    sync_chunks = aligned[:, :n_sync * sym].reshape(b, n_sync, sym)
    f_delta = _cfo_estimate(sync_chunks, cfg)                  # [B]

    j_idx = jnp.arange(sym, dtype=jnp.float32)
    ang_j = f_delta[:, None] * j_idx                           # [B, sym]
    rotj = jnp.exp(jax.lax.complex(jnp.zeros_like(ang_j), -ang_j))

    t0 = cfg.n_locking + cfg.n_preamble
    g_t = jnp.arange(t0, t0 + cfg.n_training, dtype=jnp.float32) * sym
    ang_t = f_delta[:, None] * g_t                             # [B, n_training]
    rotc_t = jnp.exp(jax.lax.complex(jnp.zeros_like(ang_t), -ang_t))
    tr = sync_chunks[:, t0:t0 + cfg.n_training, cp:] * rotj[:, None, cp:]
    training_ref = jnp.asarray(
        constants.training_signals(n_fft, cfg.training_seed),
        dtype=samples.dtype)
    h_k = jnp.mean(fft(tr) * rotc_t[..., None] / training_ref, axis=-2)

    if guard_bands:
        sel = list(cfg.data_indices) + list(cfg.pilot_indices)
        n_data, n_pilots = len(cfg.data_indices), len(cfg.pilot_indices)
    else:
        sel = list(range(n_fft))
        n_data, n_pilots = n_fft, 0
    invh = 1.0 / h_k[:, sel]                                   # [B, nb]

    g_d = (n_sync + jnp.arange(ncp, dtype=jnp.float32)) * sym
    ang_d = f_delta[:, None] * g_d                             # [B, ncp]
    rotc = jnp.exp(jax.lax.complex(jnp.zeros_like(ang_d), -ang_d))

    # CP strip fuses into the real/imag split feeding the kernel
    data = aligned[:, n_sync * sym:].reshape(b, ncp, sym)[:, :, cp:]
    bps = BITS_PER_SYMBOL[modulation]
    n_bits = n_data * bps
    assert n_bits % 8 == 0, "fused path needs whole bytes per block"
    n_words = -(-(n_bits // 8) // 4)

    wa, wb = _wsel_packed(cfg, guard_bands)
    packm = jnp.asarray(_pack_matrix(n_data, bps))
    nbins = n_data + n_pilots

    kern = functools.partial(
        _rx_kernel, n_fft=n_fft, n_data=n_data, n_pilots=n_pilots,
        bps=bps, n_words=n_words)
    words = pl.pallas_call(
        kern,
        grid=(b, ncp // TM),
        in_specs=[
            pl.BlockSpec((1, TM, n_fft), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),           # xr
            pl.BlockSpec((1, TM, n_fft), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),           # xi
            pl.BlockSpec((1, 1, n_fft), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # rotj re
            pl.BlockSpec((1, 1, n_fft), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # rotj im
            pl.BlockSpec((1, TM, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),           # rotc re
            pl.BlockSpec((1, TM, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),           # rotc im
            pl.BlockSpec((1, 1, nbins), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # invh re
            pl.BlockSpec((1, 1, nbins), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # invh im
            pl.BlockSpec((n_fft, 2 * nbins), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),           # Wa
            pl.BlockSpec((n_fft, 2 * nbins), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),           # Wb
            pl.BlockSpec((bps, n_data, 2 * n_words), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),           # pack matrices
        ],
        out_specs=pl.BlockSpec((1, TM, n_words), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ncp, n_words), jnp.int32),
        interpret=interpret,
    )(jnp.real(data), jnp.imag(data),
      jnp.real(rotj)[:, None, cp:], jnp.imag(rotj)[:, None, cp:],
      jnp.real(rotc)[..., None], jnp.imag(rotc)[..., None],
      jnp.real(invh)[:, None, :], jnp.imag(invh)[:, None, :],
      jnp.asarray(wa), jnp.asarray(wb), packm)

    out = jax.lax.bitcast_convert_type(words, jnp.uint8)      # [B, ncp, nw, 4]
    out = out.reshape(b, ncp * n_words * 4)
    n_bytes = n_blocks * (n_bits // 8)
    # per-block valid bytes are the first n_bits//8 of each 4*n_words chunk
    if n_bits // 8 != 4 * n_words:
        out = out.reshape(b, ncp, 4 * n_words)[:, :, :n_bits // 8]
        out = out.reshape(b, ncp * (n_bits // 8))
    out = out[:, :n_bytes]
    return out[0] if squeeze else out
