"""Fused Pallas TPU kernel for the post-DFT receive tail.

The production XLA pipeline (phy/rx.py decode_aligned) runs the data-block
tail — equalize -> pilot residual phase -> hard-decision demod -> LSB-first
bit pack — as several fused-but-separate HBM passes over the [B, NB, bins]
spectrum (the pilot-phase mean is a reduction, which splits the elementwise
chain into pre/post fusions, and the bit pack is its own pass).  This kernel
runs the whole tail VMEM-resident per tile of TM OFDM blocks: HBM traffic is
one read of the planar DFT output and one write of the packed payload words.

Unlike the deleted experimental rx_fused kernel (which also pulled the DFT
matmul and the CFO derotation into Mosaic, measured slower than the XLA path
and mismatched on hardware until the K-padding root cause was found — see
docs/BENCHMARKS.md "Fused-kernel history"), this kernel starts *after* the
XLA MXU DFT — the numerically sensitive transforms stay on the exact
production path, and everything in here is plain f32 VPU math plus exact
0/2^k packing matmuls.

Mosaic safety: there is NO lane-dim slicing anywhere in the kernel.  The
pilot bins are reduced with an iota mask, the phase rotation and demod run
full-width (pilot lanes compute garbage), and the packing matrices carry
zero rows for pilot/pad lanes so the garbage never reaches the output.

Reference behavior fused (same math as phy/rx.py decode_aligned):
  equalize      src/receiver.rs:67-70   (here: multiply by 1/h, precomputed)
  pilot phase   src/receiver.rs:106-145 (mean pilot angle, e^{-j phi} on data)
  demod         src/receiver.rs:147-190 (+ the QAM extension, phy/modulation.py)
  bit pack      src/utils.rs:30-36      (LSB-first)
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..phy.modulation import BITS_PER_SYMBOL, Modulation

TM = 128  # OFDM blocks per program (sublane-dim tile of the VPU work)


def _atan2_soft(y, x):
    """Software atan2 (Mosaic lacks the primitive).  Max err ~2e-4 rad —
    ~0.02% of a 64QAM decision cell, sub-decision at any workable SNR."""
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


@lru_cache(maxsize=None)
def _pack_matrix_lanes(nbins: int, n_data: int, bps: int) -> np.ndarray:
    """[n_planes, nbins, 2 * n_words] 0/2^k matrices turning per-axis bit
    planes into (lo16 | hi16) halves of little-endian int32 payload words.

    Plane layout: for BPSK/QPSK one plane per stream bit (t = bit index
    within the symbol); for square QAM, planes 0..half-1 are the I-axis Gray
    bits and planes half..bps-1 the Q-axis bits.  Plane t, lane s (s < n_data)
    holds stream bit p = s * bps + t; lanes >= n_data (pilots/padding) are
    zero rows.  Byte n = p // 8 (LSB-first, src/utils.rs:30-36), packed into
    int32 word w = n // 4; f32 -> uint8 casts are unsupported in Mosaic, so
    each word is accumulated as exact <= 65535 lo/hi halves and recombined
    with a 16-bit shift.
    """
    n_bits = n_data * bps
    assert n_bits % 8 == 0
    n_bytes = n_bits // 8
    n_words = -(-n_bytes // 4)
    m = np.zeros((bps, nbins, 2 * n_words), dtype=np.float32)
    for t in range(bps):
        for s in range(n_data):
            p = s * bps + t
            n_byte, q = divmod(p, 8)
            w, mm = divmod(n_byte, 4)
            if mm < 2:
                m[t, s, w] = float(1 << (q + 8 * mm))
            else:
                m[t, s, n_words + w] = float(1 << (q + 8 * (mm - 2)))
    return m


def _gray_planes(v, half, n_levels):
    """Hard decision on one axis: odd-integer levels -> Gray bit planes
    (identical decision math to phy/modulation.py demodulate_symbols)."""
    rank = jnp.clip(jnp.round((v + (n_levels - 1)) * 0.5),
                    0, n_levels - 1).astype(jnp.int32)
    gray = rank ^ (rank >> 1)
    return [((gray >> t) & 1).astype(jnp.float32) for t in range(half)]


def _demod_kernel(yr_ref, yi_ref, ihr_ref, ihi_ref, pack_ref, out_ref,
                  *, n_data: int, n_pilots: int, bps: int, n_words: int):
    # 1. equalize: e = y * (1/h)  (1/h precomputed in XLA from the training
    #    chunks; per-batch-row, broadcast over the TM block tile)
    yr = yr_ref[0]                       # [TM, nbins]
    yi = yi_ref[0]
    ihr = ihr_ref[0]                     # [1, nbins]
    ihi = ihi_ref[0]
    e_r = yr * ihr - yi * ihi
    e_i = yr * ihi + yi * ihr

    # 2. pilot residual phase, masked reduction over the pilot lanes only
    #    (phi = mean(angle(eq[pilots])), src/receiver.rs:114-144)
    if n_pilots:
        lane = jax.lax.broadcasted_iota(jnp.int32, e_r.shape, 1)
        pilot = (lane >= n_data) & (lane < n_data + n_pilots)
        at2 = _atan2_soft(e_i, e_r)      # full-width; data lanes unused
        phi = jnp.sum(jnp.where(pilot, at2, 0.0), axis=1, keepdims=True) \
            * jnp.float32(1.0 / n_pilots)
        c, s = jnp.cos(phi), jnp.sin(phi)
        d_r = e_r * c + e_i * s          # e * e^{-j phi}, full-width
        d_i = e_i * c - e_r * s
    else:
        d_r, d_i = e_r, e_i

    # 3. hard-decision demod -> per-axis bit planes (pilot lanes compute
    #    garbage; their pack-matrix rows are zero)
    if bps == 1:
        planes = [(d_r > 0.0).astype(jnp.float32)]
    elif bps == 2:
        # reference QPSK decision table incl. the (re<0, im==0) fallthrough
        l = d_r >= 0.0
        r = jnp.where(l, d_i >= 0.0, d_i > 0.0)
        planes = [l.astype(jnp.float32), r.astype(jnp.float32)]
    else:
        half = bps // 2
        n_levels = 1 << half
        planes = _gray_planes(d_r, half, n_levels) + \
            _gray_planes(d_i, half, n_levels)

    # 4. byte pack via per-plane 0/2^k matmuls (exact in f32) into
    #    little-endian int32 words
    lohi = _mm(planes[0], pack_ref[0])
    for t in range(1, bps):
        lohi = lohi + _mm(planes[t], pack_ref[t])
    lo = lohi[:, :n_words].astype(jnp.int32)
    hi = lohi[:, n_words:].astype(jnp.int32)
    out_ref[0] = lo + (hi << 16)


@functools.partial(jax.jit, static_argnames=("n_data", "n_pilots",
                                             "modulation", "interpret"))
def eq_demod_pack(yr: jnp.ndarray, yi: jnp.ndarray,
                  invh: jnp.ndarray, *, n_data: int, n_pilots: int,
                  modulation: Modulation,
                  interpret: bool = False) -> jnp.ndarray:
    """Equalize + pilot phase + demod + pack, one VMEM pass per block tile.

    yr/yi: f32[..., NB, nbins] planar DFT output at the selected bins
    (data_indices ++ pilot_indices order, cf. ops/fft.py dft_matmul_select).
    invh: complex[..., nbins] reciprocal channel estimate (1/h at the same
    bins).  Returns uint8[..., NB * n_data * bps / 8] payload bytes, bitwise
    identical to demodulate_symbols + bits_to_bytes on y * invh.
    """
    bps = BITS_PER_SYMBOL[modulation]
    n_bits = n_data * bps
    assert n_bits % 8 == 0, "fused demod needs whole bytes per block"
    n_bytes = n_bits // 8
    n_words = -(-n_bytes // 4)
    nbins = yr.shape[-1]
    assert nbins >= n_data + n_pilots

    lead = yr.shape[:-2]
    nb = yr.shape[-2]
    b = int(np.prod(lead, dtype=np.int64)) if lead else 1
    # kernel math is f32 (the TPU production dtype); x64 CPU-test inputs are
    # demoted here — decision margins dwarf the cast at any workable SNR
    yr = yr.reshape(b, nb, nbins).astype(jnp.float32)
    yi = yi.reshape(b, nb, nbins).astype(jnp.float32)
    ihr = jnp.real(invh).reshape(b, 1, nbins).astype(jnp.float32)
    ihi = jnp.imag(invh).reshape(b, 1, nbins).astype(jnp.float32)

    ncp = -(-nb // TM) * TM
    pack = jnp.asarray(_pack_matrix_lanes(nbins, n_data, bps))
    kern = functools.partial(_demod_kernel, n_data=n_data, n_pilots=n_pilots,
                             bps=bps, n_words=n_words)
    words = pl.pallas_call(
        kern,
        grid=(b, ncp // TM),
        in_specs=[
            pl.BlockSpec((1, TM, nbins), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),            # yr
            pl.BlockSpec((1, TM, nbins), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),            # yi
            pl.BlockSpec((1, 1, nbins), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # 1/h re
            pl.BlockSpec((1, 1, nbins), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # 1/h im
            pl.BlockSpec((bps, nbins, 2 * n_words), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # pack matrices
        ],
        out_specs=pl.BlockSpec((1, TM, n_words), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ncp, n_words), jnp.int32),
        interpret=interpret,
    )(yr, yi, ihr, ihi, pack)

    out = jax.lax.bitcast_convert_type(words[:, :nb], jnp.uint8)
    out = out.reshape(b, nb, 4 * n_words)
    if n_bytes != 4 * n_words:
        out = out[:, :, :n_bytes]
    return out.reshape(*lead, nb * n_bytes)
