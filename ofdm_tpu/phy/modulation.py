"""Symbol mapping and hard-decision demapping.

BPSK/QPSK replicate the reference bit conventions exactly
(src/transmitter.rs:108-140, src/receiver.rs:147-190): bits are consumed
LSB-first per byte; QPSK maps the pair (l, r) to (sign, sign) with
(1,1) -> 1+1j, l driving the real axis.

QAM-16 and QAM-64 are new (the reference's Qam arms are empty stubs —
src/transmitter.rs:135-136, src/receiver.rs:185).  We use Gray-coded square
constellations on odd-integer levels (±1, ±3 / ±1..±7): the first half of each
symbol's bits drives the I axis, the second half the Q axis, each axis
Gray-coded LSB-first.  Integer levels keep hard-decision thresholds exact
(even integers) after equalization.

Everything is shape-polymorphic jnp and vectorizes over leading axes, so
map/demap fuse into the surrounding OFDM computation under jit.
"""

from __future__ import annotations

import enum
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


class Modulation(enum.Enum):
    BPSK = "bpsk"
    QPSK = "qpsk"
    QAM16 = "qam16"
    QAM64 = "qam64"
    QAM256 = "qam256"


BITS_PER_SYMBOL = {
    Modulation.BPSK: 1,
    Modulation.QPSK: 2,
    Modulation.QAM16: 4,
    Modulation.QAM64: 6,
    Modulation.QAM256: 8,
}


@lru_cache(maxsize=None)
def _gray_levels(n_bits: int) -> np.ndarray:
    """Map a Gray-coded n_bits integer (bits LSB-first b0 + 2*b1 + ...) to an
    odd-integer amplitude level.  Index = gray code, value = level."""
    n = 1 << n_bits
    levels = np.zeros(n, dtype=np.float64)
    for rank in range(n):               # rank: position along the axis
        gray = rank ^ (rank >> 1)
        levels[gray] = 2 * rank - (n - 1)
    return levels


@lru_cache(maxsize=None)
def _gray_from_rank(n_bits: int) -> np.ndarray:
    """Index = level rank (0..2^n-1 left to right), value = Gray code."""
    n = 1 << n_bits
    return np.array([r ^ (r >> 1) for r in range(n)], dtype=np.int32)


def _bits_to_int(bits: jnp.ndarray) -> jnp.ndarray:
    """bool[..., k] -> int, LSB-first."""
    k = bits.shape[-1]
    weights = jnp.asarray([1 << i for i in range(k)], dtype=jnp.int32)
    return (bits.astype(jnp.int32) * weights).sum(axis=-1)


def _int_to_bits(vals: jnp.ndarray, k: int) -> jnp.ndarray:
    shifts = jnp.arange(k, dtype=jnp.int32)
    return ((vals[..., None] >> shifts) & 1).astype(jnp.bool_)


def modulate_bits(bits: jnp.ndarray, scheme: Modulation,
                  dtype=jnp.complex64) -> jnp.ndarray:
    """bool[..., n_bits] -> complex[..., n_syms].  If n_bits is not divisible
    by bits/symbol (QAM64's 6 against byte streams), the tail is zero-padded
    into a final partial symbol — bits are never dropped."""
    bps = BITS_PER_SYMBOL[scheme]
    n_sym = -(-bits.shape[-1] // bps)
    pad = n_sym * bps - bits.shape[-1]
    if pad:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    bits = bits.reshape(*bits.shape[:-1], n_sym, bps)
    rd = jnp.float32 if dtype == jnp.complex64 else jnp.float64

    if scheme is Modulation.BPSK:
        re = jnp.where(bits[..., 0], 1.0, -1.0).astype(rd)
        return re.astype(dtype)
    if scheme is Modulation.QPSK:
        re = jnp.where(bits[..., 0], 1.0, -1.0).astype(rd)
        im = jnp.where(bits[..., 1], 1.0, -1.0).astype(rd)
        return re.astype(dtype) + 1j * im.astype(dtype)
    # Square QAM: first half of bits -> I Gray code, second half -> Q.
    half = bps // 2
    levels = jnp.asarray(_gray_levels(half), dtype=rd)
    i_code = _bits_to_int(bits[..., :half])
    q_code = _bits_to_int(bits[..., half:])
    re = levels[i_code]
    im = levels[q_code]
    return re.astype(dtype) + 1j * im.astype(dtype)


def demodulate_symbols(syms: jnp.ndarray, scheme: Modulation) -> jnp.ndarray:
    """complex[..., n_syms] -> bool[..., n_syms * bits/sym] (hard decision)."""
    re = jnp.real(syms)
    im = jnp.imag(syms)

    if scheme is Modulation.BPSK:
        return (re > 0.0)[..., None].reshape(*syms.shape[:-1], -1)
    if scheme is Modulation.QPSK:
        # Exact reference decision table incl. the (re<0, im==0) fallthrough
        # to (0,0) — src/receiver.rs:165-184.
        l = re >= 0.0
        r = jnp.where(l, im >= 0.0, im > 0.0)
        bits = jnp.stack([l, r], axis=-1)
        return bits.reshape(*syms.shape[:-1], -1)

    bps = BITS_PER_SYMBOL[scheme]
    half = bps // 2
    n_levels = 1 << half
    gray = jnp.asarray(_gray_from_rank(half))

    def axis_bits(v):
        # nearest odd-integer level rank: clamp(round((v + n - 1) / 2))
        rank = jnp.clip(jnp.round((v + (n_levels - 1)) / 2.0),
                        0, n_levels - 1).astype(jnp.int32)
        return _int_to_bits(gray[rank], half)

    bits = jnp.concatenate([axis_bits(re), axis_bits(im)], axis=-1)
    return bits.reshape(*syms.shape[:-1], -1)
