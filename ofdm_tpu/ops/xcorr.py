"""Cross-correlation and frame synchronization.

Two implementations with identical argmax/offset semantics:

- ``xcorr_fft``: the MATLAB-convention reference oracle (pad both inputs to
  2*len(a)-1, FFT(a)*conj(FFT(b)), IFFT, fftshift, argmax) replicating
  src/signals/mod.rs:186-217 exactly.  Used in tests and for API parity.
- ``sliding_correlation`` / ``locking_sync_offset``: the TPU-first path.  The
  locking template is only 80 taps, so the correlation is a short-kernel
  convolution over the sample stream — O(80*N) fused VPU/MXU work instead of
  three full-length FFTs.  The lag->offset arithmetic reproduces the
  reference's ``idxmax - ((len-1)/2 + 1)`` formula (src/receiver.rs:20-25):
  for a peak at lag k the returned offset is k - 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fft import fft, ifft
from .shift import fft_shift


def xcorr_fft(a: jnp.ndarray, b: jnp.ndarray):
    """MATLAB-style linear cross-correlation, parity with src/signals/mod.rs:186-217.

    Returns (idxmax, cross) where cross has length 2*len(a)-1 and is
    fftshifted so index p corresponds to lag p - (len(a)-1).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    pad_to = 2 * a.shape[-1] - 1
    ap = jnp.pad(a, (0, pad_to - a.shape[-1]))
    bp = jnp.pad(b, (0, pad_to - b.shape[-1]))
    cross = fft_shift(ifft(fft(ap, use_matmul=False)
                           * jnp.conj(fft(bp, use_matmul=False)),
                           use_matmul=False))
    idxmax = jnp.argmax(jnp.abs(cross) ** 2)
    return idxmax, cross


def sliding_correlation(samples: jnp.ndarray, template: jnp.ndarray) -> jnp.ndarray:
    """c[i] = sum_n samples[i - K + 1 + n] * conj(template[n]) computed for
    lags i-K+1 in [-(K-1), N-1] where K = len(template), N = samples length.

    Output index i corresponds to lag i - (K-1).  Batched over leading axes.
    Implemented as a real depthwise convolution pair (template conjugated),
    which XLA lowers to fused multiply-accumulate on TPU.
    """
    squeeze = samples.ndim == 1
    if squeeze:
        samples = samples[None, :]
    k = template.shape[-1]
    tr = jnp.real(template).astype(jnp.float32 if samples.dtype == jnp.complex64 else jnp.float64)
    ti = jnp.imag(template).astype(tr.dtype)
    sr = jnp.real(samples).astype(tr.dtype)
    si = jnp.imag(samples).astype(tr.dtype)

    def corr1d(x, h):
        # XLA's conv_general_dilated computes correlation (kernel NOT
        # reversed), which is exactly the sliding template match we want:
        # out[i] = sum_j x[i - (k-1) + j] * h[j] = c[lag = i - (k-1)].
        lhs = x[:, None, :]                  # [B, C=1, T]
        rhs = h[None, None, :]
        out = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1,), padding=[(k - 1, k - 1)],
            dimension_numbers=("NCH", "OIH", "NCH"))
        return out[:, 0, :]

    # (sr + j si) * conj(tr + j ti) summed: re = sr*tr + si*ti ; im = si*tr - sr*ti
    re = corr1d(sr, tr) + corr1d(si, ti)
    im = corr1d(si, tr) - corr1d(sr, ti)
    out = jax.lax.complex(re, im)
    return out[0] if squeeze else out


def locking_sync_offset(samples: jnp.ndarray, template: jnp.ndarray) -> jnp.ndarray:
    """Frame-sync offset with reference semantics (src/receiver.rs:20-25).

    Equivalent to ``idxmax - ((len(cross)-1)/2 + 1)`` over the full xcorr: the
    reference's trailing zero-padded lags can never hold the strict maximum, so
    restricting the argmax to lags >= -(K-1) is exact.  Batched over leading axes.
    """
    c = sliding_correlation(samples, template)
    k = template.shape[-1]
    power = jnp.real(c) ** 2 + jnp.imag(c) ** 2
    lag = jnp.argmax(power, axis=-1) - (k - 1)
    return lag - 1
