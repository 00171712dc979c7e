"""Simulated multipath channel (the framework's fake backend / fault injector).

Behavior-parity with src/channel.rs:32-74, batched and jittable:

- convolve with the fixed 64-tap impulse response CHANNEL (linear conv,
  output length T + 63),
- optional carrier-frequency offset: f_delta = pi * U(0,1) / 80 applied as
  y[n] *= exp(+j f_delta (n+1)),
- additive noise: noise_var = complex pseudo-variance(signal) / snr_linear,
  noise = sqrt(0.5 * noise_var) * (U(-1,1) + j U(-1,1)).

Two reference quirks are preserved deliberately (they define the behavior our
receiver is tested against): the noise amplitude derives from the *complex
square* variance sum((mean - y)^2)/N — not MATLAB's E|y - mean|^2 — and the
noise distribution is uniform, not Gaussian.  Randomness uses jax.random keys
instead of the reference's thread_rng so runs are reproducible.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import constants
from ..ops.convolve import convolve_direct


def _complex_pseudo_variance(y: jnp.ndarray) -> jnp.ndarray:
    """sum((mean - y)^2) / N with the complex (unconjugated) square,
    replicating SignalRef::variance (src/signals/mod.rs:239-249)."""
    mean = jnp.mean(y, axis=-1, keepdims=True)
    diff = mean - y
    return jnp.mean(diff * diff, axis=-1)


@partial(jax.jit, static_argnames=("snr", "timing_error"))
def channel(transmission: jnp.ndarray, snr: float = 30.0,
            timing_error: bool = False,
            key: jax.Array | None = None) -> jnp.ndarray:
    """Apply the simulated channel.  Batched over leading axes.

    ``key``: jax PRNG key (required unless snr is None and timing_error False;
    defaults to key(0) for convenience).
    """
    if key is None:
        key = jax.random.key(0)
    squeeze = transmission.ndim == 1
    if squeeze:
        transmission = transmission[None, :]
    batch = transmission.shape[:-1]
    rd = jnp.float32 if transmission.dtype == jnp.complex64 else jnp.float64

    snr_lin = 10.0 ** (snr / 10.0)
    taps = jnp.asarray(constants.CHANNEL_TAPS, dtype=rd)
    out = convolve_direct(transmission, taps)

    k_cfo, k_noise = jax.random.split(key)
    if timing_error:
        u = jax.random.uniform(k_cfo, batch, dtype=rd)
        f_delta = jnp.pi * u / 80.0
        n = jnp.arange(1, out.shape[-1] + 1, dtype=rd)
        rot = jnp.exp(1j * f_delta[..., None].astype(out.dtype) * n.astype(out.dtype))
        out = out * rot

    noise_var = _complex_pseudo_variance(out) / snr_lin
    amp = jnp.sqrt(0.5 * noise_var)          # complex sqrt, principal branch
    uni = jax.random.uniform(k_noise, (*batch, out.shape[-1], 2),
                             dtype=rd, minval=-1.0, maxval=1.0)
    noise = amp[..., None] * jax.lax.complex(uni[..., 0], uni[..., 1])
    out = out + noise
    return out[0] if squeeze else out
