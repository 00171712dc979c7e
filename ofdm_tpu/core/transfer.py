"""Host<->device transfer helpers for complex arrays.

Some TPU runtimes (notably the tunneled single-chip axon backend this
framework is benchmarked on) do not implement device->host copies of complex
dtypes, even though complex *compute* works.  These helpers keep complex data
on-device and cross the boundary as split real/imag float arrays, which every
backend supports.  On CPU they reduce to plain asarray calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _split(z):
    return jnp.real(z), jnp.imag(z)


def to_host(x) -> np.ndarray:
    """Device array (any dtype, incl. complex) -> numpy on host."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if not jnp.iscomplexobj(x):
        return np.asarray(x)
    re, im = _split(x)
    return np.asarray(re) + 1j * np.asarray(im)


def to_device(x, dtype=None) -> jax.Array:
    """numpy array -> device array; complex uploads as split real/imag."""
    arr = np.asarray(x)
    if not np.iscomplexobj(arr):
        out = jnp.asarray(arr)
        return out.astype(dtype) if dtype is not None else out
    cdtype = dtype or (jnp.complex128 if arr.dtype == np.complex128
                       and jax.config.jax_enable_x64 else jnp.complex64)
    rd = jnp.float64 if cdtype == jnp.complex128 else jnp.float32
    re = jnp.asarray(arr.real.astype(rd))
    im = jnp.asarray(arr.imag.astype(rd))
    return jax.jit(jax.lax.complex)(re, im)
