"""fftshift/ifftshift matching the reference's split-at-mid semantics
(src/signals/mod.rs:61-95), which coincide with numpy's for all lengths."""

from __future__ import annotations

import jax.numpy as jnp


def fft_shift(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    n = x.shape[axis]
    mid = (n + 1) // 2
    a, b = jnp.split(x, [mid], axis=axis)
    return jnp.concatenate([b, a], axis=axis)


def ifft_shift(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    n = x.shape[axis]
    mid = n // 2
    a, b = jnp.split(x, [mid], axis=axis)
    return jnp.concatenate([b, a], axis=axis)
