"""Signal statistics with reference semantics (SignalRef trait parity,
src/signals/mod.rs:239-281)."""

from __future__ import annotations

import jax.numpy as jnp


def mean(signal: jnp.ndarray) -> jnp.ndarray:
    """Complex mean over the last axis (src/signals/mod.rs:251-259)."""
    return jnp.mean(signal, axis=-1)


def variance(signal: jnp.ndarray) -> jnp.ndarray:
    """Complex pseudo-variance: sum((mean - x)^2)/N with the *unconjugated*
    square — the reference's deliberate deviation from MATLAB's E|x-mean|^2
    (src/signals/mod.rs:239-249).  Drives the channel's noise amplitude."""
    m = mean(signal)[..., None]
    diff = m - signal
    return jnp.mean(diff * diff, axis=-1)


def idmax(signal: jnp.ndarray) -> jnp.ndarray:
    """Index of the max-|.|^2 element, first occurrence on ties — the
    *corrected* semantics of the reference's idmax (src/signals/mod.rs:271-281
    never updates its running max, a latent bug the xcorr path does not
    share; we implement the intended argmax and lock it with a test)."""
    power = jnp.real(signal) ** 2 + jnp.imag(signal) ** 2
    return jnp.argmax(power, axis=-1)
