"""Bit packing utilities (LSB-first within each byte).

The reference bit order is LSB-first: ``u8::to_bools`` emits bit 0 first
(src/utils.rs:21-27) and ``bools_to_u8`` is its exact inverse
(src/utils.rs:30-36).  Both device (jnp) and host (np) variants are provided;
the device variants are shape-polymorphic and vectorize over leading axes so
the whole demodulator stays one fused XLA computation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_BIT_WEIGHTS = np.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.uint8)


def bytes_to_bits(data: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., n] -> bool[..., n*8], LSB-first per byte."""
    data = data.astype(jnp.uint8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (data[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8).astype(jnp.bool_)


def bits_to_bytes(bits: jnp.ndarray) -> jnp.ndarray:
    """bool[..., n*8] -> uint8[..., n], LSB-first per byte."""
    n = bits.shape[-1] // 8
    grouped = bits[..., : n * 8].reshape(*bits.shape[:-1], n, 8).astype(jnp.uint8)
    return (grouped * jnp.asarray(_BIT_WEIGHTS)).sum(axis=-1).astype(jnp.uint8)


def np_bytes_to_bits(data: np.ndarray) -> np.ndarray:
    data = np.asarray(data, dtype=np.uint8)
    return np.unpackbits(data, bitorder="little")


def np_bits_to_bytes(bits: np.ndarray) -> np.ndarray:
    bits = np.asarray(bits, dtype=np.uint8)
    return np.packbits(bits, bitorder="little")
