"""BER analysis — the project's headline metric.

Replicates ``Analysis`` (src/utils.rs:38-69): bit errors by XOR-popcount,
block (byte) errors, and bit error rate.  Also provides a device-side batched
variant that can be ``psum``-reduced across a mesh for aggregate BER.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Analysis:
    num_errs: int
    num_block_errs: int
    err_rate: float

    @classmethod
    def new(cls, left, right) -> "Analysis":
        a = np.frombuffer(bytes(left), dtype=np.uint8) if isinstance(
            left, (bytes, bytearray)) else np.asarray(left, dtype=np.uint8)
        b = np.frombuffer(bytes(right), dtype=np.uint8) if isinstance(
            right, (bytes, bytearray)) else np.asarray(right, dtype=np.uint8)
        assert a.shape == b.shape, "Analysis requires equal-length inputs"
        diff = np.bitwise_xor(a, b)
        num_errs = int(np.unpackbits(diff).sum())
        num_block_errs = int((diff != 0).sum())
        err_rate = num_errs / (a.size * 8.0) if a.size else 0.0
        return cls(num_errs, num_block_errs, err_rate)


def debug_data(left, right, limit: int | None = None) -> str:
    """Colored bit-diff printer (rebuilds utils.rs:207-219): green rows where
    sent == received, red where they differ.  Returns the rendered string."""
    a = np.asarray(left, dtype=np.uint8)
    b = np.asarray(right, dtype=np.uint8)
    n = min(a.size, b.size) if limit is None else min(a.size, b.size, limit)
    rows = []
    for idx in range(n):
        color = "\x1b[32m" if a[idx] == b[idx] else "\x1b[31m"
        rows.append(f"{color}> {idx} | {a[idx]:#010b}\n    | {b[idx]:#010b}\x1b[0m")
    return "\n".join(rows)


def trim_to(received: np.ndarray, block_size: int) -> np.ndarray:
    """Take only as many bytes as were sent (utils.rs:221-225)."""
    return np.asarray(received)[:block_size]


def bit_errors(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Device-side bit-error count over the last axis (uint8 tensors).

    Suitable for ``jax.lax.psum`` aggregation across mesh axes.
    """
    diff = jnp.bitwise_xor(left.astype(jnp.uint8), right.astype(jnp.uint8))
    # popcount via 8 shifts (no popcount primitive needed)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (diff[..., None] >> shifts) & jnp.uint8(1)
    return bits.sum(axis=(-1, -2)).astype(jnp.int32)
