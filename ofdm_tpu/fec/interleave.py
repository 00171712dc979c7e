"""Block interleaving — burst-error protection between FEC and the modem.

OFDM subcarrier fades and impulse noise corrupt *runs* of adjacent symbols;
Reed-Solomon corrects at most 16 bytes per 255-byte block.  A rows x cols
block interleaver spreads each codeword's bytes across the whole frame so a
burst lands a few bytes in many codewords instead of many bytes in one.
(The reference transmits codewords contiguously — src/utils.rs:97-137 — and
is correspondingly fragile to bursts; this is a capability extension.)
"""

from __future__ import annotations

import numpy as np


def interleave(data: np.ndarray, depth: int) -> np.ndarray:
    """Write row-major into a [depth, ceil(n/depth)] grid (zero-padded),
    read column-major.  depth = number of codewords interleaved."""
    arr = np.asarray(data, dtype=np.uint8)
    n = arr.size
    cols = -(-n // depth)
    grid = np.zeros(depth * cols, dtype=np.uint8)
    grid[:n] = arr
    return grid.reshape(depth, cols).T.reshape(-1)


def deinterleave(data: np.ndarray, depth: int, n: int | None = None) -> np.ndarray:
    """Inverse of :func:`interleave`; ``n`` trims the zero padding."""
    arr = np.asarray(data, dtype=np.uint8)
    cols = arr.size // depth
    out = arr.reshape(cols, depth).T.reshape(-1)
    return out[: n if n is not None else out.size]


def interleave_device(data, depth: int):
    """On-device :func:`interleave` (batched over leading axes).

    The host numpy transpose tops out at ~0.4 GB/s on a small host —
    below the demodulator's ~1.8 GB/s payload stream — so at full rate the
    (de)interleave belongs on the device, fused next to the modem chain.
    """
    import jax.numpy as jnp
    arr = jnp.asarray(data)
    n = arr.shape[-1]
    cols = -(-n // depth)
    pad = depth * cols - n
    if pad:
        arr = jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(0, pad)])
    grid = arr.reshape(*arr.shape[:-1], depth, cols)
    return jnp.swapaxes(grid, -1, -2).reshape(*arr.shape[:-1], depth * cols)


def deinterleave_device(data, depth: int, n: int | None = None):
    """On-device :func:`deinterleave` (batched over leading axes)."""
    import jax.numpy as jnp
    arr = jnp.asarray(data)
    cols = arr.shape[-1] // depth
    out = jnp.swapaxes(arr.reshape(*arr.shape[:-1], cols, depth),
                       -1, -2).reshape(*arr.shape[:-1], cols * depth)
    return out[..., : n if n is not None else out.shape[-1]]
