"""Hamming(7,4) forward error correction — the north-star TPU codec.

The reference README claims "Error Correction with Hamming Codes" but actually
ships Reed-Solomon (README.md:11 vs src/utils.rs:97-137); BASELINE.json's
north star asks for a real Hamming(7,4).  Over GF(2) both encode and decode
are bit matmuls, which makes this codec natively TPU-friendly: whole byte
streams are encoded/decoded as one fused XLA computation (and can ride the
MXU for large batches).

Layout (this framework's spec):
- each byte splits into two nibbles, low nibble first (LSB-first, consistent
  with the modem bit order of src/utils.rs:21-27),
- each nibble d0..d3 maps to the systematic codeword [d0 d1 d2 d3 p0 p1 p2],
- codeword bits are concatenated LSB-first and packed into bytes, zero-padded
  to a byte boundary.

Corrects any single bit error per 7-bit codeword.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.bitops import bits_to_bytes, bytes_to_bits

# Parity generator P (4x3): p = d @ P mod 2.  G = [I4 | P], H = [P^T | I3].
_P = np.array([[1, 1, 0],
               [1, 0, 1],
               [0, 1, 1],
               [1, 1, 1]], dtype=np.uint8)
_G = np.concatenate([np.eye(4, dtype=np.uint8), _P], axis=1)          # 4x7
_H = np.concatenate([_P.T, np.eye(3, dtype=np.uint8)], axis=1)        # 3x7

# syndrome value (s0 + 2 s1 + 4 s2) -> erroneous bit position (or 7 = none)
_SYNDROME_TO_POS = np.full(8, 7, dtype=np.int32)
for _col in range(7):
    _s = _H[:, _col]
    _SYNDROME_TO_POS[int(_s[0] + 2 * _s[1] + 4 * _s[2])] = _col


def encoded_len(n_bytes: int) -> int:
    """Encoded byte count for ``n_bytes`` of data: ceil(n*14/8)."""
    return -(-n_bytes * 14 // 8)


def encode(data: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., n] -> uint8[..., ceil(n*14/8)] Hamming(7,4)-coded stream."""
    bits = bytes_to_bits(data).astype(jnp.uint8)          # [..., n*8]
    nibbles = bits.reshape(*bits.shape[:-1], -1, 4)       # [..., 2n, 4]
    code = (nibbles @ jnp.asarray(_G)) % 2                # [..., 2n, 7]
    flat = code.reshape(*code.shape[:-2], -1)
    pad = (-flat.shape[-1]) % 8
    flat = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, pad)])
    return bits_to_bytes(flat.astype(jnp.bool_))


def decode(coded: jnp.ndarray, n_bytes: int) -> jnp.ndarray:
    """uint8[..., m] coded stream -> uint8[..., n_bytes] corrected data.

    ``n_bytes``: original data length (the modem header supplies it).
    """
    bits = bytes_to_bits(coded).astype(jnp.uint8)
    n_code = 2 * n_bytes                                   # codewords
    code = bits[..., : n_code * 7].reshape(*bits.shape[:-1], n_code, 7)
    syndrome = (code @ jnp.asarray(_H.T)) % 2              # [..., 2n, 3]
    sval = syndrome[..., 0] + 2 * syndrome[..., 1] + 4 * syndrome[..., 2]
    err_pos = jnp.asarray(_SYNDROME_TO_POS)[sval]          # [..., 2n]
    flip = (jnp.arange(7) == err_pos[..., None]).astype(jnp.uint8)
    corrected = (code + flip) % 2
    data_bits = corrected[..., :4].reshape(*corrected.shape[:-2], -1)
    return bits_to_bytes(data_bits.astype(jnp.bool_))
