"""Host<->device transfer helpers for complex arrays.

Some TPU runtimes (notably the tunneled single-chip axon backend this
framework is benchmarked on) do not implement device->host copies of complex
dtypes, even though complex *compute* works.  These helpers keep complex data
on-device and cross the boundary as split real/imag float arrays, which every
backend supports.  On CPU they reduce to plain asarray calls.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("ofdm_tpu.transfer")

_RETRIES = 3


def _with_retries(fn, what: str):
    """Some tunneled TPU runtimes sporadically fail host<->device copies with
    UNIMPLEMENTED; the same copy succeeds on retry.  Bounded retries keep
    streaming apps alive through the flake."""
    for attempt in range(_RETRIES):
        try:
            return fn()
        except jax.errors.JaxRuntimeError as e:
            if "UNIMPLEMENTED" not in str(e) or attempt == _RETRIES - 1:
                raise
            log.warning("%s failed (%s); retry %d", what, e, attempt + 1)
            time.sleep(0.5 * (attempt + 1))
    raise RuntimeError("unreachable")


@jax.jit
def _split(z):
    return jnp.real(z), jnp.imag(z)


def to_host(x) -> np.ndarray:
    """Device array (any dtype, incl. complex) -> numpy on host."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if not jnp.iscomplexobj(x):
        return _with_retries(lambda: np.asarray(x), "d2h")
    re, im = _split(x)
    return _with_retries(lambda: np.asarray(re) + 1j * np.asarray(im), "d2h")


def to_device(x, dtype=None) -> jax.Array:
    """numpy array -> device array; complex uploads as split real/imag."""
    arr = np.asarray(x)
    if not np.iscomplexobj(arr):
        out = _with_retries(lambda: jax.block_until_ready(jnp.asarray(arr)),
                            "h2d")
        return out.astype(dtype) if dtype is not None else out
    cdtype = dtype or (jnp.complex128 if arr.dtype == np.complex128
                       and jax.config.jax_enable_x64 else jnp.complex64)
    rd = jnp.float64 if cdtype == jnp.complex128 else jnp.float32

    def upload():
        re = jnp.asarray(arr.real.astype(rd))
        im = jnp.asarray(arr.imag.astype(rd))
        return jax.block_until_ready(jax.jit(jax.lax.complex)(re, im))

    return _with_retries(upload, "h2d")


def to_device_planar(x, pad_to_tiles: bool = True) -> jax.Array:
    """Host samples -> PLANAR device stream f32[..., 2, T'] for
    ``decode_frame_planar``.

    Accepts complex arrays or an (re, im) plane pair (what
    ``io.capture.IQFile.read_planar`` yields — fc32 captures ARE planes
    after deinterleave).  The planes are uploaded as float32 and stacked
    on device; no complex array is ever built, so the decode path stays
    planar end-to-end (phy/rx.py decode_frame_planar docstring).

    ``pad_to_tiles`` zero-pads T to a multiple of 128 plus one spare tile
    — the zero-copy contract of the fused kernels' pre-padded planar
    input (kernels/align_pallas.py).
    """
    if isinstance(x, tuple):
        re, im = (np.asarray(v, np.float32) for v in x)
    else:
        arr = np.asarray(x)
        re = arr.real.astype(np.float32)
        im = (arr.imag if np.iscomplexobj(arr)
              else np.zeros_like(arr)).astype(np.float32)
    t = re.shape[-1]
    t_pad = ((-(-t // 128)) + 1) * 128 if pad_to_tiles else t
    if t_pad != t:
        pad = [(0, 0)] * (re.ndim - 1) + [(0, t_pad - t)]
        re = np.pad(re, pad)
        im = np.pad(im, pad)

    def upload():
        dre = jnp.asarray(re)
        dim = jnp.asarray(im)
        return jax.block_until_ready(
            jax.jit(lambda a, b: jnp.stack([a, b], axis=-2))(dre, dim))

    return _with_retries(upload, "h2d")
