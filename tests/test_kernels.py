"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU
by the benchmark harness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ofdm_tpu import constants
from ofdm_tpu.kernels.sync_pallas import sync_offset_pallas
from ofdm_tpu.ops.xcorr import locking_sync_offset


@pytest.fixture
def lock():
    return np.asarray(constants.locking_signal(80))


def _make_streams(lock, delays, t, noise=0.01, seed=0):
    rng = np.random.default_rng(seed)
    streams = noise * (rng.standard_normal((len(delays), t))
                       + 1j * rng.standard_normal((len(delays), t)))
    for i, d in enumerate(delays):
        streams[i, d:d + 80] += lock
    return jnp.asarray(streams.astype(np.complex64))


def test_matches_xla_path(lock):
    s = _make_streams(lock, [9, 511, 512, 1023, 2047], 2500)
    ref = np.asarray(locking_sync_offset(s, jnp.asarray(lock.astype(np.complex64))))
    pal = np.asarray(sync_offset_pallas(s, lock, interpret=True))
    np.testing.assert_array_equal(pal, ref)


def test_tile_boundaries(lock):
    # peaks straddling the 512-sample tile boundary exercise the halo DMA
    s = _make_streams(lock, [480, 500, 510], 1200, seed=1)
    pal = np.asarray(sync_offset_pallas(s, lock, interpret=True))
    np.testing.assert_array_equal(pal, [479, 499, 509])


def test_single_stream(lock):
    s = _make_streams(lock, [100], 1000, seed=2)[0]
    off = int(sync_offset_pallas(s, lock, interpret=True))
    assert off == 99


def test_realistic_frame(lock):
    import jax

    import ofdm_tpu as ot
    data = np.random.default_rng(3).integers(0, 256, (2, 64), dtype=np.uint8)
    tx = ot.encode(data, guard_bands=True, modulation=ot.Modulation.QPSK)
    rx = ot.channel(tx, snr=30.0, key=jax.random.key(1))
    ref = np.asarray(ot.sync_offset(rx))
    pal = np.asarray(sync_offset_pallas(rx, lock, interpret=True))
    np.testing.assert_array_equal(pal, ref)
