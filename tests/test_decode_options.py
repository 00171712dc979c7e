"""Tests for decode_frame's production options (sync dtype, search window)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ofdm_tpu as ot


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (4, 120), dtype=np.uint8)
    tx = ot.encode(data, guard_bands=True, modulation=ot.Modulation.QPSK)
    rx = ot.channel(tx, snr=30.0, timing_error=True, key=jax.random.key(1))
    nb = ot.n_data_blocks(120, ot.Modulation.QPSK, True)
    return data, rx, nb


def _payload(out):
    return np.asarray(out)[:, 16:16 + 120]


def test_default(setup):
    data, rx, nb = setup
    out = ot.decode_frame(rx, n_blocks=nb, guard_bands=True,
                          modulation=ot.Modulation.QPSK)
    np.testing.assert_array_equal(_payload(out), data)


def test_bf16_sync(setup):
    data, rx, nb = setup
    out = ot.decode_frame(rx, n_blocks=nb, guard_bands=True,
                          modulation=ot.Modulation.QPSK,
                          sync_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(_payload(out), data)


def test_fft_sync(setup):
    data, rx, nb = setup
    out = ot.decode_frame(rx, n_blocks=nb, guard_bands=True,
                          modulation=ot.Modulation.QPSK, sync_dtype="fft")
    np.testing.assert_array_equal(_payload(out), data)


def test_search_window(setup):
    data, rx, nb = setup
    # channel delay is ~9 samples; a 256-sample acquisition window suffices
    out = ot.decode_frame(rx, n_blocks=nb, guard_bands=True,
                          modulation=ot.Modulation.QPSK, search_window=256)
    np.testing.assert_array_equal(_payload(out), data)


def test_search_window_bounds_acquisition(setup):
    data, rx, nb = setup
    # push the frame 600 samples in: a 256-sample window misses it, a
    # 1024-sample window finds it
    delayed = jnp.concatenate(
        [jnp.zeros((rx.shape[0], 600), rx.dtype), rx], axis=-1)
    missed = ot.decode_frame(delayed, n_blocks=nb, guard_bands=True,
                             modulation=ot.Modulation.QPSK, search_window=256)
    assert (_payload(missed) != data).any()
    found = ot.decode_frame(delayed, n_blocks=nb, guard_bands=True,
                            modulation=ot.Modulation.QPSK, search_window=1024)
    np.testing.assert_array_equal(_payload(found), data)


def test_1d_input(setup):
    data, rx, nb = setup
    out = ot.decode_frame(rx[0], n_blocks=nb, guard_bands=True,
                          modulation=ot.Modulation.QPSK)
    np.testing.assert_array_equal(np.asarray(out)[16:16 + 120], data[0])
