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


@pytest.mark.parametrize("mod,gb", [(ot.Modulation.QAM64, True),
                                    (ot.Modulation.QAM256, True),
                                    (ot.Modulation.BPSK, False)])
def test_derot_matrix_parity(mod, gb):
    """derot_impl="matrix" (CFO folded into a per-row DFT matrix) must be
    byte-identical to the stream derotation across modulations, guard
    settings and nonzero CFO draws (the channel draws CFO per row)."""
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, (6, 240), dtype=np.uint8)
    tx = ot.encode(data, guard_bands=gb, modulation=mod)
    snr = 55.0 if mod == ot.Modulation.QAM256 else 35.0
    rx = ot.channel(tx, snr=snr, timing_error=True, key=jax.random.key(5))
    nb = ot.n_data_blocks(240, mod, gb)
    a = ot.decode_frame(rx, n_blocks=nb, guard_bands=gb, modulation=mod,
                        derot_impl="stream")
    b = ot.decode_frame(rx, n_blocks=nb, guard_bands=gb, modulation=mod,
                        derot_impl="matrix")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(b)[:, 16:16 + 240], data)


def test_derot_matrix_diag_parity():
    """The matrix path's diagnostics (h_k, chunk6 taps, equalized) must
    match the stream path to f32 tolerance — they are computed from
    separately-derotated small tensors."""
    from ofdm_tpu.phy.rx import decode_aligned
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, (3, 120), dtype=np.uint8)
    tx = ot.encode(data, guard_bands=True, modulation=ot.Modulation.QPSK)
    rx = ot.channel(tx, snr=40.0, key=jax.random.key(2))
    nb = ot.n_data_blocks(120, ot.Modulation.QPSK, True)
    from ofdm_tpu.config import DEFAULT_CONFIG as cfg
    n_chunks = cfg.n_sync_chunks + nb
    aligned = rx[..., : n_chunks * cfg.sym_len]
    _, da = decode_aligned(aligned, n_chunks=n_chunks, guard_bands=True,
                           modulation=ot.Modulation.QPSK,
                           cfo_estimator="coherent", derot_impl="stream")
    _, db = decode_aligned(aligned, n_chunks=n_chunks, guard_bands=True,
                           modulation=ot.Modulation.QPSK,
                           cfo_estimator="coherent", derot_impl="matrix")
    for k in ("f_delta", "h_k", "chunk6_pre", "chunk6_post", "equalized"):
        np.testing.assert_allclose(np.asarray(da[k]), np.asarray(db[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_1d_input(setup):
    data, rx, nb = setup
    out = ot.decode_frame(rx[0], n_blocks=nb, guard_bands=True,
                          modulation=ot.Modulation.QPSK)
    np.testing.assert_array_equal(np.asarray(out)[16:16 + 120], data[0])
