"""Fused post-DFT demod tail (kernels/demod_pallas.py) vs the XLA tail.

Interpret-mode parity on CPU: decode_frame with demod_impl="interpret" must
produce byte-identical output to the production XLA tail across modulations,
guard-band modes, and the CFO path.  (On TPU the same kernel is the
auto-selected production path; tools/exp_demod_tail.py gates it there.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ofdm_tpu as ot


def _roundtrip(mod, guard_bands, cfo, batch=3, payload=256, snr=45.0):
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, (batch, payload), dtype=np.uint8)
    tx = ot.encode(data, guard_bands=guard_bands, modulation=mod,
                   dtype=jnp.complex64)
    rx = ot.channel(tx, snr=snr, timing_error=cfo, key=jax.random.key(3))
    nb = ot.n_data_blocks(payload, mod, guard_bands)
    frame = 880 + nb * 80
    rx = jnp.pad(rx.astype(jnp.complex64),
                 ((0, 0), (0, max(0, frame - rx.shape[-1]))))
    return data, rx, nb


@pytest.mark.parametrize("mod,guard_bands", [
    (ot.Modulation.QAM64, True),
    (ot.Modulation.QPSK, True),
    (ot.Modulation.QAM256, True),
    (ot.Modulation.BPSK, False),
    (ot.Modulation.QAM16, False),
])
def test_fused_tail_matches_xla(mod, guard_bands):
    data, rx, nb = _roundtrip(mod, guard_bands, cfo=False)
    out_x = np.asarray(ot.decode_frame(rx, n_blocks=nb, guard_bands=guard_bands,
                                       modulation=mod, demod_impl="xla"))
    out_p = np.asarray(ot.decode_frame(rx, n_blocks=nb, guard_bands=guard_bands,
                                       modulation=mod, demod_impl="interpret"))
    np.testing.assert_array_equal(out_x, out_p)
    # and both decode the payload correctly
    assert np.array_equal(out_p[:, 16:16 + data.shape[1]], data)


def test_fused_tail_matches_xla_with_cfo():
    data, rx, nb = _roundtrip(ot.Modulation.QAM64, True, cfo=True)
    out_x = np.asarray(ot.decode_frame(rx, n_blocks=nb, guard_bands=True,
                                       modulation=ot.Modulation.QAM64,
                                       demod_impl="xla"))
    out_p = np.asarray(ot.decode_frame(rx, n_blocks=nb, guard_bands=True,
                                       modulation=ot.Modulation.QAM64,
                                       demod_impl="interpret"))
    np.testing.assert_array_equal(out_x, out_p)


def test_planar_select_dft_matches_packed():
    """The split planar matmuls compute the same DFT as the packed select
    (same K-reduction; backends may tile it differently -> f32 rounding)."""
    from ofdm_tpu.config import DEFAULT_CONFIG as cfg
    from ofdm_tpu.ops.fft import dft_matmul_select, dft_matmul_select_planar
    rng = np.random.default_rng(1)
    x = jnp.asarray((rng.normal(size=(5, 17, 64))
                     + 1j * rng.normal(size=(5, 17, 64))).astype(np.complex64))
    sel = tuple(cfg.data_indices) + tuple(cfg.pilot_indices)
    y = dft_matmul_select(x, sel)
    yr, yi = dft_matmul_select_planar(x, sel)
    np.testing.assert_allclose(np.asarray(jnp.real(y)), np.asarray(yr),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.imag(y)), np.asarray(yi),
                               rtol=1e-4, atol=1e-4)
