"""Tests for the signal ops layer: FFT engines, shifts, xcorr, convolution."""

import jax.numpy as jnp
import numpy as np
import pytest

from ofdm_tpu import constants
from ofdm_tpu.ops.convolve import convolve_direct, convolve_fft
from ofdm_tpu.ops.fft import dft_matmul, fft, ifft
from ofdm_tpu.ops.shift import fft_shift, ifft_shift
from ofdm_tpu.ops.xcorr import locking_sync_offset, sliding_correlation, xcorr_fft


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestFFT:
    def test_dft_matmul_matches_fft(self, rng):
        x = rng.standard_normal((5, 64)) + 1j * rng.standard_normal((5, 64))
        np.testing.assert_allclose(
            np.asarray(dft_matmul(jnp.asarray(x), inverse=False)),
            np.fft.fft(x, axis=-1), rtol=0, atol=1e-9)

    def test_dft_matmul_inverse(self, rng):
        x = rng.standard_normal((3, 64)) + 1j * rng.standard_normal((3, 64))
        np.testing.assert_allclose(
            np.asarray(dft_matmul(jnp.asarray(x), inverse=True)),
            np.fft.ifft(x, axis=-1), rtol=0, atol=1e-9)

    def test_dft_matmul_select_derot_oracle(self, rng):
        # y[..., c, k] must equal the DFT of the elementwise-derotated
        # symbol at the selected bins: phasor exp(-i w (offset + p)) folded
        # into a per-row matrix (the decode_aligned matrix-derot primitive).
        from ofdm_tpu.ops.fft import dft_matmul_select_derot
        B, C, n = 3, 4, 64
        x = (rng.standard_normal((B, C, n))
             + 1j * rng.standard_normal((B, C, n)))
        w = rng.uniform(0.0, 0.04, B)
        bins = (1, 5, 17, 40, 63)
        off = 16
        phi = np.exp(-1j * w[:, None] * (off + np.arange(n)))
        expect = np.fft.fft(x * phi[:, None, :], axis=-1)[..., list(bins)]
        got = np.asarray(dft_matmul_select_derot(
            jnp.asarray(x), bins, jnp.asarray(w), sample_offset=off))
        np.testing.assert_allclose(got, expect, rtol=0, atol=1e-9)

    def test_dft_matmul_select_derot_planar_oracle(self, rng):
        # the planar-fed form (xr @ top + xi @ bot) must compute the same
        # derotated selected-bin DFT as the packed form, from planes
        from ofdm_tpu.ops.fft import (dft_matmul_select_derot,
                                      dft_matmul_select_derot_planar)
        B, C, n = 3, 4, 64
        x = (rng.standard_normal((B, C, n))
             + 1j * rng.standard_normal((B, C, n)))
        w = rng.uniform(0.0, 0.04, B)
        bins = (1, 5, 17, 40, 63)
        off = 16
        phi = np.exp(-1j * w[:, None] * (off + np.arange(n)))
        expect = np.fft.fft(x * phi[:, None, :], axis=-1)[..., list(bins)]
        got = np.asarray(dft_matmul_select_derot_planar(
            jnp.asarray(x.real), jnp.asarray(x.imag), bins, jnp.asarray(w),
            sample_offset=off))
        np.testing.assert_allclose(got, expect, rtol=0, atol=1e-9)
        packed = np.asarray(dft_matmul_select_derot(
            jnp.asarray(x), bins, jnp.asarray(w), sample_offset=off))
        np.testing.assert_allclose(got, packed, rtol=0, atol=1e-9)

    def test_idft_rows_cp_fold(self, rng):
        # CP folded into the IFFT matrix: values match the gather+concat
        # formulation to f32 rounding, and the structural invariant the
        # receiver relies on — prefix == block tail — holds EXACTLY
        # (duplicated matrix columns give identical dot products).
        from ofdm_tpu.config import DEFAULT_CONFIG as cfg
        from ofdm_tpu.ops.fft import idft_matmul_rows, idft_matmul_rows_cp
        x = (rng.standard_normal((5, 9, 48))
             + 1j * rng.standard_normal((5, 9, 48))).astype(np.complex64)
        bins = tuple(cfg.data_indices)
        t = idft_matmul_rows(jnp.asarray(x), bins, cfg.n_fft)
        old = np.asarray(jnp.concatenate([t[..., -cfg.cp_len:], t], axis=-1))
        new = np.asarray(idft_matmul_rows_cp(jnp.asarray(x), bins,
                                             cfg.n_fft, cfg.cp_len))
        np.testing.assert_allclose(new, old, rtol=0, atol=1e-6)
        np.testing.assert_array_equal(new[..., :cfg.cp_len],
                                      new[..., cfg.n_fft:])

    def test_ifft_is_1_over_n_normalized(self):
        # Reference ifft scales by 1/N (src/signals/mod.rs:49-58).
        x = jnp.asarray(np.ones(64, dtype=np.complex128))
        out = np.asarray(ifft(x))
        assert np.isclose(out[0], 1.0)
        np.testing.assert_allclose(out[1:], 0, atol=1e-12)

    def test_roundtrip(self, rng):
        x = rng.standard_normal((2, 7, 64)) + 1j * rng.standard_normal((2, 7, 64))
        back = np.asarray(ifft(fft(jnp.asarray(x))))
        np.testing.assert_allclose(back, x, atol=1e-9)


class TestShift:
    @pytest.mark.parametrize("n", [6, 7, 64, 80])
    def test_matches_numpy(self, n, rng):
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        np.testing.assert_array_equal(np.asarray(fft_shift(jnp.asarray(x))),
                                      np.fft.fftshift(x))
        np.testing.assert_array_equal(np.asarray(ifft_shift(jnp.asarray(x))),
                                      np.fft.ifftshift(x))

    def test_roundtrip_odd(self, rng):
        x = rng.standard_normal(7)
        back = np.asarray(ifft_shift(fft_shift(jnp.asarray(x))))
        np.testing.assert_array_equal(back, x)


class TestXcorr:
    def test_xcorr_fft_oracle_small(self):
        # Hand-derived oracle for the reference's xcorr_fft semantics
        # (src/signals/mod.rs:186-217) on x=[1,2,3], h=[4,5]:
        # circular corr on pad-to-5 = [14,23,12,0,5], fftshifted -> [0,5,14,23,12].
        idx, cross = xcorr_fft(jnp.asarray([1, 2, 3], dtype=jnp.complex128),
                               jnp.asarray([4, 5], dtype=jnp.complex128))
        np.testing.assert_allclose(np.asarray(cross).real,
                                   [0, 5, 14, 23, 12], atol=1e-9)
        assert int(idx) == 3

    def test_sliding_matches_xcorr_fft_on_overlap(self, rng):
        n, k = 400, 80
        a = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        b = rng.standard_normal(k) + 1j * rng.standard_normal(k)
        _, cross = xcorr_fft(jnp.asarray(a), jnp.asarray(b))
        sl = np.asarray(sliding_correlation(jnp.asarray(a), jnp.asarray(b)))
        # cross index p = lag p-(n-1); sliding index i = lag i-(k-1)
        full = np.asarray(cross)
        for lag in (-5, 0, 1, 17, n - k, n - 2):
            np.testing.assert_allclose(sl[lag + k - 1], full[lag + n - 1],
                                       atol=1e-6)

    def test_sync_offset_matches_reference_formula(self, rng):
        # Place the locking signal at a known delay; reference offset = lag-1.
        lock = jnp.asarray(constants.locking_signal(80))
        for delay in (9, 50, 123):
            stream = np.zeros(1000, dtype=np.complex128)
            stream[delay:delay + 80] = np.asarray(lock)
            stream += 0.01 * (rng.standard_normal(1000)
                              + 1j * rng.standard_normal(1000))
            off = int(locking_sync_offset(jnp.asarray(stream), lock))
            # reference: idxmax - ((len-1)/2 + 1)  ==  peak_lag - 1
            idx, cross = xcorr_fft(jnp.asarray(stream), lock)
            ref_off = int(idx) - ((cross.shape[0] - 1) // 2 + 1)
            assert off == ref_off == delay - 1

    def test_batched(self, rng):
        lock = jnp.asarray(constants.locking_signal(80))
        streams = np.zeros((3, 500), dtype=np.complex128)
        delays = [11, 99, 222]
        for i, d in enumerate(delays):
            streams[i, d:d + 80] = np.asarray(lock)
        offs = np.asarray(locking_sync_offset(jnp.asarray(streams), lock))
        np.testing.assert_array_equal(offs, np.asarray(delays) - 1)


class TestMatmulCorrelation:
    def test_matches_conv_path_complex_template(self, rng):
        from ofdm_tpu.ops.xcorr import sliding_correlation_matmul
        for k in (16, 80, 128):
            t = rng.standard_normal(k) + 1j * rng.standard_normal(k)
            x = rng.standard_normal((2, 1000)) + 1j * rng.standard_normal((2, 1000))
            ref = np.asarray(sliding_correlation(jnp.asarray(x),
                                                 jnp.asarray(t)))[:, k - 1:]
            mm = np.asarray(sliding_correlation_matmul(jnp.asarray(x), t))
            np.testing.assert_allclose(mm, ref, atol=1e-9)

    def test_matmul_real_template_path(self, rng):
        # a pure-real template (the locking ramp) takes the half-MAC
        # Tr-only path; results must match the direct correlation exactly
        from ofdm_tpu.ops.xcorr import sliding_correlation_matmul
        for t in (jnp.asarray(constants.locking_signal(80)),
                  jnp.asarray(rng.standard_normal(80) + 0j)):
            x = rng.standard_normal((2, 1000)) + 1j * rng.standard_normal((2, 1000))
            ref = np.asarray(sliding_correlation(jnp.asarray(x), t))[:, 79:]
            mm = np.asarray(sliding_correlation_matmul(jnp.asarray(x),
                                                       np.asarray(t)))
            np.testing.assert_allclose(mm, ref, atol=1e-9)

    def test_short_stream(self, rng):
        from ofdm_tpu.ops.xcorr import sliding_correlation_matmul
        t = rng.standard_normal(80) + 0j
        x = rng.standard_normal(100) + 0j
        ref = np.asarray(sliding_correlation(jnp.asarray(x), jnp.asarray(t)))[79:]
        mm = np.asarray(sliding_correlation_matmul(jnp.asarray(x), t))
        np.testing.assert_allclose(mm, ref, atol=1e-9)

    def test_sync_quality_gate(self, rng):
        # rho is the normalized matched filter in [0, 1]: ~1 at a clean
        # locking block, ~ln(T)/K on noise-only streams — the shared gate
        # statistic of decode_burst and decode_continuous.
        from ofdm_tpu.ops.xcorr import locking_sync_quality
        lock = jnp.asarray(constants.locking_signal(80))
        noise = 0.01 * (rng.standard_normal(2000) + 1j * rng.standard_normal(2000))
        with_frame = noise.copy()
        with_frame[500:580] += np.asarray(lock)
        _, rho_noise = locking_sync_quality(jnp.asarray(noise), lock)
        off, rho_frame = locking_sync_quality(jnp.asarray(with_frame), lock)
        assert float(rho_frame) > 0.9          # clean block: rho -> 1
        assert float(rho_noise) < 0.2          # noise floor, below the gate
        assert float(rho_frame) > 5 * float(rho_noise)
        assert int(off) == 499


class TestConvolve:
    def test_direct_matches_numpy(self, rng):
        x = rng.standard_normal(200) + 1j * rng.standard_normal(200)
        h = rng.standard_normal(64)
        out = np.asarray(convolve_direct(jnp.asarray(x), jnp.asarray(h)))
        np.testing.assert_allclose(out, np.convolve(x, h), atol=1e-9)

    def test_fft_matches_direct(self, rng):
        x = rng.standard_normal(128) + 1j * rng.standard_normal(128)
        h = jnp.asarray(constants.CHANNEL_TAPS)
        np.testing.assert_allclose(np.asarray(convolve_fft(jnp.asarray(x), h)),
                                   np.asarray(convolve_direct(jnp.asarray(x), h)),
                                   atol=1e-8)

    def test_channel_conv_matlab_oracle(self):
        # MATLAB oracle pasted in the reference test channel_makes_sense
        # (src/channel.rs:93-178): conv of 128 x (1-1j) with CHANNEL.
        x = jnp.asarray(np.full(128, 1.0 - 1.0j))
        out = np.asarray(convolve_direct(x, jnp.asarray(constants.CHANNEL_TAPS)))
        expected_re = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -0.0000,
                       -0.1912, 0.7404, 1.0225, 0.8234, 0.9864, 0.8847,
                       0.9391, 0.9130, 0.9220, 0.9220, 0.9186]
        # the pasted MATLAB output is rounded to 4 decimals
        np.testing.assert_allclose(out.real[:19], expected_re, atol=1.5e-4)
        np.testing.assert_allclose(out.imag[:19], -np.asarray(expected_re), atol=1.5e-4)

    def test_batched(self, rng):
        x = rng.standard_normal((4, 100)) + 1j * rng.standard_normal((4, 100))
        h = rng.standard_normal(16)
        out = np.asarray(convolve_direct(jnp.asarray(x), jnp.asarray(h)))
        for i in range(4):
            np.testing.assert_allclose(out[i], np.convolve(x[i], h), atol=1e-9)
