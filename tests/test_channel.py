"""Channel simulator tests (behavior parity with src/channel.rs:32-74)."""

import jax
import jax.numpy as jnp
import numpy as np

from ofdm_tpu import constants
from ofdm_tpu.phy.channel import _complex_pseudo_variance, channel


def test_output_length():
    x = jnp.asarray(np.ones(100, np.complex128))
    out = channel(x, snr=30.0, key=jax.random.key(0))
    assert out.shape == (163,)  # T + 64 - 1


def test_convolution_matches_reference_taps():
    # At very high SNR the output is (almost exactly) conv(x, CHANNEL).
    rng = np.random.default_rng(1)
    x = rng.standard_normal(200) + 1j * rng.standard_normal(200)
    out = np.asarray(channel(jnp.asarray(x), snr=300.0, key=jax.random.key(0)))
    np.testing.assert_allclose(out, np.convolve(x, constants.CHANNEL_TAPS),
                               atol=1e-8)


def test_pseudo_variance_semantics():
    # Replicates SignalRef::variance: complex (unconjugated) square.
    x = jnp.asarray([1 + 1j, 1 + 2j, 1 + 3j])
    v = complex(np.asarray(_complex_pseudo_variance(x)))
    # mean = 1+2j; diffs = {j, 0, -j}; squares = {-1, 0, -1}; mean = -2/3
    assert np.isclose(v, -2.0 / 3.0)


def test_noise_scales_with_snr():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(5000) * (1 + 0j) + 0.3)  # real-ish signal
    clean = np.convolve(np.asarray(x), constants.CHANNEL_TAPS)
    n10 = np.asarray(channel(x, snr=10.0, key=jax.random.key(3))) - clean
    n30 = np.asarray(channel(x, snr=30.0, key=jax.random.key(3))) - clean
    p10, p30 = np.mean(np.abs(n10) ** 2), np.mean(np.abs(n30) ** 2)
    # 20 dB less noise power (same key -> same uniforms, scaled)
    assert np.isclose(p10 / p30, 100.0, rtol=1e-6)


def test_deterministic_with_key():
    x = jnp.asarray(np.ones(64, np.complex128))
    a = np.asarray(channel(x, snr=10.0, timing_error=True, key=jax.random.key(9)))
    b = np.asarray(channel(x, snr=10.0, timing_error=True, key=jax.random.key(9)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(channel(x, snr=10.0, timing_error=True, key=jax.random.key(10)))
    assert not np.array_equal(a, c)


def test_cfo_rotation_formula():
    # timing_error applies y[n] *= exp(+j f_delta (n+1)) with
    # f_delta = pi*U(0,1)/80 (src/channel.rs:48-63).
    x = jnp.asarray(np.ones(50, np.complex128))
    key = jax.random.key(4)
    out = np.asarray(channel(x, snr=1000.0, timing_error=True, key=key))
    clean = np.convolve(np.ones(50), constants.CHANNEL_TAPS)
    u = float(jax.random.uniform(jax.random.split(key)[0], (), dtype=jnp.float64))
    fd = np.pi * u / 80.0
    expected = clean * np.exp(1j * fd * np.arange(1, clean.size + 1))
    np.testing.assert_allclose(out, expected, atol=1e-7)


def test_batched_channel():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 100)) + 0j)
    out = channel(x, snr=20.0, timing_error=True, key=jax.random.key(0))
    assert out.shape == (4, 163)
    # rows get independent CFO draws? No — one key, same draw per call is fine;
    # but noise must differ across the batch via the sample axis
    o = np.asarray(out)
    assert not np.allclose(o[0], o[1])
