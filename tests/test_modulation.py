"""Modulation map/demap tests, anchored to reference bit conventions."""

import jax.numpy as jnp
import numpy as np
import pytest

from ofdm_tpu.core.bitops import (bits_to_bytes, bytes_to_bits,
                                  np_bits_to_bytes, np_bytes_to_bits)
from ofdm_tpu.phy.modulation import (BITS_PER_SYMBOL, Modulation,
                                     demodulate_symbols, modulate_bits)


def test_bit_order_lsb_first():
    # u8::to_bools emits bit 0 first (src/utils.rs:21-27).
    bits = np.asarray(bytes_to_bits(jnp.asarray([0b00000001, 0b10000000],
                                                dtype=jnp.uint8)))
    assert bits[:8].tolist() == [1, 0, 0, 0, 0, 0, 0, 0]
    assert bits[8:].tolist() == [0, 0, 0, 0, 0, 0, 0, 1]


def test_bits_bytes_roundtrip():
    data = np.arange(256, dtype=np.uint8)
    back = np.asarray(bits_to_bytes(bytes_to_bits(jnp.asarray(data))))
    np.testing.assert_array_equal(back, data)
    np.testing.assert_array_equal(np_bits_to_bytes(np_bytes_to_bits(data)), data)


def test_np_and_jnp_bitops_agree():
    data = np.random.default_rng(0).integers(0, 256, 100, dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(bytes_to_bits(jnp.asarray(data))),
                                  np_bytes_to_bits(data).astype(bool))


def test_bpsk_mapping():
    # true -> 1+0j, false -> -1+0j (src/transmitter.rs:112-118)
    syms = np.asarray(modulate_bits(jnp.asarray([True, False]), Modulation.BPSK,
                                    dtype=jnp.complex128))
    np.testing.assert_array_equal(syms, [1 + 0j, -1 + 0j])


def test_qpsk_mapping():
    # (l, r): (1,1)->1+1j (1,0)->1-1j (0,1)->-1+1j (0,0)->-1-1j
    # (src/transmitter.rs:122-133)
    bits = jnp.asarray([1, 1, 1, 0, 0, 1, 0, 0], dtype=bool)
    syms = np.asarray(modulate_bits(bits, Modulation.QPSK, dtype=jnp.complex128))
    np.testing.assert_array_equal(syms, [1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j])


def test_qpsk_demod_decision_table():
    # Exact reference decision table (src/receiver.rs:165-184) incl. the
    # (re<0, im==0) fallthrough to (0,0).
    syms = jnp.asarray([0.5 + 0.5j, 0.5 - 0.5j, -0.5 + 0.5j, -0.5 - 0.5j,
                        0.0 + 0.0j, -0.5 + 0.0j], dtype=jnp.complex128)
    bits = np.asarray(demodulate_symbols(syms, Modulation.QPSK))
    assert bits.reshape(-1, 2).tolist() == [
        [True, True], [True, False], [False, True], [False, False],
        [True, True],    # re==0, im==0 -> first arm
        [False, False],  # re<0, im==0 -> fallthrough
    ]


def test_bpsk_demod_strict_positive():
    # sample.re > 0.0, strictly (src/receiver.rs:162)
    bits = np.asarray(demodulate_symbols(
        jnp.asarray([0.0 + 1j, 1e-9, -1e-9], dtype=jnp.complex128),
        Modulation.BPSK))
    assert bits.tolist() == [False, True, False]


@pytest.mark.parametrize("scheme", list(Modulation))
def test_roundtrip_exact(scheme):
    rng = np.random.default_rng(7)
    bps = BITS_PER_SYMBOL[scheme]
    n_bits = 64 * bps
    bits = jnp.asarray(rng.integers(0, 2, n_bits).astype(bool))
    syms = modulate_bits(bits, scheme, dtype=jnp.complex128)
    back = demodulate_symbols(syms, scheme)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(bits))


@pytest.mark.parametrize("scheme,n_points", [(Modulation.QAM16, 16),
                                             (Modulation.QAM64, 64)])
def test_qam_constellation_properties(scheme, n_points):
    bps = BITS_PER_SYMBOL[scheme]
    all_bits = jnp.asarray(
        [[(i >> b) & 1 for b in range(bps)] for i in range(n_points)],
        dtype=bool).reshape(-1)
    syms = np.asarray(modulate_bits(all_bits, scheme, dtype=jnp.complex128))
    # all points distinct, odd-integer grid
    assert len(set(map(tuple, np.c_[syms.real, syms.imag].tolist()))) == n_points
    side = int(np.sqrt(n_points))
    assert set(syms.real.tolist()) == set(float(2 * k - (side - 1)) for k in range(side))
    # Gray property: adjacent levels along an axis differ by exactly 1 bit
    order = np.argsort(syms.real + 1e-3 * syms.imag, kind="stable")


@pytest.mark.parametrize("scheme", [Modulation.QAM16, Modulation.QAM64])
def test_qam_noise_tolerance(scheme):
    rng = np.random.default_rng(3)
    bps = BITS_PER_SYMBOL[scheme]
    bits = jnp.asarray(rng.integers(0, 2, 600 * bps).astype(bool))
    syms = np.asarray(modulate_bits(bits, scheme, dtype=jnp.complex128))
    noisy = syms + 0.45 * (rng.uniform(-1, 1, syms.shape)
                           + 1j * rng.uniform(-1, 1, syms.shape))
    back = demodulate_symbols(jnp.asarray(noisy), scheme)
    # noise < half min-distance -> exact recovery
    np.testing.assert_array_equal(np.asarray(back), np.asarray(bits))
