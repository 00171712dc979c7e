"""Tests for the block interleaver and the QAM256 extension."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ofdm_tpu as ot
from ofdm_tpu.fec import reed_solomon as rs
from ofdm_tpu.fec.interleave import deinterleave, interleave


class TestInterleave:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, 1000, dtype=np.uint8)
        for depth in (2, 3, 8):
            back = deinterleave(interleave(data, depth), depth, 1000)
            np.testing.assert_array_equal(back, data)

    def test_spreads_bursts(self):
        # a 48-byte burst in the interleaved stream lands <= 16 bytes in any
        # single RS codeword -> correctable; contiguous layout would lose one
        rng = np.random.default_rng(1)
        data = rng.integers(0, 256, 600, dtype=np.uint8)
        coded = rs.encode_stream(data)                    # 3 x 255 bytes
        depth = coded.size // rs.N                        # rows == codewords
        inter = interleave(coded, depth).copy()
        burst = slice(100, 148)
        inter[burst] ^= 0xFF
        recovered = deinterleave(inter, depth, coded.size)
        out, ok = rs.decode_stream(recovered)
        assert ok
        np.testing.assert_array_equal(out[:600], data)
        # without interleaving the same burst kills a codeword
        plain = coded.copy()
        plain[burst] ^= 0xFF
        _, ok2 = rs.decode_stream(plain)
        assert not ok2

    def test_device_variants_match_host(self):
        from ofdm_tpu.fec.interleave import (deinterleave_device,
                                             interleave_device)
        rng = np.random.default_rng(2)
        data = rng.integers(0, 256, 1000, dtype=np.uint8)
        for depth in (2, 5, 255):
            il_host = interleave(data, depth)
            il_dev = np.asarray(interleave_device(jnp.asarray(data), depth))
            np.testing.assert_array_equal(il_dev, il_host)
            back = np.asarray(deinterleave_device(jnp.asarray(il_dev),
                                                  depth, 1000))
            np.testing.assert_array_equal(back, data)
        # batched over leading axes
        b = rng.integers(0, 256, (3, 510), dtype=np.uint8)
        il = interleave_device(jnp.asarray(b), 255)
        back = np.asarray(deinterleave_device(il, 255, 510))
        np.testing.assert_array_equal(back, b)


class TestQam256:
    def test_loopback(self):
        data = bytes(range(200))
        tx = ot.encode(data, guard_bands=True, modulation=ot.Modulation.QAM256,
                       dtype=jnp.complex128)
        rx = ot.channel(tx, snr=55.0, key=jax.random.key(1))
        out = ot.decode(rx, guard_bands=True, modulation=ot.Modulation.QAM256)
        assert bytes(out.tobytes()) == data

    def test_constellation_size(self):
        from ofdm_tpu.phy.modulation import modulate_bits
        bits = jnp.asarray(
            [[(i >> b) & 1 for b in range(8)] for i in range(256)],
            dtype=bool).reshape(-1)
        syms = np.asarray(modulate_bits(bits, ot.Modulation.QAM256,
                                        dtype=jnp.complex128))
        assert len(set(map(tuple, np.c_[syms.real, syms.imag].tolist()))) == 256
        assert syms.real.max() == 15 and syms.real.min() == -15

    def test_bits_per_frame(self):
        # 8 bits/symbol doubles QAM16's throughput per block
        nb256 = ot.n_data_blocks(400, ot.Modulation.QAM256, True)
        nb16 = ot.n_data_blocks(400, ot.Modulation.QAM16, True)
        assert nb256 == -(-nb16 // 2) or nb256 <= nb16 // 2 + 1
