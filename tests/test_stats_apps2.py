"""Tests for ops.stats parity helpers and the second batch of apps."""

import os

import jax.numpy as jnp
import numpy as np


class TestStats:
    def test_mean(self):
        # mean_works oracle (src/signals/mod.rs:386-394)
        vals = jnp.asarray([1 + 1j, 1 + 2j, 1 + 3j])
        from ofdm_tpu.ops.stats import mean
        assert complex(mean(vals)) == 1 + 2j

    def test_variance_pseudo(self):
        from ofdm_tpu.ops.stats import variance
        vals = jnp.asarray([1 + 1j, 1 + 2j, 1 + 3j])
        assert np.isclose(complex(variance(vals)), -2.0 / 3.0)

    def test_idmax_first_occurrence(self):
        from ofdm_tpu.ops.stats import idmax
        vals = jnp.asarray([1 + 0j, 3 + 0j, 0 + 3j, 1 + 0j])
        assert int(idmax(vals)) == 1


class TestApps2:
    def test_lab3b_is_lab3a_with_cfo(self, capsys):
        from ofdm_tpu.apps import lab3b
        rc = lab3b.main(["--msg-bytes", "80", "--guard-bands", "--seed", "1"])
        assert rc == 0

    def test_lab3c_image_roundtrip(self, tmp_path):
        from ofdm_tpu.apps import lab3c_image
        iq = str(tmp_path / "img.dat")
        png = str(tmp_path / "img.png")
        assert lab3c_image.main(["--transmit", iq]) == 0
        assert lab3c_image.main(["--receive", iq, "--out", png]) == 0
        assert os.path.getsize(png) > 0
        # recovered frame must equal the source image bytes
        from PIL import Image

        from ofdm_tpu.packets.colors import id_to_rgb
        raw = np.frombuffer(
            open("/root/reference/support/dancing.bytes", "rb").read(), np.uint8)
        expected = id_to_rgb(raw[:576]).reshape(24, 24, 3)
        got = np.asarray(Image.open(png))
        np.testing.assert_array_equal(got, expected)

    def test_transmitloop(self, tmp_path):
        from ofdm_tpu.apps import transmitloop
        out = str(tmp_path / "loop.dat")
        rc = transmitloop.main(["--iterations", "3", "--out", out])
        assert rc == 0
        sz = os.path.getsize(out)
        assert sz > 0 and sz % 8 == 0  # whole fc32 samples

    def test_transmitloop_stream_decodable(self, tmp_path):
        # frames written by transmitloop decode through the streaming receiver
        from ofdm_tpu.apps import rx_stream, transmitloop
        out = str(tmp_path / "loop.dat")
        transmitloop.main(["--iterations", "1", "--out", out])
        assert rx_stream.main(["--files", out]) == 0
