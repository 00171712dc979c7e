"""Tests for the packet/data layer and IQ file I/O."""

import json

import numpy as np

from ofdm_tpu.core.corpus import (CORPUS, create_transmission_text,
                                  decipher_transmission_colorspace,
                                  decipher_transmission_text)
from ofdm_tpu.io.iqfile import bytes_to_sig, read_iq, sig_to_bytes, write_iq
from ofdm_tpu.packets import colors
from ofdm_tpu.packets.gif import bytestream_to_rgb, gif_to_bytestream

REF_COLORS_JSON = "/root/reference/support/colors.json"
REF_GIF = "/root/reference/support/dancing_super_small.gif"
REF_BYTES = "/root/reference/support/dancing.bytes"


class TestColors:
    def test_palette_matches_reference_json(self):
        ref = json.load(open(REF_COLORS_JSON))
        refpal = np.array([[e["rgb"]["r"], e["rgb"]["g"], e["rgb"]["b"]]
                           for e in ref], dtype=np.uint8)
        np.testing.assert_array_equal(colors.palette(), refpal)

    def test_named_anchors(self):
        # color_space_works (src/packets/colors.rs:84-88): 0=Black, 1=Maroon
        np.testing.assert_array_equal(colors.id_to_rgb(np.uint8(0)), [0, 0, 0])
        np.testing.assert_array_equal(colors.id_to_rgb(np.uint8(1)), [128, 0, 0])

    def test_nearest_exact_on_palette(self):
        pal = colors.palette()
        # every palette color maps to an id with identical RGB (duplicates in
        # the palette, e.g. Black/Grey0, may map to either id)
        ids = colors.nearest_id(pal)
        np.testing.assert_array_equal(colors.id_to_rgb(ids), pal)

    def test_u32_packing(self):
        # (r<<16)|(g<<8)|b, matching utils.rs:195-202
        assert colors.id_to_u32(np.uint8(1)) == 0x800000


class TestGif:
    def test_gif_roundtrip_against_reference_asset(self):
        dims, frames = gif_to_bytestream(open(REF_GIF, "rb").read())
        assert dims == (24, 24)
        assert len(frames) == 8
        assert all(f.shape == (576,) for f in frames)
        # dancing.bytes is the reference's own quantization of frame data;
        # color ids must be valid and the decoded image displayable
        img = bytestream_to_rgb(frames[0], *dims)
        assert img.shape == (24, 24, 3)

    def test_reference_dancing_bytes_decodable(self):
        raw = np.frombuffer(open(REF_BYTES, "rb").read(), np.uint8)
        assert raw.shape == (576,)  # 24x24 frame
        pix = decipher_transmission_colorspace(raw, ecc=False)
        assert pix.shape == (576,) and pix.dtype == np.uint32


class TestIqFile:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        sig = rng.standard_normal(100) + 1j * rng.standard_normal(100)
        p = tmp_path / "x.dat"
        write_iq(p, sig)
        back = read_iq(p)
        np.testing.assert_allclose(back, sig, atol=1e-6)  # f32 wire precision

    def test_wire_format_is_interleaved_f32_le(self):
        b = sig_to_bytes(np.asarray([1.0 + 2.0j]))
        assert len(b) == 8
        assert np.frombuffer(b, "<f4").tolist() == [1.0, 2.0]

    def test_truncated_tail_ignored(self):
        b = sig_to_bytes(np.asarray([1.0 + 2.0j, 3 + 4j])) + b"\x00\x00"
        sig = bytes_to_sig(b)
        assert sig.shape == (2,)


class TestCorpus:
    def test_text_cycle(self):
        data = create_transmission_text(500, ecc=False)
        assert data.shape == (500,)
        assert bytes(data[:10]) == CORPUS.encode()[:10]

    def test_text_with_ecc_roundtrip(self):
        coded = create_transmission_text(300, ecc=True)
        assert len(coded) == 510  # 2 RS blocks (ceil framing + trailing rule)
        text = decipher_transmission_text(300, coded, ecc=True)
        assert text == CORPUS.encode().decode()[:300] or text.encode() == bytes(
            create_transmission_text(300, ecc=False))

    def test_decipher_bad_data_returns_none(self):
        rng = np.random.default_rng(1)
        garbage = rng.integers(0, 256, 510, dtype=np.uint8)
        assert decipher_transmission_text(300, garbage, ecc=True) is None


class TestObs:
    def test_taps(self, tmp_path):
        from ofdm_tpu.obs import taps
        taps.tap("never_written", np.ones(4))  # disabled: no-op
        taps.enable(tmp_path)
        try:
            taps.tap("sig", np.asarray([1 + 2j, 3 + 4j]))
            assert (tmp_path / "sig_reals.npy").exists()
            np.testing.assert_array_equal(np.load(tmp_path / "sig_imag.npy"), [2, 4])
        finally:
            taps.disable()
        assert not (tmp_path / "never_written_reals.npy").exists()

    def test_plots_render(self):
        from ofdm_tpu.obs.plots import constellation, stem_plot
        sig = np.exp(2j * np.pi * np.arange(64) / 64)
        s = stem_plot(sig)
        c = constellation(sig)
        assert isinstance(s, str) and len(s.splitlines()) == 10
        assert isinstance(c, str) and len(c) > 0
        sm = stem_plot(sig, smooth=True)
        assert isinstance(sm, str) and len(sm.splitlines()) == 10

    def test_cubic_spline_resample(self):
        """The smoothing spline (src/plots.rs:20-26 parity) must pass
        through the knots exactly and track a smooth function closely."""
        from ofdm_tpu.obs.plots import _cubic_spline_resample
        x = np.sin(np.linspace(0, 3 * np.pi, 10))
        r = _cubic_spline_resample(x, 91)
        np.testing.assert_allclose(r[::10], x, atol=1e-9)
        dense = np.sin(np.linspace(0, 3 * np.pi, 91))
        assert np.abs(r - dense).max() < 0.05
