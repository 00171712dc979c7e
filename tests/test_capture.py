"""Native/mmap capture loader tests."""

import numpy as np
import pytest

import ofdm_tpu.io.capture as capture_mod
from ofdm_tpu.io.capture import Capture
from ofdm_tpu.io.iqfile import write_iq


@pytest.fixture
def cap_file(tmp_path):
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)
           ).astype(np.complex64)
    p = tmp_path / "cap.dat"
    write_iq(p, sig)
    return p, sig


@pytest.mark.parametrize("use_native", [True, False])
def test_read_planar(cap_file, use_native, monkeypatch):
    if use_native and capture_mod._LIB is None:
        pytest.skip("native loader not built")
    if not use_native:
        monkeypatch.setattr(capture_mod, "_LIB", None)
    p, sig = cap_file
    with Capture(p) as c:
        assert c.n_samples == 5000
        re, im = c.read_planar(123, 77)
        np.testing.assert_allclose(re + 1j * im, sig[123:200], atol=1e-6)
        # EOF clipping
        re, im = c.read_planar(4990, 100)
        assert re.size == 10


def test_chunks_with_overlap(cap_file):
    p, sig = cap_file
    with Capture(p) as c:
        chunks = list(c.chunks(1024, overlap=79))
        # first chunk has no lookback; later chunks carry 79 extra samples
        assert chunks[0][0].size == 1024
        assert chunks[1][0].size == 1024 + 79
        # reassemble: drop the overlap region of each later chunk
        parts = [chunks[0][0] + 1j * chunks[0][1]]
        for re, im in chunks[1:]:
            parts.append((re + 1j * im)[79:])
        joined = np.concatenate(parts)
        np.testing.assert_allclose(joined, sig, atol=1e-6)


def test_open_missing_file(tmp_path):
    with pytest.raises(OSError):
        Capture(tmp_path / "nope.dat")
