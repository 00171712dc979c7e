"""FrameConfig generality: non-default geometries decode end-to-end.

The reference hard-codes 64/16/80 const-generics; here geometry is data.  The
Schmidl-Cox estimator's unambiguous range is |f_delta| < pi/sym_len, so the
channel's CFO injection (pi*U/80 per sample, matched to 80-sample symbols)
only fits geometries with sym_len <= 80 — larger geometries are tested
without CFO (same limitation the reference notes in src/channel.rs:50-54).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ofdm_tpu as ot
from ofdm_tpu.config import FrameConfig

DATA = bytes(range(200))


@pytest.mark.parametrize("kwargs,cfo", [
    (dict(n_fft=32, cp_len=8, locking_seed=7), True),
    (dict(n_fft=128, cp_len=32, n_training=3, n_preamble=2, locking_seed=7), False),
    (dict(n_fft=256, cp_len=64, locking_seed=7), False),
    (dict(n_fft=64, cp_len=16, locking_seed=7), True),   # PRN lock, default dims
])
def test_custom_geometry_loopback(kwargs, cfo):
    cfg = FrameConfig(**kwargs)
    tx = ot.encode(DATA, modulation=ot.Modulation.QPSK, cfg=cfg,
                   dtype=jnp.complex128)
    rx = ot.channel(tx, snr=30.0, timing_error=cfo, key=jax.random.key(1))
    out = ot.decode(rx, modulation=ot.Modulation.QPSK, cfg=cfg)
    assert bytes(out.tobytes()) == DATA


def test_prn_locking_sharper_than_ramp():
    """The PRN locking block localizes where the reference ramp cannot."""
    from ofdm_tpu import constants
    from ofdm_tpu.ops.xcorr import sliding_correlation
    for seed, min_margin in ((None, 0.0), (7, 0.2)):
        cfg = FrameConfig(n_fft=256, cp_len=64, locking_seed=seed)
        lock = constants.locking_for(cfg)
        rng = np.random.default_rng(0)
        stream = 0.01 * (rng.standard_normal(2000)
                         + 1j * rng.standard_normal(2000))
        stream[300:300 + cfg.sym_len] += lock
        c = np.asarray(sliding_correlation(jnp.asarray(stream),
                                           jnp.asarray(lock)))
        p = np.abs(c) ** 2
        top2 = np.sort(p)[::-1][:2]
        margin = 1 - top2[1] / top2[0]
        if seed is not None:
            assert margin > min_margin, f"PRN peak margin too small: {margin}"
        else:
            # the ramp's margin is tiny at this length — documents why
            # locking_seed exists
            assert margin < 0.05


def test_default_cfg_unchanged_by_feature():
    # locking_seed=None must preserve the golden wire format
    cfg = FrameConfig()
    assert cfg.locking_seed is None
    tx = np.asarray(ot.encode(DATA, cfg=cfg, dtype=jnp.complex128))
    import os
    ref = np.load(os.path.join(os.path.dirname(__file__), "golden",
                               "tx_frames.npz"))["tx_bpsk_gb0"]
    np.testing.assert_array_equal(tx, ref)
