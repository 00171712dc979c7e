"""Regenerate the golden wire-format fixtures in tests/golden/.

Run on CPU with x64.  The fixtures freeze the encoder's exact output for
fixed payloads so any change to the frame math (constants, masks, IFFT
normalization, ordering) is caught as a diff — the stand-in for bit-exact
comparison against the Rust reference, whose toolchain is not available in
this environment (frame constants themselves are verified against the
reference's RNG/dsp algorithms in test_rustrng/test_frame).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import ofdm_tpu as ot

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def gen_tx_frames():
    payload = np.arange(200, dtype=np.uint8)
    fixtures = {}
    for mod in ot.Modulation:
        for gb in (False, True):
            tx = np.asarray(ot.encode(payload, guard_bands=gb, modulation=mod,
                                      dtype=jnp.complex128))
            fixtures[f"tx_{mod.value}_gb{int(gb)}"] = tx
    np.savez_compressed(os.path.join(OUT, "tx_frames.npz"), **fixtures)
    print(f"wrote {len(fixtures)} fixtures to {OUT}/tx_frames.npz")


def gen_rx_capture():
    """Frozen NOISY capture — the rx-chain dual of tx_frames.npz.

    A QAM64 frame pushed through the full channel simulator (verbatim
    reference multipath taps + CFO draw + timing delay + noise at SNR 45,
    fixed key) written as an fc32 ``.dat`` in the reference wire format
    (examples/lab3c.rs:26-54 decodes such a hardware capture).  The test
    replays it through io/iqfile.py + decode_frame/decode and must
    reproduce the frozen decoded bytes EXACTLY — pinning the whole rx
    chain (sync, CFO, channel est, equalize, pilot phase, demod, packing)
    against bit drift the way tx_frames.npz pins tx.
    """
    from ofdm_tpu.io.iqfile import read_iq, write_iq
    rng = np.random.default_rng(42)
    payload = rng.integers(0, 256, 300, dtype=np.uint8)
    mod = ot.Modulation.QAM64
    tx = ot.encode(payload, guard_bands=True, modulation=mod,
                   dtype=jnp.complex64)
    rx = np.asarray(ot.channel(tx, snr=45.0, timing_error=True,
                               key=jax.random.key(2024)))
    # pad to the static decode_frame window + a little slack
    nb = ot.n_data_blocks(300, mod, True)
    need = (7 + nb) * 80
    rx = np.pad(rx, (0, max(0, need + 40 - rx.shape[-1])))
    dat = os.path.join(OUT, "rx_capture_qam64.dat")
    write_iq(dat, rx.astype(np.complex64))
    back = read_iq(dat, dtype=np.complex64)
    out = np.asarray(ot.decode_frame(jnp.asarray(back), n_blocks=nb,
                                     guard_bands=True, modulation=mod))
    assert np.array_equal(out[16:16 + 300], payload), "capture must decode"
    np.savez_compressed(os.path.join(OUT, "rx_capture_expected.npz"),
                        payload=payload, decoded=out,
                        n_blocks=np.int64(nb))
    print(f"wrote {dat} ({os.path.getsize(dat)} B) + expected bytes")


def main():
    os.makedirs(OUT, exist_ok=True)
    gen_tx_frames()
    gen_rx_capture()


if __name__ == "__main__":
    main()
