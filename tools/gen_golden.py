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


def main():
    os.makedirs(OUT, exist_ok=True)
    payload = np.arange(200, dtype=np.uint8)
    fixtures = {}
    for mod in ot.Modulation:
        for gb in (False, True):
            tx = np.asarray(ot.encode(payload, guard_bands=gb, modulation=mod,
                                      dtype=jnp.complex128))
            fixtures[f"tx_{mod.value}_gb{int(gb)}"] = tx
    np.savez_compressed(os.path.join(OUT, "tx_frames.npz"), **fixtures)
    print(f"wrote {len(fixtures)} fixtures to {OUT}/tx_frames.npz")


if __name__ == "__main__":
    main()
