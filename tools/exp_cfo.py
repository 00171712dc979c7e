"""CFO estimator decision sweep (VERDICT round-1 task 8).

The reference CFO estimator averages per-sample angles of chunk4/chunk3
(src/receiver.rs:231-240).  Each per-sample angle sits at pi*u (the channel
draws f_delta = pi*U(0,1)/80 and the chunks are 80 samples apart,
src/channel.rs:48-63), so as u -> 1 noise pushes individual angles past +-pi
where they wrap and corrupt the mean — whole frames are lost.  The
"coherent" estimator takes the angle of the complex-averaged lag product
(sum right*conj(left)), the same statistic on clean signals but immune to
per-sample wrap outliers.

This sweep injects controlled u in [0.05 .. 0.995] at SNR 30 (QPSK+GB,
multipath via the standard channel taps) with 8 noise seeds each and counts
frames with any payload byte error, per estimator.  CPU/complex128.

Run: python tools/exp_cfo.py   (results recorded in docs/BENCHMARKS.md)
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
from ofdm_tpu import constants


def main():
    payload = 96
    mod = ot.Modulation.QPSK
    nb = ot.n_data_blocks(payload, mod, True)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, payload, dtype=np.uint8)
    tx = np.asarray(ot.encode(data, guard_bands=True, modulation=mod,
                              dtype=jnp.complex128))

    # channel: multipath conv + controlled CFO + AWGN at SNR 30
    taps = constants.CHANNEL_TAPS
    conv = np.convolve(tx, taps)
    snr_lin = 10 ** (30.0 / 10.0)

    us = [0.05, 0.5, 0.9, 0.95, 0.97, 0.99, 0.995]
    n_seeds = 8
    print(f"{'u':>6} {'reference lost':>15} {'coherent lost':>14}  (of {n_seeds})")
    total = {"reference": 0, "coherent": 0}
    for u in us:
        f = np.pi * u / 80.0
        n = np.arange(1, conv.shape[-1] + 1)
        cfo = conv * np.exp(1j * f * n)
        var = cfo.var()
        lost = {"reference": 0, "coherent": 0}
        for seed in range(n_seeds):
            r2 = np.random.default_rng(100 + seed)
            scale = np.sqrt(0.5 * var / snr_lin)
            noise = scale * ((r2.uniform(-1, 1, cfo.shape)
                              + 1j * r2.uniform(-1, 1, cfo.shape)))
            rx = jnp.asarray(cfo + noise)
            for est in ("reference", "coherent"):
                out = np.asarray(ot.decode_frame(
                    rx, n_blocks=nb, guard_bands=True, modulation=mod,
                    cfo_estimator=est))
                bad = int(np.count_nonzero(out[16:16 + payload] != data) > 0)
                lost[est] += bad
                total[est] += bad
        print(f"{u:>6} {lost['reference']:>15} {lost['coherent']:>14}")
    print(f"total lost frames: reference={total['reference']} "
          f"coherent={total['coherent']} "
          f"of {len(us) * n_seeds} per estimator")


if __name__ == "__main__":
    main()
