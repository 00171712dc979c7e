"""Headline benchmark: aggregate 64QAM receive-chain throughput per chip.

Measures the full batched receiver (frame sync sliding correlation, CFO
derotation, channel estimation, equalization, pilot phase tracking, 64QAM
hard-decision demod, bit packing) on device, steady-state, and prints one
JSON line.  Baseline: the north-star target of 10 Gsamples/s aggregate on a
16-chip v5p slice = 625 Msamples/s/chip (BASELINE.md; the reference itself
publishes no numbers — README.md:5 is a placeholder).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PER_CHIP = 10e9 / 16  # north star: 10 GS/s on v5p-16


def main():
    import jax
    import jax.numpy as jnp

    import ofdm_tpu as ot

    payload_len = 8192
    mod = ot.Modulation.QAM64
    batch = 64
    nb = ot.n_data_blocks(payload_len, mod, True)
    frame = 880 + nb * 80  # sync overhead + data blocks + one spare chunk

    # Build a realistic received batch once (encode+channel), then bench decode.
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (batch, payload_len), dtype=np.uint8)
    tx = ot.encode(data, guard_bands=True, modulation=mod)
    rx = ot.channel(tx, snr=45.0, timing_error=True, key=jax.random.key(0))
    pad = frame - rx.shape[-1]
    if pad > 0:
        rx = jnp.pad(rx, ((0, 0), (0, pad)))
    rx = jax.block_until_ready(rx)

    decode = jax.jit(lambda s: ot.decode_frame(
        s, n_blocks=nb, guard_bands=True, modulation=mod))

    out = jax.block_until_ready(decode(rx))  # compile + warm
    # correctness gate: decoded payload must match
    errs = int(np.count_nonzero(np.asarray(out)[:, 16:16 + payload_len] != data))
    n_samples = rx.shape[0] * rx.shape[1]

    # steady state timing
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = decode(rx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    value = n_samples / dt
    print(json.dumps({
        "metric": "samples/s/chip (64QAM demod)",
        "value": value,
        "unit": "samples/s",
        "vs_baseline": value / BASELINE_PER_CHIP,
        "detail": {
            "batch": batch, "frame_samples": int(rx.shape[1]),
            "payload_bytes": payload_len, "byte_errors": errs,
            "seconds_per_step": dt, "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
