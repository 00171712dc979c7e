"""Burst decoder (decode_burst) wall-clock on the attached TPU chip.

decode_burst is host-driven (two dispatches + a host-side gate between
them), so per-buffer wall time includes the tunneled runtime's host-sync
latency twice — the honest serving number for arbitrary-gap buffers.
Cache-proofing: a unique per-step scalar (1e-30 * step) is added to the
buffer on device before decoding, so no two dispatches ever see identical
inputs, and every step's detections are fetched to the host (the gate
forces materialization).

Compare against decode_continuous (one host sync per acquisition window).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

N_FRAMES = 64
PAYLOAD = 8192
REPS = 20


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    import ofdm_tpu as ot
    from ofdm_tpu.config import DEFAULT_CONFIG as cfg
    from ofdm_tpu.core.transfer import to_device, to_host
    from ofdm_tpu.phy.streaming import decode_burst, decode_continuous

    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    flen = cfg.sync_len + nb * cfg.sym_len

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (N_FRAMES, PAYLOAD), dtype=np.uint8)
    tx = to_host(ot.encode(data, guard_bands=True, modulation=mod))
    gaps = rng.integers(200, 3000, N_FRAMES)
    parts = []
    for i in range(N_FRAMES):
        parts.append(np.zeros(gaps[i], np.complex64))
        parts.append(tx[i])
    stream = np.concatenate(parts)
    buf = to_device(stream)
    n_samples = buf.shape[-1]

    perturb = jax.jit(lambda s, e: s + e)

    for name, fn, reps in [
        ("burst", lambda b: decode_burst(
            b, payload_len=PAYLOAD, modulation=mod), REPS),
        ("scan_loop", lambda b: list(decode_continuous(
            b, payload_len=PAYLOAD, modulation=mod)), max(3, REPS // 5)),
    ]:
        results = fn(buf)  # warm/compile
        n_found = len(results)
        errs = sum(int(np.count_nonzero(np.asarray(p) != data[i]))
                   for i, (_, p, _) in enumerate(results))
        t0 = time.perf_counter()
        for i in range(reps):
            b = perturb(buf, jnp.complex64(1e-30 * (i + 1)))
            fn(b)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "metric": f"samples/s/chip (64QAM burst decode, {name})",
            "value": n_samples / dt,
            "unit": "samples/s",
            "vs_baseline": (n_samples / dt) / (10e9 / 16),
            "detail": {"n_frames_found": n_found, "expected": N_FRAMES,
                       "byte_errors": errs, "buffer_samples": int(n_samples),
                       "seconds_per_buffer": dt,
                       "backend": jax.default_backend()},
        }))


if __name__ == "__main__":
    main()
