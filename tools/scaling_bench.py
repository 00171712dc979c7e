"""Scaling-efficiency harness: pipeline throughput vs mesh size.

Measures the full sharded pipeline step (encode -> channel -> sync w/ halo
exchange -> decode -> psum'd BER) on 1..N devices with the per-device batch
held constant (weak scaling).  On real multi-chip hardware this produces the
north star's scaling-efficiency numbers; on a single host it runs over the
fake CPU device mesh to validate the methodology and the collectives
(`XLA_FLAGS=--xla_force_host_platform_device_count=8 python tools/scaling_bench.py`).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench_mesh(n_devices: int, per_device_batch: int = 8,
               payload_len: int = 512, reps: int = 20):
    import ofdm_tpu as ot
    from ofdm_tpu.parallel.mesh import make_mesh
    from ofdm_tpu.parallel.pipeline import make_pipeline_step

    n_time = 2 if n_devices % 2 == 0 else 1
    mesh = make_mesh(n_data=n_devices // n_time, n_time=n_time)
    # timing_error off: the random CFO draw can land at the Schmidl-Cox
    # aliasing boundary for some rows (a documented reference-shared failure
    # mode, tests/test_loopback.py) — not what this harness measures.
    step = make_pipeline_step(mesh, payload_len=payload_len, guard_bands=True,
                              modulation=ot.Modulation.QPSK, snr=30.0,
                              timing_error=False)
    batch = per_device_batch * n_devices
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, (batch, payload_len), dtype=np.uint8))
    key = jax.random.key(0)
    decoded, errs = step(data, key)
    jax.block_until_ready(decoded)
    assert int(errs) == 0, f"{int(errs)} bit errors on {n_devices} devices"

    t0 = time.perf_counter()
    for _ in range(reps):
        decoded, errs = step(data, key)
    jax.block_until_ready(decoded)
    dt = (time.perf_counter() - t0) / reps
    frames_per_s = batch / dt
    return {"devices": n_devices, "batch": batch, "sec_per_step": dt,
            "frames_per_s": frames_per_s}


def main():
    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= n_avail]
    results = [bench_mesh(n) for n in sizes]
    base = results[0]["frames_per_s"]
    for r in results:
        r["scaling_efficiency"] = r["frames_per_s"] / (base * r["devices"])
    out = {"platform": jax.default_backend(), "results": results}
    if jax.default_backend() == "cpu":
        out["note"] = ("fake CPU devices share one physical host: efficiency "
                       "numbers here only validate the mechanism; real "
                       "scaling requires a multi-chip TPU slice")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
