"""TPU experiment: chained (cache-proof) batch sweep of the full 64QAM decode.

Uses the exact bench.py methodology (max-checksum carry, +1/step) at
batches 128..512 to pick the headline batch size.

Run nohup'd:  setsid nohup python3 tools/exp_batch.py > /tmp/exp_batch.log 2>&1 &
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import ofdm_tpu as ot

PAYLOAD = 8192
STEPS = 48


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    frame = 880 + nb * 80

    for batch in (128, 256, 384, 512):
        rxs = []
        for i in range(4):
            rng = np.random.default_rng(1000 + i)
            d = rng.integers(0, 256, (batch, PAYLOAD), dtype=np.uint8)
            tx = ot.encode(d, guard_bands=True, modulation=mod)
            rx = ot.channel(tx, snr=45.0, timing_error=(i % 2 == 1),
                            key=jax.random.key(i))
            rx = jnp.pad(rx, ((0, 0), (0, max(0, frame - rx.shape[-1]))))
            rxs.append(jax.block_until_ready(rx))
        n_samples = rxs[0].shape[0] * rxs[0].shape[1]

        @jax.jit
        def step(s, carry):
            out = ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                                  modulation=mod)
            chk = jnp.max(out).astype(jnp.float32)
            return carry + 1.0 + chk * 1e-9

        carry = step(rxs[0], jnp.float32(0.0))
        float(carry)
        t0 = time.perf_counter()
        for i in range(STEPS):
            carry = step(rxs[i % 4], carry)
        float(carry)
        dt = (time.perf_counter() - t0) / STEPS
        log(f"batch {batch:4d}: {dt*1e3:6.2f} ms  {n_samples/dt/1e6:6.0f} MS/s")

    log("DONE")


if __name__ == "__main__":
    main()
