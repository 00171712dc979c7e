"""TPU stage profile of the fused chain kernel: where do the 7 us/program go?

Runs decode_chain with progressive cut points (sync_only -> no_dft ->
no_tail -> no_atan2 -> no_pack -> full) under chained timing; stage cost =
delta between consecutive variants.

Run nohup'd:  setsid nohup python3 tools/exp_chain_stages.py > /tmp/exp_chain_stages.log 2>&1 &
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
from ofdm_tpu import constants
from ofdm_tpu.config import DEFAULT_CONFIG as cfg
from ofdm_tpu.kernels.chain_pallas import decode_chain

BATCH = 256
PAYLOAD = 8192
REPS = 50


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    frame = (cfg.n_sync_chunks + nb) * cfg.sym_len + 80
    rng = np.random.default_rng(0)
    d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
    tx = ot.encode(d, guard_bands=True, modulation=mod)
    rxs = []
    for i in range(2):
        rx = ot.channel(tx, snr=45.0, timing_error=(i > 0),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame - rx.shape[-1]))))
        rxs.append(jax.block_until_ready(rx))
    tpl = constants.locking_for(cfg).astype(np.complex64)
    n_samples = rxs[0].shape[0] * rxs[0].shape[1]

    def mk(profile):
        @jax.jit
        def step(s, carry):
            out = decode_chain(s, tpl, n_blocks=nb, modulation=mod,
                               guard_bands=True, profile=profile)
            return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9, out
        return step

    stages = ["sync_only", "no_dft", "no_tail", "no_atan2", "no_pack", "full"]
    steps = {}
    for st in stages:
        t0 = time.perf_counter()
        fn = mk(st)
        _, out = fn(rxs[0], jnp.float32(0.0))
        out = np.asarray(jax.device_get(out))
        msg = f"{st}: compiled in {time.perf_counter()-t0:.1f}s"
        if st == "full":
            msg += f"; byte errs={int(np.count_nonzero(out[:, 16:16+PAYLOAD] != d))}"
        log(msg)
        steps[st] = fn

    def measure(step, reps=REPS):
        carry = jnp.float32(0.0)
        carry, _ = step(rxs[0], carry)
        float(carry)
        t0 = time.perf_counter()
        for i in range(reps):
            carry, _ = step(rxs[i % 2], carry)
        float(carry)
        return (time.perf_counter() - t0) / reps

    for rnd in range(3):
        prev = None
        for st in stages:
            dt = measure(steps[st])
            delta = "" if prev is None else f"  (+{(dt-prev)*1e3:6.3f} ms)"
            log(f"round {rnd} {st:10s}: {dt*1e3:7.3f} ms/step{delta}")
            prev = dt
    log("done")


if __name__ == "__main__":
    main()
