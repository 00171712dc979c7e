"""TPU A/B: fused full-chain kernel (chain_pallas) vs the production XLA
route, headline shape (batch 256, QAM64, 8192-byte payloads).

Gates: byte-exact payload on the clean batch for every variant.  Chained
cache-proof timing (CLAUDE.md).  Also times the planar-input variant (the
serving-honest interface: capture IS planar fc32; to_device uploads planes).

Run nohup'd:  setsid nohup python3 tools/exp_chain.py > /tmp/exp_chain.log 2>&1 &
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
REPS = 60


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    n_chunks = cfg.n_sync_chunks + nb
    frame = n_chunks * cfg.sym_len
    rng = np.random.default_rng(0)
    d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
    tx = ot.encode(d, guard_bands=True, modulation=mod)
    rxs, planar = [], []
    for i in range(3):
        rx = ot.channel(tx, snr=45.0, timing_error=(i > 0),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame + 80 - rx.shape[-1]))))
        rxs.append(jax.block_until_ready(rx))
        planar.append(jax.block_until_ready(
            jax.jit(lambda s: jnp.stack([jnp.real(s), jnp.imag(s)], axis=1))(rx)))
    tpl = constants.locking_for(cfg).astype(np.complex64)
    n_samples = rxs[0].shape[0] * rxs[0].shape[1]

    @jax.jit
    def step_chain(s, carry):
        out = decode_chain(s, tpl, n_blocks=nb, modulation=mod,
                           guard_bands=True)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9, out

    @jax.jit
    def step_chain_planar(s, carry):
        out = decode_chain(s, tpl, n_blocks=nb, modulation=mod,
                           guard_bands=True)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9, out

    @jax.jit
    def step_frame(s, carry):
        out = ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                              modulation=mod)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9, out

    variants = [("xla_frame", step_frame, rxs),
                ("chain", step_chain, rxs),
                ("chain_planar", step_chain_planar, planar)]
    for name, step, ins in variants:
        t0 = time.perf_counter()
        _, out = step(ins[0], jnp.float32(0.0))
        out = np.asarray(jax.device_get(out))
        errs = int(np.count_nonzero(out[:, 16:16 + PAYLOAD] != d))
        log(f"{name}: compiled in {time.perf_counter()-t0:.1f}s; "
            f"byte errs={errs}")
        assert errs == 0, f"{name} byte errors"

    def measure(step, ins, reps=REPS):
        carry = jnp.float32(0.0)
        carry, _ = step(ins[0], carry)
        float(carry)
        t0 = time.perf_counter()
        for i in range(reps):
            carry, _ = step(ins[i % len(ins)], carry)
        float(carry)
        return (time.perf_counter() - t0) / reps

    for rnd in range(3):
        for name, step, ins in variants:
            dt = measure(step, ins)
            log(f"round {rnd} {name:14s}: {dt*1e3:7.3f} ms/step = "
                f"{n_samples/dt/1e9:.2f} GS/s")
    log("done")


if __name__ == "__main__":
    main()
