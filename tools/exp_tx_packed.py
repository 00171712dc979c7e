"""TPU experiment: tx-side packed sparse-spectrum IFFT vs scatter + full IFFT.

Chained cache-proof methodology (bench.py): carry mixes into the payload
bytes (uint8 add, wraps) so every dispatch is unique and dependency-linked.

Run nohup'd:  setsid nohup python3 tools/exp_tx_packed.py > /tmp/exp_tx_packed.log 2>&1 &
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
from ofdm_tpu.phy.tx import encode_payload

BATCH = 256
PAYLOAD = 8192
STEPS = 64


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def run(name, payloads, mod, pack):
    @jax.jit
    def step(p, carry):
        p = p.at[:, -1].add(carry.astype(jnp.uint8))
        tx = encode_payload(p, guard_bands=True, modulation=mod,
                            pack_spectrum=pack)
        chk = jnp.max(jnp.real(tx)).astype(jnp.float32)
        return carry + 1.0 + chk * 1e-9

    carry = step(payloads[0], jnp.float32(0.0))
    float(carry)
    t0 = time.perf_counter()
    for i in range(STEPS):
        carry = step(payloads[i % 4], carry)
    float(carry)
    dt = (time.perf_counter() - t0) / STEPS
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    n_samples = BATCH * (880 + nb * 80)
    log(f"{name:22s}: {dt*1e3:6.2f} ms  {n_samples/dt/1e6:6.0f} MS/s generated")


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    rng = np.random.default_rng(0)
    payloads = [jnp.asarray(rng.integers(0, 256, (BATCH, PAYLOAD + 16),
                                         dtype=np.uint8)) for _ in range(4)]
    payloads = [jax.block_until_ready(p) for p in payloads]
    run("tx full-IFFT", payloads, mod, False)
    run("tx packed 48-bin", payloads, mod, True)
    log("DONE")


if __name__ == "__main__":
    main()
