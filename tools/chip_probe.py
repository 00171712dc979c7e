"""Quick chip-phase probe: time N chained headline steps, print one line.

The attached chip occasionally enters a DEGRADED phase (3-4x slower for many
minutes — docs/BENCHMARKS.md "Cross-process caveat").  This probe runs the
production headline step (fused sync_align + aligned decode, batch 256)
under the chained methodology and prints ms/step so A/B experiments can be
gated on a healthy phase.  Normal phase: ~0.9 ms.  Degraded: >= 3 ms.

  python3 tools/chip_probe.py        # ~40 s incl. warmup (compile-cached)
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
from ofdm_tpu.kernels.align_pallas import sync_align
from ofdm_tpu.phy.rx import decode_aligned


def main():
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(8192, mod, True)
    n_chunks = cfg.n_sync_chunks + nb
    frame = n_chunks * cfg.sym_len
    rng = np.random.default_rng(0)
    d = rng.integers(0, 256, (256, 8192), dtype=np.uint8)
    tx = ot.encode(d, guard_bands=True, modulation=mod)
    rx = ot.channel(tx, snr=45.0, key=jax.random.key(0))
    rx = jnp.pad(rx, ((0, 0), (0, max(0, frame + 80 - rx.shape[-1]))))
    rx = jax.block_until_ready(rx)
    tpl = constants.locking_for(cfg).astype(np.complex64)

    @jax.jit
    def step(s, carry):
        aligned = sync_align(s, tpl, frame)
        out, _ = decode_aligned(aligned, n_chunks=n_chunks, guard_bands=True,
                                modulation=mod, cfo_estimator="coherent",
                                derot_impl="auto")
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    carry = jnp.float32(0.0)
    carry = step(rx, carry)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(16):
        carry = step(rx, carry)
    float(carry)
    dt = (time.perf_counter() - t0) / 16
    phase = "NORMAL" if dt < 1.6e-3 else "DEGRADED"
    print(f"PROBE {dt*1e3:.3f} ms/step  {phase}", flush=True)


if __name__ == "__main__":
    main()
