"""Characterize the chip's DEGRADED phase: constant per-dispatch overhead
or proportional slowdown?

The round-3 derot A/B runs landed in a degraded phase and the absolute
numbers fit a constant-overhead model suspiciously well (measured ms ~=
healthy ms + ~3.1).  This probe times, interleaved in one process under the
chained methodology:

  T  trivial chained step (one scalar add)           healthy: ~0.0x ms
  S  headline chain, batch 256                       healthy: ~0.9 ms
  H  headline chain, batch 128                       healthy: ~0.5 ms

If degraded dispatch adds a CONSTANT c per step, then T ~= c,
S - T ~= healthy S, H - T ~= healthy H — and degraded-phase A/B *deltas*
are trustworthy.  If the phase scales compute/bandwidth, T stays tiny and
S/H inflate proportionally.

  setsid nohup python3 tools/exp_degraded.py > /tmp/exp_degraded.log 2>&1 &
"""

import json
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

ROUNDS = 16


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    log("backend:", jax.default_backend())
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
    def trivial(carry):
        return carry * 1.0000001 + 1.0

    def make_chain(b):
        @jax.jit
        def step(s, carry):
            aligned = sync_align(s[:b], tpl, frame)
            out, _ = decode_aligned(aligned, n_chunks=n_chunks,
                                    guard_bands=True, modulation=mod,
                                    cfo_estimator="coherent")
            return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9
        return step

    s256 = make_chain(256)
    s128 = make_chain(128)
    variants = {
        "T_trivial": lambda c: trivial(c),
        "S_b256": lambda c: s256(rx, c),
        "H_b128": lambda c: s128(rx, c),
    }
    carries = {k: jnp.float32(0.0) for k in variants}
    for k, f in variants.items():
        carries[k] = f(carries[k])
        float(carries[k])
        log("warmed", k)
    times = {k: 0.0 for k in variants}
    for r in range(ROUNDS):
        for k, f in variants.items():
            t0 = time.perf_counter()
            for _ in range(8):
                carries[k] = f(carries[k])
            float(carries[k])
            times[k] += time.perf_counter() - t0
    res = {k: times[k] / (ROUNDS * 8) * 1e3 for k in variants}
    for k, v in res.items():
        log(f"{k:10s} {v:.3f} ms/step")
    res["S_minus_T"] = res["S_b256"] - res["T_trivial"]
    res["H_minus_T"] = res["H_b128"] - res["T_trivial"]
    log(f"S-T = {res['S_minus_T']:.3f} ms (healthy headline ~0.9); "
        f"H-T = {res['H_minus_T']:.3f} ms")
    print("\nRESULTS " + json.dumps(res))
    log("DONE")


if __name__ == "__main__":
    main()
