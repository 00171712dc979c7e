"""A/B: planar f32 handoff (round 4) vs the round-3 complex64 route.

A = round-3 production route: sync_align -> complex64 aligned stream ->
    decode_aligned(derot_impl="matrix") (the complex round-trip).
B = round-4 production route: sync_align(planar=True) ->
    decode_planar_matrix (no complex64 aligned intermediate) — what
    decode_frame's defaults now lower to on TPU.

Chained cache-proof methodology (CLAUDE.md); byte-equality gates both.
Run nohup'd:  setsid nohup python3 tools/exp_planar.py > /tmp/exp_planar.log 2>&1 &
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
from ofdm_tpu.phy.rx import decode_aligned, decode_planar_matrix

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
    rxs = []
    for i in range(3):
        rx = ot.channel(tx, snr=45.0, timing_error=(i > 0),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame + 80 - rx.shape[-1]))))
        rxs.append(jax.block_until_ready(rx))
    tpl = constants.locking_for(cfg).astype(np.complex64)
    n_samples = rxs[0].shape[0] * rxs[0].shape[1]

    @jax.jit
    def step_complex(s, carry):
        aligned = sync_align(s, tpl, frame)
        out, _ = decode_aligned(aligned, n_chunks=n_chunks, guard_bands=True,
                                modulation=mod, cfo_estimator="coherent",
                                derot_impl="matrix")
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9, out

    @jax.jit
    def step_planar(s, carry):
        planes = sync_align(s, tpl, frame, planar=True)
        out, _ = decode_planar_matrix(planes, n_chunks=n_chunks,
                                      guard_bands=True, modulation=mod,
                                      cfo_estimator="coherent")
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9, out

    @jax.jit
    def step_frame(s, carry):
        out = ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                              modulation=mod)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9, out

    # correctness gates first (also compiles)
    outs = {}
    for name, step in (("complex", step_complex), ("planar", step_planar),
                       ("frame_default", step_frame)):
        t0 = time.perf_counter()
        _, out = step(rxs[0], jnp.float32(0.0))
        out = np.asarray(jax.device_get(out))
        log(f"{name}: compiled in {time.perf_counter()-t0:.1f}s; "
            f"byte errs={int(np.count_nonzero(out[:, 16:16+PAYLOAD] != d))}")
        outs[name] = out
    assert np.array_equal(outs["planar"], outs["frame_default"]), \
        "decode_frame default does not match the explicit planar route"

    def measure(step, reps=REPS):
        carry = jnp.float32(0.0)
        carry, _ = step(rxs[0], carry)
        float(carry)
        t0 = time.perf_counter()
        for i in range(reps):
            carry, _ = step(rxs[i % len(rxs)], carry)
        float(carry)
        return (time.perf_counter() - t0) / reps

    for rnd in range(3):
        for name, step in (("complex", step_complex),
                           ("planar", step_planar),
                           ("frame_default", step_frame)):
            dt = measure(step)
            log(f"round {rnd} {name:14s}: {dt*1e3:7.3f} ms/step = "
                f"{n_samples/dt/1e9:.2f} GS/s")
    log("done")


if __name__ == "__main__":
    main()
