"""TPU experiment: full decode_frame with align_impl pallas vs xla.

Byte-equality gated (both vs transmitted bytes AND vs each other), chained
cache-proof timing at the headline shape.

Run nohup'd: setsid nohup python3 tools/exp_align_e2e.py > /tmp/exp_align_e2e.log 2>&1 &
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

BATCH = 256
PAYLOAD = 8192
STEPS = 100


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    frame = 880 + nb * 80

    rng = np.random.default_rng(0)
    rxs, datas = [], []
    for i in range(4):
        d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=mod)
        rx = ot.channel(tx, snr=45.0, timing_error=(i > 0),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame - rx.shape[-1]))))
        rxs.append(jax.block_until_ready(rx))
        datas.append(d)

    outs = {}
    for impl in ("xla", "pallas"):
        dec = jax.jit(lambda s, impl=impl: ot.decode_frame(
            s, n_blocks=nb, guard_bands=True, modulation=mod,
            align_impl=impl))
        out0 = np.asarray(jax.block_until_ready(dec(rxs[0])))
        errs = int(np.count_nonzero(out0[:, 16:16 + PAYLOAD] != datas[0]))
        outs[impl] = [np.asarray(jax.block_until_ready(dec(r))) for r in rxs]
        log(f"{impl}: clean-batch byte errs={errs}")

        @jax.jit
        def step(s, carry, impl=impl):
            out = ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                                  modulation=mod, align_impl=impl)
            chk = jnp.max(out).astype(jnp.float32)
            return carry + 1.0 + chk * 1e-9

        carry = step(rxs[0], jnp.float32(0.0))
        float(carry)
        t0 = time.perf_counter()
        for i in range(STEPS):
            carry = step(rxs[i % 4], carry)
        float(carry)
        dt = (time.perf_counter() - t0) / STEPS
        n = rxs[0].shape[0] * rxs[0].shape[1]
        log(f"{impl:8s}: {dt*1e3:6.3f} ms  {n/dt/1e6:6.0f} MS/s")

    same = all(np.array_equal(a, b)
               for a, b in zip(outs["xla"], outs["pallas"]))
    log("pallas output byte-identical to xla on all 4 batches:", same)
    log("DONE")


if __name__ == "__main__":
    main()
