"""TPU experiment: fused Pallas post-DFT demod tail vs the XLA tail.

Gates: byte equality of decode_frame(demod_impl="pallas") vs "xla" on clean
and CFO batches at the headline shape; chained cache-proof timing of both.

Run nohup'd: setsid nohup python3 tools/exp_demod_tail.py > /tmp/exp_demod.log 2>&1 &
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

BATCH = 256
PAYLOAD = 8192
STEPS = 100


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import ofdm_tpu as ot

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

    def make(demod):
        @jax.jit
        def dec(s):
            return ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                                   modulation=mod, demod_impl=demod)
        return dec

    dec_xla = make("xla")
    dec_pal = make("pallas")

    for i, (rx, d) in enumerate(zip(rxs, datas)):
        ox = np.asarray(jax.block_until_ready(dec_xla(rx)))
        op = np.asarray(jax.block_until_ready(dec_pal(rx)))
        rows_diff = int(np.count_nonzero(np.any(ox != op, axis=-1)))
        bytes_diff = int(np.count_nonzero(ox != op))
        ex = int(np.count_nonzero(np.any(ox[:, 16:16 + PAYLOAD] != d, axis=-1)))
        ep = int(np.count_nonzero(np.any(op[:, 16:16 + PAYLOAD] != d, axis=-1)))
        log(f"batch {i} (cfo={i > 0}): rows differing={rows_diff} "
            f"bytes differing={bytes_diff}  bad-rows xla={ex} pallas={ep}")

    for name, dec in (("xla", dec_xla), ("pallas", dec_pal)):
        @jax.jit
        def step(s, carry, dec=dec):
            out = dec(s)
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
        log(f"{name:6s}: {dt*1e3:6.3f} ms  {n/dt/1e6:6.0f} MS/s")
    log("DONE")


if __name__ == "__main__":
    main()
