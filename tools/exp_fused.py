"""TPU experiment: compile + validate + chained-bench the fused rx kernel.

Run nohup'd:  setsid nohup python3 tools/exp_fused.py > /tmp/exp_fused.log 2>&1 &
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
from ofdm_tpu.kernels.rx_fused import decode_frame_fused

BATCH = 256
PAYLOAD = 8192
STEPS = 48


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def chained(step, rxs, steps=STEPS):
    carry = step(rxs[0], jnp.float32(0.0))
    float(carry)
    t0 = time.perf_counter()
    for i in range(steps):
        carry = step(rxs[i % len(rxs)], carry)
    float(carry)
    return (time.perf_counter() - t0) / steps


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    ncp = -(-nb // 128) * 128
    frame = 880 + ncp * 80            # fused path needs the padded-block frame

    datas, rxs = [], []
    for i in range(4):
        rng = np.random.default_rng(1000 + i)
        d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=mod)
        rx = ot.channel(tx, snr=45.0, timing_error=(i % 2 == 1),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame - rx.shape[-1]))))
        datas.append(d)
        rxs.append(jax.block_until_ready(rx))
    n_samples = BATCH * (880 + nb * 80)  # count the same work as the baseline
    log("inputs ready:", rxs[0].shape)

    t0 = time.time()
    fused = jax.jit(lambda s: decode_frame_fused(
        s, n_blocks=nb, guard_bands=True, modulation=mod))
    out0 = np.asarray(fused(rxs[0]))
    log(f"fused compile+first run: {time.time()-t0:.1f}s, out {out0.shape}")
    errs = int(np.count_nonzero(out0[:, 16:16 + PAYLOAD] != datas[0]))
    log("clean-batch byte errs:", errs)
    ref = np.asarray(jax.jit(lambda s: ot.decode_frame(
        s, n_blocks=nb, guard_bands=True, modulation=mod))(rxs[1]))
    out1 = np.asarray(fused(rxs[1]))
    lim = 16 + PAYLOAD
    log("cfo-batch parity vs decode_frame (header+payload):",
        int(np.count_nonzero(ref[:, :lim] != out1[:, :lim])), "mismatches")

    @jax.jit
    def step_fused(s, carry):
        out = decode_frame_fused(s, n_blocks=nb, guard_bands=True,
                                 modulation=mod)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    dt = chained(step_fused, rxs)
    log(f"CHAINED fused decode:    {dt*1e3:6.2f} ms ({n_samples/dt/1e6:.0f} MS/s)")

    @jax.jit
    def step_base(s, carry):
        out = ot.decode_frame(s, n_blocks=nb, guard_bands=True, modulation=mod)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    dt_b = chained(step_base, rxs)
    log(f"CHAINED baseline decode: {dt_b*1e3:6.2f} ms ({n_samples/dt_b/1e6:.0f} MS/s)")
    log("DONE")


if __name__ == "__main__":
    main()
