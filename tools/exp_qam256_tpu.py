"""QAM256 decode throughput on the attached chip (VERDICT round-1 weak #8).

QAM256 + the block interleaver were CPU-tested extras with no TPU numbers.
Measures the full batched receive chain at the headline shape but with
QAM256 (8 bits/carrier: 48 payload bytes per 80-sample symbol), chained
cache-proof methodology, SNR 55 (QAM256's decision cells need the margin),
plus the host interleave/deinterleave throughput for context.

Run nohup'd:
  setsid nohup python3 tools/exp_qam256_tpu.py > /tmp/exp_qam256.log 2>&1 &
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
REPS = 50


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM256
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    frame = 880 + nb * 80

    rng = np.random.default_rng(0)
    datas, rxs = [], []
    for i in range(2):
        d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=mod)
        rx = ot.channel(tx, snr=55.0, timing_error=(i > 0),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame - rx.shape[-1]))))
        datas.append(d)
        rxs.append(jax.block_until_ready(rx))
    n_samples = rxs[0].shape[0] * rxs[0].shape[1]

    @jax.jit
    def step(s, carry):
        out = ot.decode_frame(s, n_blocks=nb, guard_bands=True, modulation=mod)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    out0 = np.asarray(ot.decode_frame(rxs[0], n_blocks=nb, guard_bands=True,
                                      modulation=mod))
    errs = int(np.count_nonzero(out0[:, 16:16 + PAYLOAD] != datas[0]))
    log(f"correctness (no-CFO batch, SNR 55): byte errors = {errs}")

    carry = step(rxs[0], jnp.float32(0.0))
    float(carry)
    t0 = time.perf_counter()
    for i in range(REPS):
        carry = step(rxs[i % 2], carry)
    float(carry)
    dt = (time.perf_counter() - t0) / REPS
    log(f"QAM256 decode: {dt * 1e3:.2f} ms/step = {n_samples / dt / 1e9:.2f} "
        f"GS/s = {n_samples / dt / 80 * 48 / 1e9:.2f} GB/s payload")

    # host interleaver throughput (numpy transpose copies)
    from ofdm_tpu.fec.interleave import deinterleave, interleave
    buf = rng.integers(0, 256, 1 << 24, dtype=np.uint8)     # 16 MB
    t0 = time.perf_counter()
    for _ in range(5):
        il = interleave(buf, 255)
    t_i = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        de = deinterleave(il, 255, buf.size)
    t_d = (time.perf_counter() - t0) / 5
    assert np.array_equal(de, buf)
    log(f"interleave depth=255: {buf.size / t_i / 1e9:.2f} GB/s; "
        f"deinterleave: {buf.size / t_d / 1e9:.2f} GB/s (host numpy)")
    log("done")


if __name__ == "__main__":
    main()
