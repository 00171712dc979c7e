"""TPU experiment: sync precision variants + batch sweep at the bench shape.

Goal: find the fastest *correct* configuration of the full 64QAM receive
chain at the headline shape (8 KB payload).  Variants:

  A. f32 matmul sync (current bench default)
  B. bf16 matmul sync (MXU native width; argmax peak is bf16-tolerant)
  C. bf16 sync + DEFAULT-precision data DFT
  D. batch sweep under the winner

Correctness gate: the clean (no-CFO) batch must decode byte-exact.

Run nohup'd:  setsid nohup python3 tools/exp_sync_variants.py > /tmp/exp_sync.log 2>&1 &
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


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def make_inputs(batch, payload_len, mod, n_inputs=4):
    nb = ot.n_data_blocks(payload_len, mod, True)
    frame = 880 + nb * 80
    rng = np.random.default_rng(0)
    datas, rxs = [], []
    for i in range(n_inputs):
        d = rng.integers(0, 256, (batch, payload_len), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=mod)
        rx = ot.channel(tx, snr=45.0, timing_error=(i > 0), key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame - rx.shape[-1]))))
        datas.append(d)
        rxs.append(jax.block_until_ready(rx))
    return nb, datas, rxs


def bench(decode, rxs, datas, payload_len, reps=100):
    out0 = jax.block_until_ready(decode(rxs[0]))
    errs = int(np.count_nonzero(
        np.asarray(out0)[:, 16:16 + payload_len] != datas[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        out = decode(rxs[i % len(rxs)])
        if i % 25 == 24:
            jax.block_until_ready(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    n = rxs[0].shape[0] * rxs[0].shape[1]
    return dt, n / dt, errs


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    payload = 8192

    nb, datas, rxs = make_inputs(256, payload, mod)
    log("inputs ready:", rxs[0].shape)

    variants = {
        "A f32 sync / HIGHEST dft": dict(),
        "B bf16 sync / HIGHEST dft": dict(sync_dtype=jnp.bfloat16),
        "C bf16 sync / DEFAULT dft": dict(sync_dtype=jnp.bfloat16,
                                          dft_precision=jax.lax.Precision.DEFAULT),
    }
    results = {}
    for name, kw in variants.items():
        dec = jax.jit(lambda s, kw=kw: ot.decode_frame(
            s, n_blocks=nb, guard_bands=True, modulation=mod, **kw))
        dt, sps, errs = bench(dec, rxs, datas, payload)
        results[name] = (dt, sps, errs)
        log(f"{name}: {dt*1e3:.2f} ms, {sps/1e6:.0f} MS/s, clean-batch byte errs={errs}")

    # offsets identical bf16 vs f32?
    s_f32 = jax.jit(lambda s: ot.sync_offset(s))
    s_bf = jax.jit(lambda s: ot.sync_offset(s, compute_dtype=jnp.bfloat16))
    for i, rx in enumerate(rxs):
        a = np.asarray(s_f32(rx))
        b = np.asarray(s_bf(rx))
        log(f"offsets batch {i}: bf16==f32: {np.array_equal(a, b)}"
            f" (mismatch {int(np.count_nonzero(a != b))}/{a.size})")

    # batch sweep under the best correct variant
    best = min((v for v in results.items() if v[1][2] == 0),
               key=lambda v: v[1][0])
    log("winner:", best[0])
    kw = variants[best[0]]
    for batch in (128, 192, 256, 320, 384, 512):
        nb2, d2, r2 = make_inputs(batch, payload, mod, n_inputs=2)
        dec = jax.jit(lambda s, kw=kw: ot.decode_frame(
            s, n_blocks=nb2, guard_bands=True, modulation=mod, **kw))
        dt, sps, errs = bench(dec, r2, d2, payload, reps=50)
        log(f"batch {batch}: {dt*1e3:.2f} ms, {sps/1e6:.0f} MS/s, errs={errs}")

    log("DONE")


if __name__ == "__main__":
    main()
