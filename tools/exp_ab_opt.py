"""TPU experiment: single-process interleaved A/B of the round-3 chain opts.

Between-process timings on the tunneled chip drift by ~10-15%, so the
round-3 optimizations (real-template half-MAC sync correlation; HIGH
data-DFT precision) are demonstrated here in ONE process with the variants
interleaved A,B,C,D,A,B,C,D,... so drift averages out:

  A  round-2 equivalent: generic complex-form Toeplitz sync + HIGHEST DFT
  B  real-template sync + HIGHEST DFT
  C  real-template sync + HIGH DFT            <- round-3 production default
  D  real-template sync + DEFAULT DFT         (reference point)

The generic sync form is forced by handing sync_align a template with a
denormal imaginary part (numerically identical correlation, ti != 0 so the
real-template fast path does not engage).  Byte equality across variants is
asserted on the clean batch.

Run nohup'd:
  setsid nohup python3 tools/exp_ab_opt.py > /tmp/exp_ab_opt.log 2>&1 &
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

BATCH = 256
PAYLOAD = 8192
ROUNDS = 24


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    n_chunks = cfg.n_sync_chunks + nb
    frame = n_chunks * 80

    rng = np.random.default_rng(0)
    datas, rxs = [], []
    for i in range(4):
        d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=mod)
        rx = ot.channel(tx, snr=45.0, timing_error=(i > 0),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame + 80 - rx.shape[-1]))))
        datas.append(d)
        rxs.append(jax.block_until_ready(rx))
    n_samples = rxs[0].shape[0] * rxs[0].shape[1]

    tpl_real = constants.locking_for(cfg).astype(np.complex64)
    tpl_cplx = tpl_real + np.complex64(1e-40j)      # forces the generic form

    def make_step(tpl, prec):
        def step(s, carry):
            aligned = sync_align(s, tpl, frame)
            out, _ = decode_aligned(aligned, n_chunks=n_chunks,
                                    guard_bands=True, modulation=mod,
                                    cfo_estimator="coherent",
                                    dft_precision=prec)
            return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9
        return jax.jit(step)

    P = jax.lax.Precision
    variants = {
        "A_r2_complexsync_highest": make_step(tpl_cplx, P.HIGHEST),
        "B_realsync_highest": make_step(tpl_real, P.HIGHEST),
        "C_realsync_high": make_step(tpl_real, P.HIGH),
        "D_realsync_default": make_step(tpl_real, P.DEFAULT),
    }

    # byte equality across variants on the clean batch
    outs = {}
    for name, (tpl, prec) in [("A", (tpl_cplx, P.HIGHEST)),
                              ("B", (tpl_real, P.HIGHEST)),
                              ("C", (tpl_real, P.HIGH)),
                              ("D", (tpl_real, P.DEFAULT))]:
        al = jax.jit(lambda s, tpl=tpl: sync_align(s, tpl, frame))(rxs[0])
        o, _ = decode_aligned(al, n_chunks=n_chunks, guard_bands=True,
                              modulation=mod, cfo_estimator="coherent",
                              dft_precision=prec)
        outs[name] = np.asarray(o)[:, 16:16 + PAYLOAD]
        errs = int(np.count_nonzero(outs[name] != datas[0]))
        log(f"variant {name}: {errs} byte errors on the clean batch")
        assert errs == 0

    # warm all variants, then interleave
    carries = {k: jnp.float32(0.0) for k in variants}
    for k, stp in variants.items():
        carries[k] = stp(rxs[0], carries[k])
        float(carries[k])
    times = {k: 0.0 for k in variants}
    for r in range(ROUNDS):
        for k, stp in variants.items():
            t0 = time.perf_counter()
            for i in range(8):
                carries[k] = stp(rxs[(r * 8 + i) % 4], carries[k])
            float(carries[k])
            times[k] += time.perf_counter() - t0
    res = {}
    for k in variants:
        dt = times[k] / (ROUNDS * 8)
        res[k] = {"ms": dt * 1e3, "gss": n_samples / dt / 1e9}
        log(f"{k:26s} {dt*1e3:.3f} ms = {n_samples/dt/1e9:.2f} GS/s")
    res["speedup_C_over_A"] = res["A_r2_complexsync_highest"]["ms"] / \
        res["C_realsync_high"]["ms"]
    log(f"round-3 production (C) vs round-2 equivalent (A): "
        f"{res['speedup_C_over_A']:.3f}x")
    print("\nRESULTS " + json.dumps(res))
    log("DONE")


if __name__ == "__main__":
    main()
