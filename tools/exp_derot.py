"""TPU experiment: matrix-folded CFO derotation vs the stream derotate pass.

The round-3 roofline (docs/BENCHMARKS.md) put the full-stream elementwise
CFO derotate at ~0.43 ms of the 0.635 ms aligned decode — the largest
remaining HBM tranche.  derot_impl="matrix" folds the within-symbol phasor
into a per-row DFT matrix (ops/fft.py dft_matmul_select_derot): the sample
stream is then read exactly once (by the batched DFT matmul), the per-chunk
phase rides the small bin tensor, and only the 5 training chunks are
derotated elementwise.

Interleaved single-process A/B (chip drift makes cross-process comparison
meaningless), chained cache-proof methodology:

  A  full chain, derot=stream   (round-3 production)
  B  full chain, derot=matrix
  C  aligned decode only, derot=stream
  D  aligned decode only, derot=matrix

Byte equality of A vs B is asserted on the clean batch before timing.

Run nohup'd:
  setsid nohup python3 tools/exp_derot.py > /tmp/exp_derot.log 2>&1 &
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
# degraded-phase runs need many more rounds to average the noisy dispatch
# overhead out (docs/BENCHMARKS.md "Degraded-phase characterization")
ROUNDS = int(os.environ.get("DEROT_ROUNDS", 24))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    n_chunks = cfg.n_sync_chunks + nb
    frame = n_chunks * cfg.sym_len

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
    tpl = constants.locking_for(cfg).astype(np.complex64)

    def make_full(derot):
        def step(s, carry):
            aligned = sync_align(s, tpl, frame)
            out, _ = decode_aligned(aligned, n_chunks=n_chunks,
                                    guard_bands=True, modulation=mod,
                                    cfo_estimator="coherent",
                                    derot_impl=derot)
            return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9
        return jax.jit(step)

    def make_aligned(derot):
        def step(s, carry):
            out, _ = decode_aligned(s[..., :frame], n_chunks=n_chunks,
                                    guard_bands=True, modulation=mod,
                                    cfo_estimator="coherent",
                                    derot_impl=derot)
            return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9
        return jax.jit(step)

    variants = {
        "A_full_stream": make_full("stream"),
        "B_full_matrix": make_full("matrix"),
        "C_aligned_stream": make_aligned("stream"),
        "D_aligned_matrix": make_aligned("matrix"),
    }

    # byte equality on the clean batch
    al = jax.jit(lambda s: sync_align(s, tpl, frame))(rxs[0])
    outs = {}
    for derot in ("stream", "matrix"):
        o, _ = decode_aligned(al, n_chunks=n_chunks, guard_bands=True,
                              modulation=mod, cfo_estimator="coherent",
                              derot_impl=derot)
        outs[derot] = np.asarray(o)
        errs = int(np.count_nonzero(
            outs[derot][:, 16:16 + PAYLOAD] != datas[0]))
        log(f"derot={derot}: {errs} byte errors on the clean batch")
        assert errs == 0
    mism = int(np.count_nonzero(outs["stream"] != outs["matrix"]))
    log(f"stream-vs-matrix byte mismatches (full buffers): {mism}")
    assert mism == 0

    carries = {k: jnp.float32(0.0) for k in variants}
    for k, stp in variants.items():
        carries[k] = stp(rxs[0], carries[k])
        float(carries[k])
        log("warmed", k)
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
        log(f"{k:20s} {dt*1e3:.3f} ms = {n_samples/dt/1e9:.2f} GS/s")
    res["full_speedup"] = res["A_full_stream"]["ms"] / res["B_full_matrix"]["ms"]
    res["aligned_speedup"] = (res["C_aligned_stream"]["ms"]
                              / res["D_aligned_matrix"]["ms"])
    log(f"full chain matrix/stream speedup: {res['full_speedup']:.3f}x; "
        f"aligned-only: {res['aligned_speedup']:.3f}x")
    print("\nRESULTS " + json.dumps(res))
    log("DONE")


if __name__ == "__main__":
    main()
