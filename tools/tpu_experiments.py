"""TPU experiment harness: parity checks + kernel timing on the real chip.

Run directly (nohup'd) on the TPU:  python3 tools/tpu_experiments.py
Uses the persistent compilation cache so reruns are cheap.
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


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def timeit(f, *args, reps=10):
    out = jax.block_until_ready(f(*args))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    log("backend:", jax.default_backend())

    # ---- 1. host decode parity path on TPU
    msg = (b"My name is Ozymandias, King of Kings! " * 11)[:400]
    tx = ot.encode(msg, guard_bands=True, modulation=ot.Modulation.QPSK)
    rx = ot.channel(tx, snr=30.0, timing_error=True, key=jax.random.key(2))
    out = ot.decode(rx, guard_bands=True, modulation=ot.Modulation.QPSK)
    a = ot.Analysis.new(np.frombuffer(msg, np.uint8), out)
    log("host decode parity:", a)

    # ---- 2. bench shapes
    payload_len, batch = 8192, 64
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(payload_len, mod, True)
    frame = 880 + nb * 80
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (batch, payload_len), dtype=np.uint8)
    txb = ot.encode(data, guard_bands=True, modulation=mod)
    rxb = ot.channel(txb, snr=45.0, timing_error=True, key=jax.random.key(0))
    rxb = jnp.pad(rxb, ((0, 0), (0, max(0, frame - rxb.shape[-1]))))
    rxb = jax.block_until_ready(rxb)
    n_samples = rxb.shape[0] * rxb.shape[1]
    log("bench input:", rxb.shape, f"{n_samples/1e6:.2f} Msamples")

    # full decode, f32 sync
    f32 = jax.jit(lambda s: ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                                            modulation=mod))
    dt, outb = timeit(f32, rxb)
    errs = int(np.count_nonzero(np.asarray(outb)[:, 16:16 + payload_len] != data))
    log(f"decode f32-sync: {dt*1e3:.2f} ms -> {n_samples/dt/1e6:.0f} MS/s, errs={errs}")

    # full decode, bf16 sync
    bf16 = jax.jit(lambda s: ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                                             modulation=mod,
                                             sync_dtype=jnp.bfloat16))
    dt_b, outb = timeit(bf16, rxb)
    errs_b = int(np.count_nonzero(np.asarray(outb)[:, 16:16 + payload_len] != data))
    log(f"decode bf16-sync: {dt_b*1e3:.2f} ms -> {n_samples/dt_b/1e6:.0f} MS/s, errs={errs_b}")

    # sync only (f32) to see the stage split
    sync_only = jax.jit(lambda s: ot.sync_offset(s))
    dt_s, _ = timeit(sync_only, rxb)
    log(f"sync-only f32: {dt_s*1e3:.2f} ms")
    sync_bf = jax.jit(lambda s: ot.sync_offset(s, compute_dtype=jnp.bfloat16))
    dt_sb, _ = timeit(sync_bf, rxb)
    log(f"sync-only bf16: {dt_sb*1e3:.2f} ms")

    # demod-only (skip sync): fixed offset decode
    from ofdm_tpu.phy.rx import decode_aligned
    aligned = jax.block_until_ready(rxb[:, 8:8 + (10 + nb) * 80])
    demod_only = jax.jit(lambda s: decode_aligned(
        s, n_chunks=10 + nb, guard_bands=True, modulation=mod)[0])
    dt_d, _ = timeit(demod_only, aligned)
    log(f"aligned-decode only: {dt_d*1e3:.2f} ms")

    ref_offs = np.asarray(sync_only(rxb))

    # ---- 3. FFT overlap-save sync
    try:
        sync_fft = jax.jit(lambda s: ot.sync_offset(s, compute_dtype="fft"))
        dt_f, offs = timeit(sync_fft, rxb)
        match = np.array_equal(np.asarray(offs), ref_offs)
        log(f"sync-only fft: {dt_f*1e3:.2f} ms, matches: {match}")
    except Exception as e:
        log("fft sync FAILED:", repr(e)[:300])

    # ---- 5. aligned-decode stage split
    from ofdm_tpu.ops.fft import dft_matmul
    blocks = jax.block_until_ready(
        jnp.ones((batch, nb, 64), jnp.complex64))
    dftj = jax.jit(lambda b: dft_matmul(b))
    dt_dft, _ = timeit(dftj, blocks)
    log(f"dft matmul [B,nb,64]: {dt_dft*1e3:.2f} ms")

    log("DONE")


if __name__ == "__main__":
    main()
