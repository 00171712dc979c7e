"""TPU experiment: stage-level timing of the batched 64QAM receive chain.

The tunneled runtime can serve repeated (executable, args) dispatches from a
cache, wildly overreporting throughput; step 0 sweeps the number of distinct
rotating inputs until the per-step time stabilizes, then all stage timings
use that input count.

Run nohup'd:  setsid nohup python3 tools/exp_stage_split.py > /tmp/exp_stage.log 2>&1 &
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
from ofdm_tpu.core.bitops import bits_to_bytes
from ofdm_tpu.ops.fft import fft
from ofdm_tpu.phy.modulation import demodulate_symbols
from ofdm_tpu.phy.rx import decode_aligned

BATCH = 256
PAYLOAD = 8192


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def timeit(f, inputs, reps=64):
    out = jax.block_until_ready(f(inputs[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        out = f(inputs[i % len(inputs)])
        if i % 16 == 15:
            jax.block_until_ready(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    n_chunks = cfg.n_sync_chunks + nb
    frame = n_chunks * 80

    def make(i, b=BATCH):
        rng = np.random.default_rng(1000 + i)
        d = rng.integers(0, 256, (b, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=mod)
        rx = ot.channel(tx, snr=45.0, timing_error=(i % 2 == 1),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(1, frame + 80 - rx.shape[-1]))))
        return jax.block_until_ready(rx)

    rxs = [make(i) for i in range(16)]
    n_samples = rxs[0].shape[0] * rxs[0].shape[1]
    log("inputs:", rxs[0].shape, "x16")

    full = jax.jit(lambda s: ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                                             modulation=mod))

    # --- 0. input-rotation sensitivity: find the honest per-step time
    for n in (2, 3, 4, 8, 16):
        dt, _ = timeit(full, rxs[:n])
        log(f"  rotation n={n:2d}: {dt*1e3:6.2f} ms ({n_samples/dt/1e6:.0f} MS/s)")
    N_HONEST = 16
    sub = rxs[:N_HONEST]

    dt, _ = timeit(full, sub)
    log(f"FULL decode_frame:        {dt*1e3:6.2f} ms  ({n_samples/dt/1e6:.0f} MS/s)")

    sync = jax.jit(lambda s: ot.sync_offset(s))
    dt_s, _ = timeit(sync, sub)
    log(f"sync only:                {dt_s*1e3:6.2f} ms")

    def align(s):
        off = jnp.zeros((BATCH,), jnp.int32)
        return jax.vmap(lambda r, o: jax.lax.dynamic_slice_in_dim(
            r, o, frame, axis=0))(s, off)
    alignj = jax.jit(align)
    dt_a, _ = timeit(alignj, sub)
    log(f"align gather only:        {dt_a*1e3:6.2f} ms")
    aligneds = [jax.block_until_ready(alignj(r)) for r in sub]

    dec = jax.jit(lambda a: decode_aligned(a, n_chunks=n_chunks,
                                           guard_bands=True, modulation=mod)[0])
    dt_d, _ = timeit(dec, aligneds)
    log(f"decode_aligned only:      {dt_d*1e3:6.2f} ms")

    chunkss = [jax.block_until_ready(
        jax.jit(lambda a: a.reshape(BATCH, n_chunks, 80))(a)) for a in aligneds]

    def cfo_stage(ch):
        left, right = ch[..., 3, :], ch[..., 4, :]
        f = jnp.abs(jnp.mean(jnp.angle(right / left), axis=-1) / 80)
        rd = jnp.float32
        c_idx = jnp.arange(n_chunks, dtype=rd) * 80
        j_idx = jnp.arange(80, dtype=rd)
        ang_c = f[..., None] * c_idx
        ang_j = f[..., None] * j_idx
        pc = jnp.exp(jax.lax.complex(jnp.zeros_like(ang_c), -ang_c))
        pj = jnp.exp(jax.lax.complex(jnp.zeros_like(ang_j), -ang_j))
        return ch * (pc[..., :, None] * pj[..., None, :]).astype(ch.dtype)
    dt_c, _ = timeit(jax.jit(cfo_stage), chunkss)
    log(f"  cfo estimate+derotate:  {dt_c*1e3:6.2f} ms")

    def chanest(ch):
        tr = ch[..., 5:10, 16:]
        ref = jnp.asarray(constants.training_signals(64, 50), dtype=ch.dtype)
        return jnp.mean(fft(tr) / ref, axis=-2)
    dt_h, _ = timeit(jax.jit(chanest), chunkss)
    log(f"  channel estimate:       {dt_h*1e3:6.2f} ms")

    def datafft(ch):
        return fft(ch[..., 10:, 16:])
    dt_f, _ = timeit(jax.jit(datafft), chunkss)
    log(f"  data DFT:               {dt_f*1e3:6.2f} ms")

    yss = [jax.block_until_ready(jax.jit(datafft)(c)) for c in chunkss]
    hs = [jax.block_until_ready(jax.jit(chanest)(c)) for c in chunkss]

    def eq_demod(y, h):
        eq = y / h[..., None, :]
        pil = eq[..., list(cfg.pilot_indices)]
        phi = jnp.mean(jnp.angle(pil), axis=-1, keepdims=True)
        data = eq[..., cfg.data_indices] * jnp.exp(-1j * phi.astype(jnp.float32)
                                                   ).astype(eq.dtype)
        syms = data.reshape(*data.shape[:-2], -1)
        bits = demodulate_symbols(syms, mod)
        return bits_to_bytes(bits)
    eqj = jax.jit(eq_demod)
    pairs = list(zip(yss, hs))
    dt_e, _ = timeit(lambda p: eqj(*p), pairs)
    log(f"  equalize+demod+pack:    {dt_e*1e3:6.2f} ms")

    log(f"sum of inner stages: {(dt_c+dt_h+dt_f+dt_e)*1e3:.2f} ms "
        f"vs decode_aligned {dt_d*1e3:.2f} ms; "
        f"sync {dt_s*1e3:.2f} + align {dt_a*1e3:.2f} + decode {dt_d*1e3:.2f} "
        f"= {(dt_s+dt_a+dt_d)*1e3:.2f} vs full {dt*1e3:.2f} ms")
    log("DONE")


if __name__ == "__main__":
    main()
