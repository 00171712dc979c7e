"""TPU experiment: alignment-gather variants + bench-chaining validation.

1. carry-methodology check: full decode chained via corner byte vs full
   checksum (if the corner variant is faster, XLA was dead-code-eliminating
   the batch and earlier corner-chained numbers were inflated).
2. gather variants for the sync alignment (the ~0.5 ms line item):
     A. vmap(dynamic_slice)            (current production path)
     B. take_along_axis [B, frame]
     C. direct 3-D chunk gather (merges the reshape)
   each chained, each checked for identical decoded output.

Run nohup'd:  setsid nohup python3 tools/exp_gather.py > /tmp/exp_gather.log 2>&1 &
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
from ofdm_tpu.phy.rx import decode_aligned
from ofdm_tpu.config import DEFAULT_CONFIG as cfg

BATCH = 256
PAYLOAD = 8192
STEPS = 64


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def chained_time(step_fn, inputs, steps=STEPS):
    carry = jnp.float32(0.0)
    carry = step_fn(inputs[0], carry)
    float(carry)
    t0 = time.perf_counter()
    for i in range(steps):
        carry = step_fn(inputs[i % len(inputs)], carry)
    float(carry)
    return (time.perf_counter() - t0) / steps


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    n_chunks = cfg.n_sync_chunks + nb
    frame = n_chunks * 80

    datas, rxs = [], []
    for i in range(4):
        rng = np.random.default_rng(1000 + i)
        d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=mod)
        rx = ot.channel(tx, snr=45.0, timing_error=(i % 2 == 1),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(1, frame + 80 - rx.shape[-1]))))
        datas.append(d)
        rxs.append(jax.block_until_ready(rx))
    n_samples = rxs[0].shape[0] * rxs[0].shape[1]
    log("inputs ready")

    decode = lambda s: ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                                       modulation=mod)

    # --- 1. carry methodology check
    @jax.jit
    def corner_step(s, carry):
        out = decode(s)
        return out[0, 0].astype(jnp.float32) * 1e-6 + carry * 0.25 + 1.0

    @jax.jit
    def sum_step(s, carry):
        out = decode(s)
        chk = jnp.sum(out, dtype=jnp.int32).astype(jnp.float32)
        return chk * 1e-9 + carry * 0.25 + 1.0

    dt_c = chained_time(corner_step, rxs)
    dt_s = chained_time(sum_step, rxs)
    log(f"corner-carry decode: {dt_c*1e3:6.2f} ms ({n_samples/dt_c/1e6:.0f} MS/s)")
    log(f"sum-carry decode:    {dt_s*1e3:6.2f} ms ({n_samples/dt_s/1e6:.0f} MS/s)"
        f"   [DCE inflation x{dt_s/dt_c:.2f} if >1]")

    # --- 2. gather variants (full decode, only the alignment step differs)
    def decode_with_gather(s, how):
        offsets = jnp.clip(ot.sync_offset(s), 0, s.shape[-1] - frame)
        if how == "A":
            aligned = jax.vmap(lambda r, o: jax.lax.dynamic_slice_in_dim(
                r, o, frame, axis=0))(s, offsets)
        elif how == "B":
            idx = offsets[:, None] + jnp.arange(frame)
            aligned = jnp.take_along_axis(s, idx, axis=1)
        elif how == "C":
            pos = (jnp.arange(n_chunks)[:, None] * 80
                   + jnp.arange(80)[None, :])          # [nc, 80]
            idx = offsets[:, None, None] + pos[None]   # [B, nc, 80]
            ali3 = jnp.take_along_axis(
                s[:, :, None], idx.reshape(BATCH, -1, 1), axis=1)
            aligned = ali3.reshape(BATCH, n_chunks * 80)
        out, _ = decode_aligned(aligned, n_chunks=n_chunks, guard_bands=True,
                                modulation=mod)
        return out

    outs = {}
    for how in ("A", "B", "C"):
        @jax.jit
        def g_step(s, carry, how=how):
            out = decode_with_gather(s, how)
            chk = jnp.sum(out, dtype=jnp.int32).astype(jnp.float32)
            return chk * 1e-9 + carry * 0.25 + 1.0
        dt = chained_time(g_step, rxs)
        dj = jax.jit(lambda s, how=how: decode_with_gather(s, how))
        outs[how] = np.asarray(dj(rxs[1]))
        errs0 = int(np.count_nonzero(
            np.asarray(dj(rxs[0]))[:, 16:16 + PAYLOAD] != datas[0]))
        log(f"gather {how}: {dt*1e3:6.2f} ms ({n_samples/dt/1e6:.0f} MS/s) "
            f"clean-errs={errs0}")
    log("B==A:", np.array_equal(outs["B"], outs["A"]),
        " C==A:", np.array_equal(outs["C"], outs["A"]))

    log("DONE")


if __name__ == "__main__":
    main()
