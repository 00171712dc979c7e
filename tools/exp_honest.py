"""Cache-proof TPU timing: dependency-chained steps.

The tunneled runtime can serve repeated dispatches from a result cache (even
with rotating distinct inputs), overreporting throughput by orders of
magnitude.  This harness defeats any caching by making step i's input depend
numerically on step i-1's output: a scalar carry (which also bumps by +1
every step so no input value ever repeats) is mixed into the samples with a
1e-30 weight.  Fetching the final carry forces the whole chain to execute on
the device; total/steps is the honest per-step time.

The same chained pattern times each pipeline stage for the split.

Run nohup'd:  setsid nohup python3 tools/exp_honest.py > /tmp/exp_honest.log 2>&1 &
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
from ofdm_tpu.config import DEFAULT_CONFIG as cfg
from ofdm_tpu.phy.rx import decode_aligned

BATCH = 256
PAYLOAD = 8192
STEPS = 64


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def chained_time(step_fn, inputs, steps=STEPS):
    """step_fn(x, carry) -> new_carry (f32 scalar device array)."""
    carry = jnp.float32(0.0)
    # warm-up/compile: one step, fully forced
    carry = step_fn(inputs[0], carry)
    float(carry)
    t0 = time.perf_counter()
    for i in range(steps):
        carry = step_fn(inputs[i % len(inputs)], carry)
    total = float(carry)  # d2h forces the whole chain
    dt = (time.perf_counter() - t0) / steps
    return dt, total


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    n_chunks = cfg.n_sync_chunks + nb
    frame = n_chunks * 80

    def make(i):
        rng = np.random.default_rng(1000 + i)
        d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=mod)
        rx = ot.channel(tx, snr=45.0, timing_error=(i % 2 == 1),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(1, frame + 80 - rx.shape[-1]))))
        return jax.block_until_ready(rx)

    rxs = [make(i) for i in range(4)]
    n_samples = rxs[0].shape[0] * rxs[0].shape[1]
    log("inputs:", rxs[0].shape, "x4;", f"{n_samples/1e6:.2f} Msamples/step")

    def mix(s, carry):
        return s * (1.0 + carry * jnp.complex64(1e-30))

    @jax.jit
    def full_step(s, carry):
        out = ot.decode_frame(mix(s, carry), n_blocks=nb, guard_bands=True,
                              modulation=mod)
        return out[0, 0].astype(jnp.float32) * 1e-6 + carry * 0.25 + 1.0

    dt, _ = chained_time(full_step, rxs)
    log(f"CHAINED full decode_frame: {dt*1e3:6.2f} ms "
        f"({n_samples/dt/1e6:.0f} MS/s/chip)")

    @jax.jit
    def sync_step(s, carry):
        off = ot.sync_offset(mix(s, carry))
        return off[0].astype(jnp.float32) * 1e-6 + carry * 0.25 + 1.0

    dt_s, _ = chained_time(sync_step, rxs)
    log(f"CHAINED sync only:         {dt_s*1e3:6.2f} ms")

    @jax.jit
    def aligned_step(s, carry):
        a = mix(s, carry)[..., :frame]
        out, _ = decode_aligned(a, n_chunks=n_chunks, guard_bands=True,
                                modulation=mod)
        return out[0, 0].astype(jnp.float32) * 1e-6 + carry * 0.25 + 1.0

    dt_d, _ = chained_time(aligned_step, rxs)
    log(f"CHAINED aligned decode:    {dt_d*1e3:6.2f} ms")

    # inner stages, chained
    from ofdm_tpu import constants
    from ofdm_tpu.ops.fft import fft

    @jax.jit
    def cfo_step(s, carry):
        ch = mix(s, carry)[..., :frame].reshape(BATCH, n_chunks, 80)
        left, right = ch[..., 3, :], ch[..., 4, :]
        f = jnp.abs(jnp.mean(jnp.angle(right / left), axis=-1) / 80)
        c_idx = jnp.arange(n_chunks, dtype=jnp.float32) * 80
        j_idx = jnp.arange(80, dtype=jnp.float32)
        ang_c = f[..., None] * c_idx
        ang_j = f[..., None] * j_idx
        pc = jnp.exp(jax.lax.complex(jnp.zeros_like(ang_c), -ang_c))
        pj = jnp.exp(jax.lax.complex(jnp.zeros_like(ang_j), -ang_j))
        der = ch * (pc[..., :, None] * pj[..., None, :]).astype(ch.dtype)
        return jnp.real(der[0, 0, 0]) * 1e-6 + carry * 0.25 + 1.0

    dt_c, _ = chained_time(cfo_step, rxs)
    log(f"CHAINED cfo derotate:      {dt_c*1e3:6.2f} ms")

    @jax.jit
    def dft_step(s, carry):
        ch = mix(s, carry)[..., :frame].reshape(BATCH, n_chunks, 80)
        y = fft(ch[..., 10:, 16:])
        return jnp.real(y[0, 0, 0]) * 1e-6 + carry * 0.25 + 1.0

    dt_f, _ = chained_time(dft_step, rxs)
    log(f"CHAINED data DFT:          {dt_f*1e3:6.2f} ms")

    # sanity: unchained rotation for comparison (shows the cache inflation)
    dec = jax.jit(lambda s: ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                                            modulation=mod))
    jax.block_until_ready(dec(rxs[0]))
    t0 = time.perf_counter()
    for i in range(STEPS):
        out = dec(rxs[i % 4])
    jax.block_until_ready(out)
    dt_u = (time.perf_counter() - t0) / STEPS
    log(f"UNCHAINED rotation n=4:    {dt_u*1e3:6.2f} ms "
        f"(inflation x{dt/dt_u:.1f} if >1)")

    log("DONE")


if __name__ == "__main__":
    main()
