"""TPU experiment: chained (cache-proof) timing of decode optimizations.

Variants at the headline shape (batch 256, 8 KB, 64QAM):
  1. align-gather-only cost
  2. baseline full decode
  3. bf16 sync
  4. DFT precision HIGH / DEFAULT (with byte-error check)
  5. refactored aligned decode: rot_j-only input derotation with the
     per-chunk phasor rot_c folded into the post-FFT equalizer multiply
     (FFT linearity: FFT(a*x) = a*FFT(x)) — kills the [B,nc,80] rotation
     outer-product materialization.

Run nohup'd:  setsid nohup python3 tools/exp_opt.py > /tmp/exp_opt.log 2>&1 &
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
from ofdm_tpu.ops.fft import fft, dft_matmul
from ofdm_tpu.phy.modulation import demodulate_symbols

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

    def mix(s, carry):
        return s * (1.0 + carry * jnp.complex64(1e-30))

    def tail(x, carry):
        return x.astype(jnp.float32) * 1e-6 + carry * 0.25 + 1.0

    # 0. mix-only floor (the chaining overhead itself)
    @jax.jit
    def mix_step(s, carry):
        m = mix(s, carry)
        return tail(jnp.real(m[0, 0]), carry)
    dt0 = chained_time(mix_step, rxs)
    log(f"mix-only floor:            {dt0*1e3:6.2f} ms")

    # 1. align gather
    @jax.jit
    def gather_step(s, carry):
        m = mix(s, carry)
        off = jnp.zeros((BATCH,), jnp.int32) + jnp.int32(carry % 3)
        a = jax.vmap(lambda r, o: jax.lax.dynamic_slice_in_dim(
            r, o, frame, axis=0))(m, off)
        return tail(jnp.real(a[0, 0]), carry)
    dt1 = chained_time(gather_step, rxs)
    log(f"mix + align gather:        {dt1*1e3:6.2f} ms")

    # 2. baseline full decode
    @jax.jit
    def full_step(s, carry):
        out = ot.decode_frame(mix(s, carry), n_blocks=nb, guard_bands=True,
                              modulation=mod)
        return tail(out[0, 0], carry)
    dt2 = chained_time(full_step, rxs)
    log(f"full decode (baseline):    {dt2*1e3:6.2f} ms "
        f"({n_samples/dt2/1e6:.0f} MS/s)")

    # 3. bf16 sync
    @jax.jit
    def bf16_step(s, carry):
        out = ot.decode_frame(mix(s, carry), n_blocks=nb, guard_bands=True,
                              modulation=mod, sync_dtype=jnp.bfloat16)
        return tail(out[0, 0], carry)
    dt3 = chained_time(bf16_step, rxs)
    log(f"full decode bf16 sync:     {dt3*1e3:6.2f} ms")

    # 4. DFT precision variants (+ correctness)
    for prec, name in ((jax.lax.Precision.HIGH, "HIGH   "),
                       (jax.lax.Precision.DEFAULT, "DEFAULT")):
        @jax.jit
        def prec_step(s, carry, prec=prec):
            out = ot.decode_frame(mix(s, carry), n_blocks=nb, guard_bands=True,
                                  modulation=mod, sync_dtype=jnp.bfloat16,
                                  dft_precision=prec)
            return tail(out[0, 0], carry)
        dt = chained_time(prec_step, rxs)
        dec = jax.jit(lambda s, prec=prec: ot.decode_frame(
            s, n_blocks=nb, guard_bands=True, modulation=mod,
            dft_precision=prec))
        out0 = np.asarray(dec(rxs[0]))
        errs = int(np.count_nonzero(out0[:, 16:16 + PAYLOAD] != datas[0]))
        log(f"full decode dft {name}:   {dt*1e3:6.2f} ms  clean-errs={errs}")

    # 5. refactored aligned decode: rot_c folded into equalizer
    training_ref = constants.training_signals(64, 50).astype(np.complex64)

    def decode_refactored(s, sync_dtype=jnp.bfloat16, prec=None):
        offsets = jnp.clip(ot.sync_offset(s, compute_dtype=sync_dtype),
                           0, s.shape[-1] - frame)
        a = jax.vmap(lambda r, o: jax.lax.dynamic_slice_in_dim(
            r, o, frame, axis=0))(s, offsets)
        ch = a.reshape(BATCH, n_chunks, 80)
        left, right = ch[..., 3, :], ch[..., 4, :]
        f = jnp.abs(jnp.mean(jnp.angle(right / left), axis=-1) / 80)
        # derotate only within-chunk positions on the inputs...
        j_idx = jnp.arange(80, dtype=jnp.float32)
        ang_j = f[..., None] * j_idx
        rot_j = jnp.exp(jax.lax.complex(jnp.zeros_like(ang_j), -ang_j))
        ch = ch * rot_j[..., None, :].astype(ch.dtype)
        # ...and carry the per-chunk phasor through the (linear) FFT
        c_idx = jnp.arange(n_chunks, dtype=jnp.float32) * 80
        ang_c = f[..., None] * c_idx
        rot_c = jnp.exp(jax.lax.complex(jnp.zeros_like(ang_c), -ang_c))

        tr = fft(ch[..., 5:10, 16:]) * rot_c[..., 5:10, None].astype(ch.dtype)
        h_k = jnp.mean(tr / jnp.asarray(training_ref), axis=-2)

        if prec is None:
            y = fft(ch[..., 10:, 16:])
        else:
            y = dft_matmul(ch[..., 10:, 16:], precision=prec)
        eq = y * (rot_c[..., 10:, None].astype(ch.dtype) / h_k[..., None, :])
        pil = eq[..., list(cfg.pilot_indices)]
        phi = jnp.mean(jnp.angle(pil), axis=-1, keepdims=True)
        data = eq[..., cfg.data_indices] * jnp.exp(
            -1j * phi.astype(jnp.float32)).astype(eq.dtype)
        syms = data.reshape(*data.shape[:-2], -1)
        bits = demodulate_symbols(syms, mod)
        return bits_to_bytes(bits)

    @jax.jit
    def refac_step(s, carry):
        out = decode_refactored(mix(s, carry))
        return tail(out[0, 0], carry)
    dt5 = chained_time(refac_step, rxs)
    decj = jax.jit(lambda s: decode_refactored(s, sync_dtype=None))
    out0 = np.asarray(decj(rxs[0]))
    errs = int(np.count_nonzero(out0[:, 16:16 + PAYLOAD] != datas[0]))
    out1 = np.asarray(decj(rxs[1]))
    errs_cfo = int(np.count_nonzero(out1[:, 16:16 + PAYLOAD] != datas[1]))
    log(f"full decode refactored:    {dt5*1e3:6.2f} ms "
        f"({n_samples/dt5/1e6:.0f} MS/s)  clean-errs={errs} cfo-errs={errs_cfo}")

    # 6. refactor + HIGH dft
    @jax.jit
    def refac_high_step(s, carry):
        out = decode_refactored(mix(s, carry), prec=jax.lax.Precision.HIGH)
        return tail(out[0, 0], carry)
    dt6 = chained_time(refac_high_step, rxs)
    decj = jax.jit(lambda s: decode_refactored(s, sync_dtype=None,
                                               prec=jax.lax.Precision.HIGH))
    out0 = np.asarray(decj(rxs[0]))
    errs = int(np.count_nonzero(out0[:, 16:16 + PAYLOAD] != datas[0]))
    log(f"refactored + HIGH dft:     {dt6*1e3:6.2f} ms "
        f"({n_samples/dt6/1e6:.0f} MS/s)  clean-errs={errs}")

    log("DONE")


if __name__ == "__main__":
    main()
