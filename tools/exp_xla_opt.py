"""TPU experiment: XLA decode-path variants vs production decode_frame.

Variants (all full rx chains, chained cache-proof timing like bench.py):
  base    — production ot.decode_frame
  sel52   — data-block DFT restricted to the 52 used bins (48 data + 4
            pilots) via a packed [128, 104] matmul; equalization/pilot
            phase operate on the packed bins directly (no 64-bin gather)
  planar  — alignment gather done on a bitcast f32 planar view (one
            [B, 2T] dynamic_slice row gather instead of complex64)
  both    — sel52 + planar

Run nohup'd:  setsid nohup python3 tools/exp_xla_opt.py > /tmp/exp_xla_opt.log 2>&1 &
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
from ofdm_tpu.config import DEFAULT_CONFIG as CFG
from ofdm_tpu.ops.fft import _dft_matrix, fft
from ofdm_tpu.phy.modulation import Modulation, demodulate_symbols
from ofdm_tpu.phy.rx import _cfo_estimate, sync_offset
from ofdm_tpu.core.bitops import bits_to_bytes

BATCH = 256
PAYLOAD = 8192
STEPS = 48
MOD = Modulation.QAM64


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def packed_sel_matrix():
    sel = list(CFG.data_indices) + list(CFG.pilot_indices)
    w = _dft_matrix(CFG.n_fft, inverse=False)[:, sel]
    wr, wi = w.real, w.imag
    return np.block([[wr, wi], [-wi, wr]]).astype(np.float32)  # [128, 104]


def align_rows(samples, offsets, need, planar):
    if planar:
        f = jnp.stack([jnp.real(samples), jnp.imag(samples)], axis=1)
        take = lambda r, o: jax.lax.dynamic_slice(r, (0, o), (2, need))
        a = jax.vmap(take)(f, offsets)                          # [B, 2, need]
        return jax.lax.complex(a[:, 0], a[:, 1])
    take = lambda r, o: jax.lax.dynamic_slice_in_dim(r, o, need)
    return jax.vmap(take)(samples, offsets)


def make_decode(nb, sel52, planar):
    sym, cp, nfft = CFG.sym_len, CFG.cp_len, CFG.n_fft
    n_sync = CFG.n_sync_chunks
    n_chunks = n_sync + nb
    need = n_chunks * sym
    nd, npil = len(CFG.data_indices), len(CFG.pilot_indices)
    sel = list(CFG.data_indices) + list(CFG.pilot_indices)
    wsel_np = packed_sel_matrix()
    tref_np = constants.training_signals(nfft, CFG.training_seed).astype(
        np.complex64)

    @jax.jit
    def decode(samples):
        offsets = jnp.clip(sync_offset(samples, CFG),
                           0, samples.shape[-1] - need)
        aligned = align_rows(samples, offsets, need, planar)
        chunks = aligned.reshape(-1, n_chunks, sym)
        f_delta = _cfo_estimate(chunks, CFG)
        rd = jnp.float32
        c_idx = jnp.arange(n_chunks, dtype=rd) * sym
        j_idx = jnp.arange(sym, dtype=rd)
        phasor = lambda a: jnp.exp(jax.lax.complex(jnp.zeros_like(a), -a))
        rot = (phasor(f_delta[:, None] * c_idx)[:, :, None]
               * phasor(f_delta[:, None] * j_idx)[:, None, :])
        chunks = chunks * rot.astype(chunks.dtype)

        t0 = CFG.n_locking + CFG.n_preamble
        training_rx = chunks[:, t0:t0 + CFG.n_training, cp:]
        h_k = jnp.mean(fft(training_rx) / jnp.asarray(tref_np), axis=-2)

        data_t = chunks[:, n_sync:, cp:]
        if sel52:
            packed = jnp.concatenate(
                [jnp.real(data_t), jnp.imag(data_t)], axis=-1)
            out = jnp.matmul(packed, jnp.asarray(wsel_np),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
            y = jax.lax.complex(out[..., :nd + npil], out[..., nd + npil:])
            eq = y / h_k[:, None, sel]
            pilots = eq[..., nd:]
            phi = jnp.mean(jnp.angle(pilots), axis=-1, keepdims=True)
            data = eq[..., :nd] * jnp.exp(-1j * phi).astype(eq.dtype)
        else:
            y = fft(data_t)
            eq = y / h_k[:, None, :]
            pilots = eq[..., list(CFG.pilot_indices)]
            phi = jnp.mean(jnp.angle(pilots), axis=-1, keepdims=True)
            data = eq[..., CFG.data_indices] * jnp.exp(-1j * phi).astype(eq.dtype)
        syms = data.reshape(data.shape[0], -1)
        return bits_to_bytes(demodulate_symbols(syms, MOD))

    return decode


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
    nb = ot.n_data_blocks(PAYLOAD, MOD, True)
    frame = 880 + nb * 80
    datas, rxs = [], []
    for i in range(4):
        rng = np.random.default_rng(1000 + i)
        d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=MOD)
        rx = ot.channel(tx, snr=45.0, timing_error=(i % 2 == 1),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame - rx.shape[-1]))))
        datas.append(d)
        rxs.append(jax.block_until_ready(rx.astype(jnp.complex64)))
    n_samples = BATCH * frame
    log("inputs ready:", rxs[0].shape)

    ref = np.asarray(jax.jit(lambda s: ot.decode_frame(
        s, n_blocks=nb, guard_bands=True, modulation=MOD))(rxs[0]))

    for name, (sel52, planar) in [("base", (False, False)),
                                  ("sel52", (True, False)),
                                  ("planar", (False, True)),
                                  ("both", (True, True))]:
        if name == "base":
            dec = jax.jit(lambda s: ot.decode_frame(
                s, n_blocks=nb, guard_bands=True, modulation=MOD))
        else:
            dec = make_decode(nb, sel52, planar)
        t0 = time.time()
        out = np.asarray(dec(rxs[0]))
        log(f"{name}: compile+run {time.time()-t0:.1f}s")
        errs = int(np.count_nonzero(out[:, 16:16 + PAYLOAD] != datas[0]))
        par = int(np.count_nonzero(out[:, :16 + PAYLOAD] != ref[:, :16 + PAYLOAD]))
        step = jax.jit(lambda s, c, dec=dec: c + 1.0 +
                       jnp.max(dec(s)).astype(jnp.float32) * 1e-9)
        dt = chained(step, rxs)
        log(f"{name:7s} {dt*1e3:6.2f} ms  {n_samples/dt/1e6:5.0f} MS/s  "
            f"clean-errs={errs}  parity-vs-base={par}")
    log("DONE")


if __name__ == "__main__":
    main()
