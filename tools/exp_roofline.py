"""TPU experiment: chip ceilings + per-stage roofline of the headline chain.

BASELINE.md targets "FFT and Schmidl-Cox correlator at speed-of-light per
chip" and SURVEY section 7 M3 gates on the speed-of-light FFT bound; this
measures what speed-of-light actually IS on the attached chip — peak MXU
matmul throughput (f32 default/highest + bf16, at a fat square shape and at
the chain's own shapes) and peak HBM stream bandwidth — then times each
pipeline stage of the batch-256 64QAM headline chain against the binding
bound.  Everything uses the dependency-chained cache-proof methodology
(bench.py): step i's input carries a scalar derived from step i-1's output,
so no runtime cache can elide device work.

Run nohup'd:
  setsid nohup python3 tools/exp_roofline.py > /tmp/exp_roofline.log 2>&1 &
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
from ofdm_tpu.config import DEFAULT_CONFIG as cfg

BATCH = 256
PAYLOAD = 8192
RESULTS: dict = {}


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


# --------------------------------------------------------------------------
# peak HBM stream bandwidth: y = x * c + carry, y self-chains into the next
# step (a data dependency no cache can cut), 1 GB read + 1 GB write per step
def hbm_peak(n_elems=1 << 28, reps=30):
    # carry MUST depend on every step's output via a reduction and be the
    # thing fetched: block_until_ready alone does not force execution on the
    # tunneled runtime (CLAUDE.md methodology; the max fuses into the stream)
    @jax.jit
    def step(x, carry):
        y = x * np.float32(1.0000001) + carry * np.float32(1e-30)
        return y, carry + 1.0 + jnp.max(y) * np.float32(1e-30)

    x = jnp.ones((n_elems,), jnp.float32)
    carry = jnp.float32(0.0)
    y, carry = step(x, carry)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(reps):
        y, carry = step(y, carry)
    float(carry)
    dt = (time.perf_counter() - t0) / reps
    gbs = 2 * 4 * n_elems / dt / 1e9
    log(f"HBM stream (r+w) {4*n_elems/2**20:.0f} MiB: {dt*1e3:.2f} ms "
        f"= {gbs:.1f} GB/s")
    return gbs


# --------------------------------------------------------------------------
# peak MXU matmul: square ping-pong c = (a @ B) * (1/n); c feeds the next
# step's a (scale fuses into the matmul epilogue, values stay ~N(0,1))
def matmul_peak_square(n=4096, dtype=jnp.float32, precision=None, reps=30,
                       label=""):
    prec = precision or jax.lax.Precision.DEFAULT

    # B is an ARGUMENT, not a closure constant: the remote compile helper
    # rejects programs with multi-hundred-MB embedded constants (HTTP 413)
    @jax.jit
    def step(a, B, carry):
        c = jnp.matmul(a + (carry * np.float32(1e-30)).astype(a.dtype), B,
                       precision=prec,
                       preferred_element_type=jnp.float32)
        carry = carry + 1.0 + jnp.max(c) * np.float32(1e-30)
        c = (c * np.float32(1.0 / np.sqrt(n))).astype(a.dtype)
        return c, carry

    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((n, n)), dtype)
    a = jnp.asarray(rng.standard_normal((n, n)), dtype)
    carry = jnp.float32(0.0)
    a, carry = step(a, B, carry)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(reps):
        a, carry = step(a, B, carry)
    float(carry)
    dt = (time.perf_counter() - t0) / reps
    tf = 2 * n**3 / dt / 1e12
    log(f"matmul {n}^3 {label}: {dt*1e3:.2f} ms = {tf:.1f} TFLOP/s")
    return tf


# rectangular shape classes of the chain: ping-pong through a return matmul
# (c @ W back to a's shape) so every FLOP is MXU work at the stage's K/N
def matmul_peak_rect(m, k, n, dtype=jnp.float32, precision=None, reps=30,
                     label=""):
    prec = precision or jax.lax.Precision.DEFAULT

    @jax.jit
    def step(a, B, W, carry):
        c = jnp.matmul(a + (carry * np.float32(1e-30)).astype(a.dtype), B,
                       precision=prec, preferred_element_type=jnp.float32)
        a2 = jnp.matmul(c.astype(dtype), W, precision=prec,
                        preferred_element_type=jnp.float32)
        carry = carry + 1.0 + jnp.max(a2) * np.float32(1e-30)
        a2 = (a2 * np.float32(1.0 / np.sqrt(k * n))).astype(dtype)
        return a2, carry

    rng = np.random.default_rng(1)
    B = jnp.asarray(rng.standard_normal((k, n)), dtype)
    W = jnp.asarray(rng.standard_normal((n, k)), dtype)
    a = jnp.asarray(rng.standard_normal((m, k)), dtype)
    carry = jnp.float32(0.0)
    a, carry = step(a, B, W, carry)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(reps):
        a, carry = step(a, B, W, carry)
    float(carry)
    dt = (time.perf_counter() - t0) / reps / 2     # two matmuls per step
    tf = 2 * m * k * n / dt / 1e12
    log(f"matmul [{m},{k}]x[{k},{n}] {label}: {dt*1e3:.3f} ms/mm "
        f"= {tf:.1f} TFLOP/s")
    return tf


# --------------------------------------------------------------------------
# chained stage timings of the production chain at the headline shape
def make_inputs(nb, frame, n_inputs=4):
    rng = np.random.default_rng(0)
    datas, rxs = [], []
    for i in range(n_inputs):
        d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=ot.Modulation.QAM64)
        rx = ot.channel(tx, snr=45.0, timing_error=(i > 0),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame + 80 - rx.shape[-1]))))
        datas.append(d)
        rxs.append(jax.block_until_ready(rx))
    return datas, rxs


def chained_time(make_step, inputs, reps=80):
    """make_step(x, carry) -> new carry (a float32 scalar consuming the
    stage's output).  Chained: no dispatch repeats, final fetch forces all."""
    step = jax.jit(make_step)
    carry = step(inputs[0], jnp.float32(0.0))
    float(carry)
    t0 = time.perf_counter()
    for i in range(reps):
        carry = step(inputs[i % len(inputs)], carry)
    float(carry)
    return (time.perf_counter() - t0) / reps


def main():
    log("backend:", jax.default_backend(), jax.devices())
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    n_chunks = cfg.n_sync_chunks + nb
    frame = n_chunks * 80
    log(f"headline shape: batch {BATCH} x {frame + 80} samples, "
        f"{nb} data blocks")

    # ---- ceilings ----------------------------------------------------------
    RESULTS["hbm_gbs"] = hbm_peak()
    RESULTS["hbm_gbs_small"] = hbm_peak(1 << 26, reps=60)
    RESULTS["mm_f32_default"] = matmul_peak_square(
        8192, jnp.float32, jax.lax.Precision.DEFAULT, label="f32 DEFAULT")
    RESULTS["mm_f32_highest"] = matmul_peak_square(
        8192, jnp.float32, jax.lax.Precision.HIGHEST, label="f32 HIGHEST")
    RESULTS["mm_bf16"] = matmul_peak_square(
        8192, jnp.bfloat16, label="bf16")
    # the chain's own shape classes (M = headline batch work)
    n_frames = -(-(frame + 80) // 128)
    m_sync = BATCH * n_frames
    RESULTS["mm_sync_shape_f32"] = matmul_peak_rect(
        m_sync, 512, 256, label="sync Toeplitz class f32")
    RESULTS["mm_sync_shape_bf16"] = matmul_peak_rect(
        m_sync, 512, 256, dtype=jnp.bfloat16, label="sync Toeplitz class bf16")
    m_dft = BATCH * nb
    RESULTS["mm_dft_shape_f32"] = matmul_peak_rect(
        m_dft, 128, 104, precision=jax.lax.Precision.HIGHEST,
        label="data-DFT class f32 HIGHEST")
    RESULTS["mm_dft_shape_f32_default"] = matmul_peak_rect(
        m_dft, 128, 104, label="data-DFT class f32 DEFAULT")

    # ---- stage timings -----------------------------------------------------
    datas, rxs = make_inputs(nb, frame)
    n_samples = rxs[0].shape[0] * rxs[0].shape[1]

    def full_step(s, carry):
        out = ot.decode_frame(s, n_blocks=nb, guard_bands=True, modulation=mod)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9
    dt_full = chained_time(full_step, rxs)
    RESULTS["full_ms"] = dt_full * 1e3
    RESULTS["full_gss"] = n_samples / dt_full / 1e9
    log(f"FULL decode_frame: {dt_full*1e3:.3f} ms = "
        f"{n_samples/dt_full/1e9:.2f} GS/s")

    # pre-aligned inputs for the aligned-decode stage
    from ofdm_tpu.phy.rx import decode_aligned
    aligneds = []
    for rx in rxs:
        from ofdm_tpu.kernels.align_pallas import sync_align
        from ofdm_tpu import constants
        al = jax.jit(lambda s: sync_align(
            s, constants.locking_for(cfg).astype(np.complex64), frame))(rx)
        aligneds.append(jax.block_until_ready(al))

    def aligned_step(a, carry):
        out, _ = decode_aligned(a, n_chunks=n_chunks, guard_bands=True,
                                modulation=mod, cfo_estimator="coherent")
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9
    dt_dec = chained_time(aligned_step, aligneds)
    RESULTS["decode_aligned_ms"] = dt_dec * 1e3
    log(f"decode_aligned: {dt_dec*1e3:.3f} ms "
        f"(inferred sync+align = {(dt_full-dt_dec)*1e3:.3f} ms)")

    # sync_align measured directly (consume via max: adds ONE read pass over
    # the 39 MB aligned output — corrected by the measured max-pass cost)
    def sa_step(s, carry):
        from ofdm_tpu.kernels.align_pallas import sync_align
        from ofdm_tpu import constants
        al = sync_align(s, constants.locking_for(cfg).astype(np.complex64),
                        frame)
        return carry + 1.0 + jnp.max(jnp.real(al)) * 1e-9
    dt_sa = chained_time(sa_step, rxs)

    def max_step(a, carry):
        return carry + 1.0 + jnp.max(jnp.real(a)) * 1e-9
    dt_max = chained_time(max_step, aligneds)
    RESULTS["sync_align_ms"] = (dt_sa - dt_max) * 1e3
    RESULTS["max_pass_ms"] = dt_max * 1e3
    log(f"sync_align direct: {dt_sa*1e3:.3f} ms incl. consume; "
        f"max pass {dt_max*1e3:.3f} ms; net {(dt_sa-dt_max)*1e3:.3f} ms")

    # inner stages on pre-aligned chunks
    chunkss = [jax.block_until_ready(
        jax.jit(lambda a: a.reshape(BATCH, n_chunks, 80))(a))
        for a in aligneds]

    from ofdm_tpu.ops.fft import dft_matmul_select
    sel = tuple(cfg.data_indices) + tuple(cfg.pilot_indices)

    def dft_step(ch, carry):
        y = dft_matmul_select(ch[..., cfg.n_sync_chunks:, 16:], sel,
                              precision=jax.lax.Precision.HIGHEST)
        return carry + 1.0 + jnp.max(jnp.real(y)) * 1e-9
    dt_dft = chained_time(dft_step, chunkss)

    def dftmax_step(ch, carry):
        return carry + 1.0 + jnp.max(jnp.real(ch[..., 10:, 16:])) * 1e-9
    dt_dftmax = chained_time(dftmax_step, chunkss)
    RESULTS["data_dft_ms"] = dt_dft * 1e3
    RESULTS["data_dft_consume_ms"] = dt_dftmax * 1e3
    log(f"data DFT (52-bin packed): {dt_dft*1e3:.3f} ms incl. consume "
        f"(consume-only {dt_dftmax*1e3:.3f} ms)")

    # CFO derotate alone (outer-product phasor multiply = pure HBM stream)
    def cfo_step(ch, carry):
        left, right = ch[..., 3, :], ch[..., 4, :]
        corr = jnp.sum(right * jnp.conj(left), axis=-1)
        f = jnp.abs(jnp.angle(corr) / 80)
        rd = jnp.float32
        pc = jnp.exp(jax.lax.complex(
            jnp.zeros((), rd), -1.0) * (f[..., None]
                                        * jnp.arange(n_chunks, dtype=rd) * 80))
        pj = jnp.exp(jax.lax.complex(
            jnp.zeros((), rd), -1.0) * (f[..., None]
                                        * jnp.arange(80, dtype=rd)))
        out = ch * (pc[..., :, None] * pj[..., None, :]).astype(ch.dtype)
        return carry + 1.0 + jnp.max(jnp.real(out)) * 1e-9
    dt_cfo = chained_time(cfo_step, chunkss)
    RESULTS["cfo_ms"] = dt_cfo * 1e3
    log(f"CFO derotate (+consume pass): {dt_cfo*1e3:.3f} ms")

    print("\nRESULTS " + json.dumps(RESULTS))
    log("DONE")


if __name__ == "__main__":
    main()
