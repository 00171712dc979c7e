"""TPU A/B: planar-input serving route vs complex-input decode_frame.

The round-4 HLO audit showed the complex-input headline step spends
~118 MB/step on input-side prep (X64Split + plane stack + batch-minor ->
row-major relayout feeding the Pallas kernel).  decode_frame_planar with a
pre-padded planar argument removes all of it.  Chained cache-proof timing;
byte-exact gates.

Run nohup'd:  setsid nohup python3 tools/exp_planar_in.py > /tmp/exp_planar_in.log 2>&1 &
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

BATCH = 256
PAYLOAD = 8192
REPS = 60


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    n_chunks = cfg.n_sync_chunks + nb
    need = n_chunks * cfg.sym_len
    frame = need + 80
    # zero-copy planar contract: multiple of 128 lanes + one spare zero tile
    t_pad = (-(-frame // 128) + 1) * 128
    rng = np.random.default_rng(0)
    d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
    tx = ot.encode(d, guard_bands=True, modulation=mod)
    rxs, planar = [], []
    for i in range(3):
        rx = ot.channel(tx, snr=45.0, timing_error=(i > 0),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame - rx.shape[-1]))))
        rxs.append(jax.block_until_ready(rx))
        p = jax.jit(lambda s: jnp.pad(
            jnp.stack([jnp.real(s), jnp.imag(s)], axis=1),
            ((0, 0), (0, 0), (0, t_pad - s.shape[-1]))))(rx)
        planar.append(jax.block_until_ready(p))
    n_samples = rxs[0].shape[0] * rxs[0].shape[1]
    log(f"planar buffer: {planar[0].shape} ({planar[0].nbytes/2**20:.1f} MiB)")

    def mk(fn, pinned=False):
        def step(s, carry):
            out = fn(s)
            return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9, out
        if pinned and jax.default_backend() == "tpu":
            return jax.jit(step,
                           in_shardings=(ot.planar_input_format(), None))
        return jax.jit(step)

    tiles = t_pad // 128
    # buffers must LIVE in the pinned layout (else every dispatch pays an
    # input relayout outside the graph); produce them via out_shardings —
    # device_put of a jit output does not reliably relayout, and the
    # PERSISTENT COMPILE CACHE can serve an executable compiled without the
    # layout pin (observed), so verify and retry cache-bypassed.
    fmt = ot.planar_input_format() if jax.default_backend() == "tpu" else None

    # the remote compile helper appears to cache executables keyed on HLO
    # but NOT on the requested output layout, so identical-HLO requests
    # with different layouts collide nondeterministically; make each
    # attempt's HLO unique (roll/unroll no-op with a GLOBAL counter — a
    # per-call counter reuses keys across buffers and can exhaust fresh
    # ones once they are poisoned) until the layout sticks
    uniq = [0]

    def pinned_reshape(p, shape):
        for _ in range(16):
            uniq[0] += 1
            k = uniq[0]
            out = jax.jit(
                lambda x, k=k: jnp.roll(jnp.roll(x.reshape(shape), k, 0),
                                        -k, 0),
                out_shardings=fmt)(p)
            mtm = tuple(out.format.layout.major_to_minor)
            if fmt is None or mtm == (0, 1, 2, 3):
                log(f"pinned buffer layout ok (uniq {k})")
                return jax.block_until_ready(out)
            log(f"pin uniq {k}: got {mtm}, retrying")
        raise RuntimeError("could not pin planar buffer layout")

    planar4 = [pinned_reshape(p, (BATCH, 2, tiles, 128)) for p in planar]
    variants = [
        ("frame_complex", mk(lambda s: ot.decode_frame(
            s, n_blocks=nb, guard_bands=True, modulation=mod)), rxs),
        ("planar_fused", mk(lambda s: ot.decode_frame_planar(
            s, n_blocks=nb, guard_bands=True, modulation=mod)), planar),
        ("planar4_pinned", mk(lambda s: ot.decode_frame_planar(
            s, n_blocks=nb, guard_bands=True, modulation=mod),
            pinned=True), planar4),
        ("planar_chain", mk(lambda s: ot.decode_frame_planar(
            s, n_blocks=nb, guard_bands=True, modulation=mod,
            align_impl="chain")), planar),
    ]
    # chunked kernel output route: needs k_pad+2 spare tiles
    from ofdm_tpu.kernels.chain_pallas import _class_geometry
    _, _, _, k_pad = _class_geometry(cfg.sym_len, cfg.n_sync_chunks + nb)
    t_pad_c = (k_pad + 2) * 128
    padc = jax.jit(lambda s: jnp.pad(
        s, ((0, 0), (0, 0), (0, t_pad_c - s.shape[-1]))))
    planar_c = [pinned_reshape(padc(p), (BATCH, 2, t_pad_c // 128, 128))
                for p in planar]
    variants.append(
        ("planar_chunked", mk(lambda s: ot.decode_frame_planar(
            s, n_blocks=nb, guard_bands=True, modulation=mod,
            align_impl="chunked"), pinned=True), planar_c))
    for name, step, ins in variants:
        t0 = time.perf_counter()
        _, out = step(ins[0], jnp.float32(0.0))
        out = np.asarray(jax.device_get(out))
        errs = int(np.count_nonzero(out[:, 16:16 + PAYLOAD] != d))
        log(f"{name}: compiled in {time.perf_counter()-t0:.1f}s; "
            f"byte errs={errs}")
        assert errs == 0, f"{name} byte errors"

    def measure(step, ins, reps=REPS):
        carry = jnp.float32(0.0)
        carry, _ = step(ins[0], carry)
        float(carry)
        t0 = time.perf_counter()
        for i in range(reps):
            carry, _ = step(ins[i % len(ins)], carry)
        float(carry)
        return (time.perf_counter() - t0) / reps

    for rnd in range(4):
        for name, step, ins in variants:
            dt = measure(step, ins)
            log(f"round {rnd} {name:14s}: {dt*1e3:7.3f} ms/step = "
                f"{n_samples/dt/1e9:.2f} GS/s")
    log("done")


if __name__ == "__main__":
    main()
