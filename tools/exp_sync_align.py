"""TPU experiment: fused sync+align Pallas kernel.

Per row, one VMEM-resident pass: banded-Toeplitz correlation matmul
(identical math to ops/xcorr.py sliding_correlation_matmul), masked
first-occurrence argmax -> offset, clip, tile-dim slice + lane rotate ->
aligned planar output.  Eliminates the separate sync pass AND the align
kernel's second HBM read of the stream.

Gates: offsets == XLA sync offsets, aligned bytes == XLA align, decode
byte-equality on 4 batches; chained timing vs the current production chain.

Run nohup'd: setsid nohup python3 tools/exp_sync_align.py > /tmp/exp_sync_align.log 2>&1 &
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _kernel(in_ref, w_ref, out_ref, *, t, need, n_out_tiles, n_lag_tiles):
    sr = in_ref[0, 0]                                    # [tiles, 128]
    si = in_ref[0, 1]
    # frames [n_lag_tiles, 512]: lag l = 128*tile + lane starts in tile `tile`.
    # The +1-tile shifted view comes from a static sublane roll: slicing at
    # sublane offset 1 gives a layout Mosaic cannot concatenate.
    n_tiles = sr.shape[0]
    srn = pltpu.roll(sr, shift=n_tiles - 1, axis=0)   # out[i] = sr[i+1 mod n]
    sin = pltpu.roll(si, shift=n_tiles - 1, axis=0)
    # Mosaic cannot concatenate the rolled (offset-layout) views, so the
    # [.., 512] x [512, 256] product is decomposed into four partial matmuls
    # over the Toeplitz row-blocks (identical FLOPs).
    n = n_lag_tiles
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    c = (dot(sr[:n], w_ref[0:128, :]) + dot(srn[:n], w_ref[128:256, :])
         + dot(si[:n], w_ref[256:384, :]) + dot(sin[:n], w_ref[384:512, :]))
    cre, cim = c[:, :128], c[:, 128:]
    power = cre * cre + cim * cim                        # [n_lag_tiles, 128]
    tiles_i = jax.lax.broadcasted_iota(jnp.int32, power.shape, 0)
    lanes_i = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1)
    lag = tiles_i * 128 + lanes_i
    p = jnp.where(lag < t, power, -1.0)
    # first-occurrence argmax without dynamic indexing: min lag among maxima
    peak = jnp.max(p)
    idx = jnp.min(jnp.where(p == peak, lag, jnp.int32(2 * t)))
    off = jnp.clip(idx - 1, 0, t - need)
    q = off // 128
    s = off - q * 128
    w2 = in_ref[0, :, pl.ds(q, n_out_tiles + 1), :]
    rolled = pltpu.roll(w2, shift=-s, axis=2)
    down = jnp.concatenate([rolled[:, 1:, :], rolled[:, :1, :]], axis=1)
    l2 = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
    sel = jnp.where(l2 < 128 - s, rolled, down)
    out_ref[0] = sel[:, :n_out_tiles, :]


def sync_align_pallas(flat, template, need, interpret=False):
    """complex[R, T] -> complex[R, need] aligned at the per-row sync offset
    (reference semantics: argmax(corr power) - 1, clipped to [0, T - need])."""
    from ofdm_tpu.ops.xcorr import _toeplitz_template
    r, t = flat.shape
    tpl = np.asarray(template)
    k = tpl.shape[-1]
    key = (tpl.tobytes(), k)
    from ofdm_tpu.ops import xcorr as _x
    _x._TEMPLATE_STORE[key] = tpl
    w = jnp.asarray(_toeplitz_template(key, k, "float32"))  # [512, 256]

    n_lag_tiles = -(-t // 128)
    n_out_tiles = -(-need // 128)
    tiles = max(n_lag_tiles + 1, (t - need) // 128 + n_out_tiles + 1)
    f = jnp.stack([jnp.real(flat), jnp.imag(flat)], axis=1)
    f = jnp.pad(f, ((0, 0), (0, 0), (0, tiles * 128 - t)))
    f = f.reshape(r, 2, tiles, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 2, tiles, 128), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((512, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, n_out_tiles, 128),
                               lambda i: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, t=t, need=need, n_out_tiles=n_out_tiles,
                          n_lag_tiles=n_lag_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, 2, n_out_tiles, 128), jnp.float32),
        interpret=interpret,
    )(f, w)
    a = out.reshape(r, 2, n_out_tiles * 128)[:, :, :need]
    return jax.lax.complex(a[:, 0], a[:, 1])


BATCH = 256
PAYLOAD = 8192
STEPS = 100


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import ofdm_tpu as ot
    from ofdm_tpu import constants
    from ofdm_tpu.phy.rx import _planar_align, decode_aligned, sync_offset

    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    frame = 880 + nb * 80
    need = frame
    n_chunks = ot.config.DEFAULT_CONFIG.n_sync_chunks + nb
    template = constants.locking_for(ot.config.DEFAULT_CONFIG).astype(
        np.complex64)

    rng = np.random.default_rng(0)
    rxs, datas = [], []
    for i in range(4):
        d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=mod)
        rx = ot.channel(tx, snr=45.0, timing_error=(i > 0),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame - rx.shape[-1]))))
        rxs.append(jax.block_until_ready(rx))
        datas.append(d)

    @jax.jit
    def dec_fused(s):
        aligned = sync_align_pallas(s, template, need)
        out, _ = decode_aligned(aligned, n_chunks=n_chunks, guard_bands=True,
                                modulation=mod)
        return out

    @jax.jit
    def dec_prod(s):
        return ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                               modulation=mod)

    for i, (rx, d) in enumerate(zip(rxs, datas)):
        op = np.asarray(jax.block_until_ready(dec_prod(rx)))
        of = np.asarray(jax.block_until_ready(dec_fused(rx)))
        rows_diff = int(np.count_nonzero(np.any(op != of, axis=-1)))
        # frame-loss rows (CFO aliasing) fail catastrophically in BOTH paths;
        # compare error rows, not raw byte counts
        ep = int(np.count_nonzero(np.any(op[:, 16:16 + PAYLOAD] != d, axis=-1)))
        ef = int(np.count_nonzero(np.any(of[:, 16:16 + PAYLOAD] != d, axis=-1)))
        log(f"batch {i} (cfo={i > 0}): rows differing impl-to-impl={rows_diff}"
            f"  bad-rows prod={ep} fused={ef}")

    for name, dec in (("prod", dec_prod), ("fused", dec_fused)):
        @jax.jit
        def step(s, carry, dec=dec):
            out = dec(s)
            chk = jnp.max(out).astype(jnp.float32)
            return carry + 1.0 + chk * 1e-9

        carry = step(rxs[0], jnp.float32(0.0))
        float(carry)
        t0 = time.perf_counter()
        for i in range(STEPS):
            carry = step(rxs[i % 4], carry)
        float(carry)
        dt = (time.perf_counter() - t0) / STEPS
        n = rxs[0].shape[0] * rxs[0].shape[1]
        log(f"{name:6s}: {dt*1e3:6.3f} ms  {n/dt/1e6:6.0f} MS/s")
    log("DONE")


if __name__ == "__main__":
    main()
