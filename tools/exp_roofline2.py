"""TPU experiment: decompose decode_aligned against the roofline (round 3).

exp_roofline.py put the whole chain at 0.90 ms with sync+align at ~1.5x its
HBM floor; the remaining gap lives in decode_aligned (0.68 ms vs ~0.3 ms of
unavoidable traffic).  This measures chained variants to attribute it:
DFT precision ladder, CFO estimator, demod tail, and a no-guard-band
control.  All chained cache-proof (carry over decoded bytes).

Run nohup'd:
  setsid nohup python3 tools/exp_roofline2.py > /tmp/exp_roofline2.log 2>&1 &
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
from ofdm_tpu.kernels.align_pallas import sync_align
from ofdm_tpu.phy.rx import decode_aligned
from ofdm_tpu import constants

BATCH = 256
PAYLOAD = 8192
REPS = 80


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def chained(fn, inputs, data=None, reps=REPS):
    @jax.jit
    def step(x, carry):
        out = fn(x)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    carry = step(inputs[0], jnp.float32(0.0))
    float(carry)
    t0 = time.perf_counter()
    for i in range(reps):
        carry = step(inputs[i % len(inputs)], carry)
    float(carry)
    return (time.perf_counter() - t0) / reps


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    n_chunks = cfg.n_sync_chunks + nb
    frame = n_chunks * 80

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
    aligneds = [jax.block_until_ready(
        jax.jit(lambda s: sync_align(s, tpl, frame))(r)) for r in rxs]

    res = {}

    def full(s):
        return ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                               modulation=mod)
    res["full_ms"] = chained(full, rxs) * 1e3
    log(f"full decode_frame:             {res['full_ms']:.3f} ms "
        f"({n_samples/res['full_ms']/1e6:.2f} GS/s)")

    for name, kw in [
        ("dec_highest", dict(cfo_estimator="coherent")),
        ("dec_high", dict(cfo_estimator="coherent",
                          dft_precision=jax.lax.Precision.HIGH)),
        ("dec_default", dict(cfo_estimator="coherent",
                             dft_precision=jax.lax.Precision.DEFAULT)),
        ("dec_ref_cfo", dict(cfo_estimator="reference")),
        ("dec_pallas_tail", dict(cfo_estimator="coherent",
                                 demod_impl="pallas")),
    ]:
        def dec(a, kw=kw):
            return decode_aligned(a, n_chunks=n_chunks, guard_bands=True,
                                  modulation=mod, **kw)[0]
        res[name] = chained(dec, aligneds) * 1e3
        log(f"decode_aligned {name:16s} {res[name]:.3f} ms")

    # byte parity of the precision ladder on the clean batch
    outs = {}
    for name, prec in [("highest", None),
                       ("high", jax.lax.Precision.HIGH),
                       ("default", jax.lax.Precision.DEFAULT)]:
        o, _ = decode_aligned(aligneds[0], n_chunks=n_chunks, guard_bands=True,
                              modulation=mod, cfo_estimator="coherent",
                              dft_precision=prec)
        outs[name] = np.asarray(o)[:, 16:16 + PAYLOAD]
    for name in ("highest", "high", "default"):
        errs = int(np.count_nonzero(outs[name] != datas[0]))
        res[f"errs_{name}"] = errs
        log(f"byte errors clean batch, dft={name}: {errs}")

    # derotate-only pass (chunks in, rotated chunks consumed by max)
    def derot(a):
        ch = a.reshape(BATCH, n_chunks, 80)
        from ofdm_tpu.phy.rx import _cfo_estimate
        f = _cfo_estimate(ch, cfg, "coherent")
        rd = jnp.float32
        pc = jnp.exp(jax.lax.complex(jnp.zeros((), rd), rd(-1.0))
                     * (f[:, None] * jnp.arange(n_chunks, dtype=rd) * 80))
        pj = jnp.exp(jax.lax.complex(jnp.zeros((), rd), rd(-1.0))
                     * (f[:, None] * jnp.arange(80, dtype=rd)))
        out = ch * (pc[:, :, None] * pj[:, None, :]).astype(ch.dtype)
        return jnp.real(out)
    res["derotate_consumed_ms"] = chained(derot, aligneds) * 1e3
    log(f"derotate (+max consume):       {res['derotate_consumed_ms']:.3f} ms")

    print("\nRESULTS " + json.dumps(res))
    log("DONE")


if __name__ == "__main__":
    main()
