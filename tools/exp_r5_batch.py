"""Round-5 batch retune of the pinned-planar fused headline route.

Batch 256 was tuned in round 2 (pre-SoA demod) and re-confirmed in round 3
on the COMPLEX route; the production route is now the pinned-planar fused
composition with a leaner tail — the VMEM/dispatch balance may have moved.
Phase-gated sweep of batch in {192, 256, 320, 384}, per-SAMPLE rate
compared, chained + byte-gated, same methodology as exp_r5_harness.

Run:  setsid nohup python3 tools/exp_r5_batch.py > /tmp/r5b.log 2>&1 &
Stop: touch /tmp/r5b.stop
"""

from __future__ import annotations

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

PAYLOAD = 8192
BATCHES = (192, 256, 320, 384)
ROUNDS = 2
HEALTHY_MS = 1.05 / 256   # per-row threshold (scaled per batch below)
STOP_FILE = "/tmp/r5b.stop"
MAX_HOURS = float(os.environ.get("B_MAX_HOURS", "4"))


def log(obj):
    obj["t"] = time.strftime("%H:%M:%S")
    print(json.dumps(obj), flush=True)


def main():
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    from ofdm_tpu.kernels.chain_pallas import _class_geometry
    n_chunks = cfg.n_sync_chunks + nb
    frame = n_chunks * cfg.sym_len
    fmt = ot.planar_input_format()
    uniq = [os.getpid() % 100000 * 1000]

    steps = {}
    rng = np.random.default_rng(0)
    for batch in BATCHES:
        datas, bufs = [], []
        _, _, _, k_pad = _class_geometry(cfg.sym_len, n_chunks)
        for i in range(2):
            d = rng.integers(0, 256, (batch, PAYLOAD), dtype=np.uint8)
            tx = ot.encode(d, guard_bands=True, modulation=mod)
            rx = ot.channel(tx, snr=45.0, timing_error=(i > 0),
                            key=jax.random.key(batch + i))
            rx = jnp.pad(rx, ((0, 0),
                              (0, max(0, frame + 80 - rx.shape[-1]))))
            t = rx.shape[-1]
            tiles = max(-(-t // 128) + 1, k_pad + 2)

            def prep(s, k=0, tiles=tiles, t=t):
                p = jnp.pad(jnp.stack([jnp.real(s), jnp.imag(s)], axis=1),
                            ((0, 0), (0, 0), (0, tiles * 128 - t))
                            ).reshape(s.shape[0], 2, tiles, 128)
                return jnp.roll(jnp.roll(p, k, 0), -k, 0) if k else p

            pinned = None
            for _ in range(16):
                uniq[0] += 1
                f = jax.jit(lambda s, k=uniq[0]: prep(s, k),
                            out_shardings=fmt)
                out = f(rx)
                if tuple(out.format.layout.major_to_minor) == (0, 1, 2, 3):
                    pinned = jax.block_until_ready(out)
                    break
            assert pinned is not None, "pin failed"
            datas.append(d)
            bufs.append(pinned)

        dec = jax.jit(lambda s: ot.decode_frame_planar(
            s, n_blocks=nb, guard_bands=True, modulation=mod),
            in_shardings=(fmt,))
        g = np.asarray(dec(bufs[0]))
        errs = int(np.count_nonzero(g[:, 16:16 + PAYLOAD] != datas[0]))
        log({"ev": "gate", "batch": batch, "byte_errors": errs})
        assert errs == 0

        def fn(s, carry):
            out = ot.decode_frame_planar(s, n_blocks=nb, guard_bands=True,
                                         modulation=mod)
            return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

        jfn = jax.jit(fn, in_shardings=(fmt, None))
        c = jfn(bufs[0], jnp.float32(0.0))
        float(c)
        n_samples = batch * bufs[0].shape[-2] * 128
        # equal per-arm sample budget: reps scale inversely with batch
        reps = max(16, int(round(64 * 256 / batch)))
        steps[batch] = {"fn": jfn, "carry": c, "bufs": bufs, "reps": reps,
                        "n_samples": batch * frame}
    log({"ev": "built"})

    def measure(batch):
        e = steps[batch]
        c = e["carry"]
        t0 = time.perf_counter()
        for i in range(e["reps"]):
            c = e["fn"](e["bufs"][i % 2], c)
        float(c)
        e["carry"] = c
        return (time.perf_counter() - t0) / e["reps"]

    best = {b: float("inf") for b in BATCHES}
    t_start = time.time()
    while time.time() - t_start < MAX_HOURS * 3600:
        if os.path.exists(STOP_FILE):
            log({"ev": "stop_file"})
            break
        p = measure(256)
        band = ("HEALTHY" if p < 1.05e-3 else
                "MIDGRADE" if p < 1.45e-3 else "DEGRADED")
        log({"ev": "probe", "ms": p * 1e3, "band": band})
        if band == "DEGRADED":
            time.sleep(90)
            continue
        for r in range(ROUNDS):
            order = list(BATCHES) if r % 2 == 0 else list(BATCHES)[::-1]
            res = {}
            for b in order:
                res[b] = measure(b)
                best[b] = min(best[b], res[b])
            log({"ev": "m", "band": band, "round": r,
                 **{f"b{b}_ms": res[b] * 1e3 for b in BATCHES},
                 **{f"b{b}_GSs": steps[b]["n_samples"] / res[b] / 1e9
                    for b in BATCHES}})
        log({"ev": "best",
             **{f"b{b}_GSs": steps[b]["n_samples"] / best[b] / 1e9
                for b in BATCHES if best[b] < float("inf")}})
        time.sleep(30 if band == "HEALTHY" else 75)
    log({"ev": "done",
         **{f"b{b}_GSs": steps[b]["n_samples"] / best[b] / 1e9
            for b in BATCHES if best[b] < float("inf")}})


if __name__ == "__main__":
    main()
