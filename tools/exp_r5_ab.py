"""Round-5 healthy-band A/B: chunked route vs fused planar route (VERDICT r4 #1).

The 421 MB/step slot-major CHUNKED composition (align_impl="chunked",
kernels/chain_pallas.sync_align_chunked + decode_chunked_matrix) was never
validated in a healthy chip band in round 4 — every A/B landed in the
~1.2 ms mid-grade window where the traffic win hides under the dispatch
floor.  This harness owns the chip for hours: it probes the phase with the
production headline step, and whenever the band is good enough it runs a
same-process interleaved A/B of

  A = decode_frame_planar(pinned pre-tiled planes)            [fused, 578 MB/step]
  B = decode_frame_planar(..., align_impl="chunked")          [chunked, 421 MB/step]

both byte-gated, both dependency-chained (CLAUDE.md methodology), order
alternated per round to cancel drift.  Each measurement block is one JSON
line in the log; tools/exp_r5_ab_report.py summarizes.

Run:  setsid nohup python3 tools/exp_r5_ab.py > /tmp/ab_r5.log 2>&1 &
Stop: touch /tmp/ab_r5.stop   (clean exit at the next loop boundary)
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

BATCH = 256
PAYLOAD = 8192
REPS = 64
ROUNDS = 3              # (A,B) measurement pairs per healthy window visit
HEALTHY_MS = 1.05       # full A/B band (healthy ~0.875, mid-grade ~1.2)
MIDGRADE_MS = 1.45      # still record (flagged) A/Bs up to here
STOP_FILE = "/tmp/ab_r5.stop"
MAX_HOURS = float(os.environ.get("AB_MAX_HOURS", "7"))


def log(obj):
    obj["t"] = time.strftime("%H:%M:%S")
    print(json.dumps(obj), flush=True)


def main():
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    from ofdm_tpu.config import DEFAULT_CONFIG as cfg
    from ofdm_tpu.kernels.chain_pallas import _class_geometry
    n_chunks = cfg.n_sync_chunks + nb
    frame = n_chunks * cfg.sym_len

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
    t = rxs[0].shape[-1]
    n_samples = BATCH * t

    _, _, _, k_pad = _class_geometry(cfg.sym_len, n_chunks)
    tiles = max(-(-t // 128) + 1, k_pad + 2)
    fmt = ot.planar_input_format()

    def prep_fn(s, k=0):
        p = jnp.pad(jnp.stack([jnp.real(s), jnp.imag(s)], axis=1),
                    ((0, 0), (0, 0), (0, tiles * 128 - t))
                    ).reshape(s.shape[0], 2, tiles, 128)
        return jnp.roll(jnp.roll(p, k, 0), -k, 0) if k else p

    uniq = [0]

    def pin(rx):
        for _ in range(16):
            uniq[0] += 1
            f = jax.jit(lambda s, k=uniq[0]: prep_fn(s, k), out_shardings=fmt)
            out = f(rx)
            if tuple(out.format.layout.major_to_minor) == (0, 1, 2, 3):
                return jax.block_until_ready(out)
        raise RuntimeError("could not pin planar buffer layout")

    prxs = [pin(rx) for rx in rxs]
    log({"ev": "pinned", "tiles": tiles})

    def make_step(align_impl):
        def fn(s, carry):
            out = ot.decode_frame_planar(s, n_blocks=nb, guard_bands=True,
                                         modulation=mod,
                                         align_impl=align_impl)
            return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9
        return jax.jit(fn, in_shardings=(fmt, None))

    steps = {"fused": make_step("auto"), "chunked": make_step("chunked")}

    # byte gates + compile
    for name, impl in (("fused", "auto"), ("chunked", "chunked")):
        g = jax.jit(lambda s, i=impl: ot.decode_frame_planar(
            s, n_blocks=nb, guard_bands=True, modulation=mod, align_impl=i),
            in_shardings=(fmt,))
        out = np.asarray(g(prxs[0]))
        errs = int(np.count_nonzero(out[:, 16:16 + PAYLOAD] != datas[0]))
        log({"ev": "gate", "impl": name, "byte_errors": errs})
        assert errs == 0, f"{name}: {errs} byte errors"

    carries = {k: jnp.float32(0.0) for k in steps}
    for k in steps:                      # warm the chained step graphs
        carries[k] = steps[k](prxs[0], carries[k])
        float(carries[k])

    def measure(name, reps=REPS):
        st = steps[name]
        c = carries[name]
        t0 = time.perf_counter()
        for i in range(reps):
            c = st(prxs[i % 4], c)
        float(c)
        carries[name] = c
        return (time.perf_counter() - t0) / reps

    def probe():
        return measure("fused", 16)

    t_start = time.time()
    best = {"fused": float("inf"), "chunked": float("inf")}
    while time.time() - t_start < MAX_HOURS * 3600:
        if os.path.exists(STOP_FILE):
            log({"ev": "stop_file"})
            break
        p = probe()
        band = ("HEALTHY" if p < HEALTHY_MS * 1e-3 else
                "MIDGRADE" if p < MIDGRADE_MS * 1e-3 else "DEGRADED")
        log({"ev": "probe", "ms": p * 1e3, "band": band})
        if band == "DEGRADED":
            time.sleep(90)
            continue
        for r in range(ROUNDS):
            order = ("fused", "chunked") if r % 2 == 0 else ("chunked", "fused")
            res = {}
            for name in order:
                res[name] = measure(name)
            for name, dt in res.items():
                best[name] = min(best[name], dt)
            log({"ev": "ab", "band": band, "round": r,
                 "order": "->".join(order),
                 "fused_ms": res["fused"] * 1e3,
                 "chunked_ms": res["chunked"] * 1e3,
                 "delta_ms": (res["chunked"] - res["fused"]) * 1e3,
                 "fused_GSs": n_samples / res["fused"] / 1e9,
                 "chunked_GSs": n_samples / res["chunked"] / 1e9})
        log({"ev": "best_so_far",
             "fused_ms": best["fused"] * 1e3,
             "chunked_ms": best["chunked"] * 1e3})
        time.sleep(30 if band == "HEALTHY" else 75)
    log({"ev": "done", "best_fused_ms": best["fused"] * 1e3,
         "best_chunked_ms": best["chunked"] * 1e3})


if __name__ == "__main__":
    main()
