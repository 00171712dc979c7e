"""Round-5 phase-gated measurement harness (VERDICT r4 #1, #2, #3).

Owns the chip for hours, probing the phase with the production headline
step; whenever the band allows it runs same-process interleaved A/Bs of:

HEADLINE (batch 256 x 19120, 64QAM+GB, byte-gated, chained):
  h_complex : decode_frame on the complex64 stream        [round-4: 0.881 ms]
  h_fused   : decode_frame_planar, pinned pre-tiled input [round-4: 0.778 ms]
  h_chunked : decode_frame_planar(align_impl="chunked")   [421 MB/step route,
              never measured in a healthy band]

CONFIG 4 (Hamming streaming presync, 256 frames x 19040, byte-gated):
  s_complex : complex64 stream (the round-4 bench composition) [1.13 ms best]
  s_pl_pl   : pinned planar tiled stream, handoff="planar"
  s_pl_cx   : pinned planar tiled stream, handoff="complex"
  s_pl_sp   : pinned planar tiled stream, handoff="split" (no transpose,
              no interleave — planes feed _derot_matrix_core directly)
  s_pl_asm  : pinned planar tiled stream, ONE fused complex-assembly pass,
              then the s_complex composition (bounds the planar input tax)
  s_plu_asm : UNPINNED planar f32[2, T] stream, assembly + complex path —
              the pin only serves Mosaic consumers; XLA-only paths may pay
              a relayout for it
  s_plu_pl  : UNPINNED planar f32[2, T] stream, handoff="planar"
  s_plt_asm : pinned pre-tiled stream, complex assembled FROM THE TILED
              planes (full-sublane reads; a [2, T] f32 view wastes 6/8
              sublanes per (8,128) tile) — streaming._decode_regular_tiled,
              the round-5 PRODUCTION planar serving composition (measured
              = s_complex; the per-row tile-aligned gather alternative
              measured +0.43 ms and was removed)

Order rotates inside each visit to cancel drift; every measurement is one
JSON line.  Summarize with:
  grep '"ev": "m"' /tmp/r5h.log | python3 tools/exp_r5_report.py

Run:  setsid nohup python3 tools/exp_r5_harness.py > /tmp/r5h.log 2>&1 &
Stop: touch /tmp/r5h.stop
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
from ofdm_tpu.fec import hamming
from ofdm_tpu.phy import streaming as st

BATCH = 256
PAYLOAD = 8192
REPS = 64
HAM_FRAMES = 256
HAM_DATA_BYTES = 4680
HAM_REPS = 24
ROUNDS = 2
HEALTHY_MS = 1.05
MIDGRADE_MS = 1.45
STOP_FILE = "/tmp/r5h.stop"
MAX_HOURS = float(os.environ.get("H_MAX_HOURS", "7"))


def log(obj):
    obj["t"] = time.strftime("%H:%M:%S")
    print(json.dumps(obj), flush=True)


def pin_factory(fmt, uniq=[os.getpid() % 100000 * 1000]):
    """Layout pinning with a GLOBAL HLO uniquifier (CLAUDE.md recipe).
    PID-salted: the persistent compile cache keys executables by HLO and a
    previous process's poisoned (wrong-layout) entries for the same k
    values would otherwise replay verbatim and exhaust the loop."""
    def pin(prep_fn, x, m2m):
        for _ in range(16):
            uniq[0] += 1
            f = jax.jit(lambda s, k=uniq[0]: prep_fn(s, k), out_shardings=fmt)
            out = f(x)
            if tuple(out.format.layout.major_to_minor) == m2m:
                return jax.block_until_ready(out)
        raise RuntimeError("could not pin layout")
    return pin


def build_headline():
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
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
    _, _, _, k_pad = _class_geometry(cfg.sym_len, n_chunks)
    tiles = max(-(-t // 128) + 1, k_pad + 2)
    fmt = ot.planar_input_format()

    def prep(s, k=0):
        p = jnp.pad(jnp.stack([jnp.real(s), jnp.imag(s)], axis=1),
                    ((0, 0), (0, 0), (0, tiles * 128 - t))
                    ).reshape(s.shape[0], 2, tiles, 128)
        return jnp.roll(jnp.roll(p, k, 0), -k, 0) if k else p

    pin = pin_factory(fmt)
    prxs = [pin(prep, rx, (0, 1, 2, 3)) for rx in rxs]

    steps = {}

    def reg(name, fn, shardings, gate_fn, bufs):
        g = np.asarray(gate_fn(bufs[0]))
        errs = int(np.count_nonzero(g[:, 16:16 + PAYLOAD] != datas[0]))
        log({"ev": "gate", "step": name, "byte_errors": errs})
        assert errs == 0, name
        jfn = jax.jit(fn, in_shardings=shardings) if shardings else jax.jit(fn)
        c = jfn(bufs[0], jnp.float32(0.0))
        float(c)
        steps[name] = {"fn": jfn, "carry": c, "bufs": bufs, "reps": REPS}

    def mk(dec):
        def fn(s, carry):
            out = dec(s)
            return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9
        return fn

    dec_cx = lambda s: ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                                       modulation=mod)
    dec_f = lambda s: ot.decode_frame_planar(s, n_blocks=nb, guard_bands=True,
                                             modulation=mod)
    dec_ch = lambda s: ot.decode_frame_planar(s, n_blocks=nb, guard_bands=True,
                                              modulation=mod,
                                              align_impl="chunked")
    reg("h_complex", mk(dec_cx), None, jax.jit(dec_cx), rxs)
    reg("h_fused", mk(dec_f), (fmt, None), jax.jit(dec_f, in_shardings=(fmt,)),
        prxs)
    reg("h_chunked", mk(dec_ch), (fmt, None),
        jax.jit(dec_ch, in_shardings=(fmt,)), prxs)
    n_samples = BATCH * t
    return steps, n_samples


def build_config4():
    mod = ot.Modulation.QAM64
    plen = st.coded_len(HAM_DATA_BYTES, "hamming")
    nb = ot.n_data_blocks(plen, mod, True)
    flen = cfg.sync_len + nb * cfg.sym_len
    spacing = flen
    need = HAM_FRAMES * spacing + cfg.sym_len
    rng = np.random.default_rng(0)
    datas, streams = [], []
    for i in range(2):
        d = rng.integers(0, 256, (HAM_FRAMES, HAM_DATA_BYTES), dtype=np.uint8)
        coded = hamming.encode(jnp.asarray(d))
        tx = ot.encode(np.asarray(coded), guard_bands=True, modulation=mod)
        s = ot.channel(tx.reshape(-1), snr=45.0, key=jax.random.key(i))
        s = jnp.pad(s, (0, max(0, need - s.shape[-1])))
        datas.append(d)
        streams.append(jax.block_until_ready(s))
    t = streams[0].shape[-1]
    tiles = -(-t // 128) + 1
    sfmt = ot.planar_stream_format()

    def prep(s, k=0):
        p = jnp.pad(jnp.stack([jnp.real(s), jnp.imag(s)]),
                    ((0, 0), (0, tiles * 128 - t))).reshape(2, tiles, 128)
        return jnp.roll(jnp.roll(p, k, 1), -k, 1) if k else p

    pin = pin_factory(sfmt)
    pstreams = [pin(prep, s, (0, 1, 2)) for s in streams]

    common = dict(n_frames=HAM_FRAMES, spacing=spacing, need=need, nb=nb,
                  flen=flen, guard_bands=True, modulation=mod, cfg=cfg,
                  payload_len=plen, n_bytes=HAM_DATA_BYTES, fec="hamming")

    def cx_fn(s, carry):
        first = jnp.maximum(
            st._first_sync(s, spacing=spacing, need=need, cfg=cfg),
            0).astype(jnp.int32)
        out = st._extract_and_decode_presync(s, first, **common)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    def pl_fn(handoff):
        def fn(p, carry):
            sp = p.reshape(2, -1)
            first = jnp.maximum(
                st._first_sync_planar(sp, spacing=spacing, need=need, cfg=cfg),
                0).astype(jnp.int32)
            out = st._extract_and_decode_presync_planar(
                sp, first, handoff=handoff, **common)
            return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9
        return fn

    def asm_fn(p, carry):
        # planar input, ONE fused full-stream complex assembly, then the
        # complex composition — bounds the intrinsic planar-input cost
        sp = p.reshape(2, -1)
        s = jax.lax.complex(sp[0], sp[1])
        first = jnp.maximum(
            st._first_sync(s, spacing=spacing, need=need, cfg=cfg),
            0).astype(jnp.int32)
        out = st._extract_and_decode_presync(s, first, **common)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    # unpinned planar [2, T] buffers (XLA-chosen layout)
    upstreams = [jax.block_until_ready(
        jnp.stack([jnp.real(s), jnp.imag(s)])) for s in streams]

    def plt_fn(p, carry):
        out = st._decode_regular_tiled(
            p, n_frames=HAM_FRAMES, spacing=spacing, need=need, nb=nb,
            flen=flen, guard_bands=True, modulation=mod, cfg=cfg,
            payload_len=plen, n_bytes=HAM_DATA_BYTES, fec="hamming",
            resync=False)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    steps = {}

    def reg(name, fn, shardings, bufs, handoff=None):
        jfn = jax.jit(fn, in_shardings=shardings) if shardings else jax.jit(fn)
        # gate: decode once through the library entry and byte-compare
        kw = dict(n_frames=HAM_FRAMES, spacing=spacing, payload_len=plen,
                  guard_bands=True, modulation=mod, fec="hamming",
                  data_len=HAM_DATA_BYTES, resync=False)
        if handoff is not None:
            kw["planar_handoff"] = handoff
        out, _ = st.decode_regular(bufs[0], **kw)
        errs = int(np.count_nonzero(np.asarray(out) != datas[0]))
        log({"ev": "gate", "step": name, "byte_errors": errs})
        assert errs == 0, name
        c = jfn(bufs[0], jnp.float32(0.0))
        float(c)
        steps[name] = {"fn": jfn, "carry": c, "bufs": bufs, "reps": HAM_REPS}

    reg("s_complex", cx_fn, None, streams)
    # sessions 2-4 settled the extractor arms: every planar row-extraction
    # variant (s_pl_pl/cx/sp ~2.4-2.9 ms, s_plu_* ~1.9-2.3) lost to the
    # tiled-assembly composite (s_plt_asm 1.54 = s_complex); they are no
    # longer registered — final numbers in BENCH_ATTEMPTS_r05.json.
    if os.environ.get("H_ALL_ARMS"):
        reg("s_pl_pl", pl_fn("planar"), (sfmt, None), pstreams, "planar")
        reg("s_pl_cx", pl_fn("complex"), (sfmt, None), pstreams, "complex")
        reg("s_pl_sp", pl_fn("split"), (sfmt, None), pstreams, "split")
        reg("s_pl_asm", asm_fn, (sfmt, None), pstreams)
        reg("s_plu_asm", asm_fn, None, upstreams)
        reg("s_plu_pl", pl_fn("planar"), None, upstreams, "planar")
    reg("s_plt_asm", plt_fn, (sfmt, None), pstreams)
    # s_plt_g (tile-aligned per-row gather + bounded re-lock) measured
    # 1.93 vs 1.50 ms in session 5 and was removed with its library
    # route (docs/BENCHMARKS.md "Round 5" item 2)
    n_samples = HAM_FRAMES * flen
    return steps, n_samples


def main():
    t0 = time.time()
    h_steps, h_n = build_headline()
    log({"ev": "built", "what": "headline", "s": time.time() - t0})
    t1 = time.time()
    s_steps, s_n = build_config4()
    log({"ev": "built", "what": "config4", "s": time.time() - t1})
    steps = {**h_steps, **s_steps}
    nsamp = {**{k: h_n for k in h_steps}, **{k: s_n for k in s_steps}}

    def measure(name):
        e = steps[name]
        c = e["carry"]
        bufs = e["bufs"]
        t0 = time.perf_counter()
        for i in range(e["reps"]):
            c = e["fn"](bufs[i % len(bufs)], c)
        float(c)
        e["carry"] = c
        return (time.perf_counter() - t0) / e["reps"]

    def probe():
        return measure("h_fused")

    best = {k: float("inf") for k in steps}
    t_start = time.time()
    visit = 0
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
        visit += 1
        names = list(steps)
        for r in range(ROUNDS):
            order = names[r % len(names):] + names[:r % len(names)]
            if r % 2:
                order = order[::-1]
            res = {}
            for name in order:
                res[name] = measure(name)
                best[name] = min(best[name], res[name])
            log({"ev": "m", "band": band, "visit": visit, "round": r,
                 **{k: v * 1e3 for k, v in res.items()}})
        log({"ev": "best", **{k: v * 1e3 for k, v in best.items()},
             **{f"GSs_{k}": nsamp[k] / v / 1e9 for k, v in best.items()
                if v < float("inf")}})
        time.sleep(30 if band == "HEALTHY" else 75)
    log({"ev": "done", **{k: v * 1e3 for k, v in best.items()}})


if __name__ == "__main__":
    main()
