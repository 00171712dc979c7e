"""Round benchmark: BASELINE configs 2 / 4 / 5 on the attached chip.

Prints ONE JSON line whose headline metric is the config-2 aggregate 64QAM
receive-chain throughput per chip (frame sync, CFO, channel estimation,
equalization, pilot phase, demod, packing); `detail.configs` carries the
config-4 (Hamming-coded streaming) and config-5 (sustained serving
composition with the RS + colorspace host tail) numbers, each with its own
attempt history so round-over-round regressions on those paths are
machine-tracked (VERDICT r3 #4).

Methodology (CLAUDE.md):
- dependency-chained cache-proof timing: step i's input mixes a carry
  scalar from step i-1's output (+1 per step) so no dispatch repeats and
  no runtime result cache or lazy-execution shortcut can elide device work;
  fetching the final carry forces the whole chain.
- correctness gates every number (decoded payloads byte-equal to tx).
- the chip has DEGRADED phases (multi-ms noisy dispatch overhead for
  minutes-to-hours); every config retries through them and reports its
  attempt history.

Baseline: the north-star target of 10 Gsamples/s aggregate on a 16-chip
v5p slice = 625 Msamples/s/chip (BASELINE.md; the reference publishes no
numbers — its README.md:5 throughput claim is a literal placeholder).
"""

from __future__ import annotations

import json
import os
import subprocess
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BASELINE_PER_CHIP = 10e9 / 16  # north star: 10 GS/s on v5p-16

BATCH = 256
PAYLOAD = 8192
N_INPUTS = 4
REPS = 100

# config 4 (Hamming streaming, tools/exp_hamming_tpu.py shape)
HAM_FRAMES = 256
HAM_DATA_BYTES = 4680
HAM_REPS = 30

# config 5 (serving composition, tools/exp_serving.py shape, device-resident)
SRV_DISTINCT = 4
SRV_ROUNDS = 3
SRV_FRAMES = 390          # ~1M samples/buffer keeps pregeneration quick
SRV_IN_FLIGHT = 4
SRV_W = SRV_H = 24
SRV_USER = SRV_W * SRV_H

# Per-config retry thresholds: 1.3x each path's documented best
# (docs/BENCHMARKS.md; VERDICT r4 #3 — a flat threshold let mid-grade
# placements pass as round records).  A measurement above its threshold
# retries through the degraded window; the attempt history is always
# reported either way.
THRESH = {
    "headline_complex": 0.881e-3 * 1.3,
    "headline_planar": 0.778e-3 * 1.3,
    "hamming": 1.13e-3 * 1.3,
    "serving": 0.068 * 1.3,
}

ATTEMPTS_FILE = os.environ.get("BENCH_ATTEMPTS_FILE", "BENCH_ATTEMPTS_r05.json")

# Config-4/5 planar-input composition (round-5 harness A/B,
# tools/exp_r5_harness.py sessions 2-4): every planar row-extraction
# variant (handoff planar/complex/split, pinned or not) lost ~0.5-0.9 ms
# /step to the complex path — a flat f32[2, T] stream reads at 2/8
# sublane density.  The production planar route assembles complex64 FROM
# the full-sublane [2, tiles, 128] tiled planes in the same jit graph
# (streaming._decode_regular_tiled) and runs the complex composition.


def _record_attempt(record):
    """Append this process's numbers to the round attempts file (fresh-
    process history: chip placement is fixed per process, so in-process
    retries cannot escape a bad placement — the file shows what the chip
    actually offered across the round)."""
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ATTEMPTS_FILE)
        doc = {"what": "Fresh-process attempts across the round-5 session "
                       "(chained cache-proof, byte-gated).  Appended by "
                       "bench.py per run; harness entries merged from "
                       "tools/exp_r5_harness.py logs.",
               "attempts": []}
        if os.path.exists(path):
            with open(path) as f:
                doc = json.load(f)
        doc.setdefault("attempts", []).append(record)
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")
    except Exception:
        pass               # the attempts file must never sink the bench


def _retry(measure, threshold_s, is_cpu, max_tries=6, sleep_s=60):
    """Measure; retry through degraded windows; return (best, attempts)."""
    attempts = [measure()]
    tries = 0
    while attempts[-1] > threshold_s and tries < max_tries and not is_cpu:
        time.sleep(sleep_s)
        attempts.append(measure())
        tries += 1
    return min(attempts), attempts


def bench_headline(jax, jnp, ot):
    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    frame = 880 + nb * 80

    rng = np.random.default_rng(0)
    datas, rxs = [], []
    for i in range(N_INPUTS):
        d = rng.integers(0, 256, (BATCH, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=mod)
        # correctness batch (i=0) has no CFO; the rest exercise the CFO path
        rx = ot.channel(tx, snr=45.0, timing_error=(i > 0),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame - rx.shape[-1]))))
        datas.append(d)
        rxs.append(jax.block_until_ready(rx))
    n_samples = rxs[0].shape[0] * rxs[0].shape[1]

    decode = jax.jit(lambda s: ot.decode_frame(
        s, n_blocks=nb, guard_bands=True, modulation=mod))

    out0 = jax.block_until_ready(decode(rxs[0]))  # compile + warm
    errs = int(np.count_nonzero(np.asarray(out0)[:, 16:16 + PAYLOAD]
                                != datas[0]))

    @jax.jit
    def step(s, carry):
        out = decode(s)
        chk = jnp.max(out).astype(jnp.float32)
        return carry + 1.0 + chk * 1e-9

    carry_box = [step(rxs[0], jnp.float32(0.0))]
    float(carry_box[0])

    def measure():
        t0 = time.perf_counter()
        c = carry_box[0]
        for i in range(REPS):
            c = step(rxs[i % N_INPUTS], c)
        float(c)
        carry_box[0] = c
        return (time.perf_counter() - t0) / REPS

    dt, attempts = _retry(measure, THRESH["headline_complex"],
                          jax.default_backend() == "cpu")

    # planar-input serving variant: the stream as pre-tiled f32 planes with
    # the row-major layout pinned (ot.planar_input_format) — what a capture
    # pipeline actually uploads (complex h2d is UNIMPLEMENTED on this
    # runtime; transfers travel as planes).  Removes every input-side copy
    # of the complex path (round-4 HLO audit: 197 MB/step fewer writes).
    planar = None
    try:
        from ofdm_tpu.config import DEFAULT_CONFIG as _cfg
        from ofdm_tpu.kernels.chain_pallas import _class_geometry
        t = rxs[0].shape[-1]
        _, _, _, k_pad = _class_geometry(_cfg.sym_len,
                                         _cfg.n_sync_chunks + nb)
        tiles = max(-(-t // 128) + 1, k_pad + 2)
        shardings = (ot.planar_input_format(), None) \
            if jax.default_backend() == "tpu" else None

        def prep_fn(s, k=0):
            p = jnp.pad(jnp.stack([jnp.real(s), jnp.imag(s)], axis=1),
                        ((0, 0), (0, 0), (0, tiles * 128 - t))
                        ).reshape(s.shape[0], 2, tiles, 128)
            # the roll/unroll no-op makes each retry's HLO unique: the
            # remote compile helper caches executables keyed on HLO but
            # not on the requested output layout, so identical-HLO
            # requests with different layouts collide nondeterministically
            return jnp.roll(jnp.roll(p, k, 0), -k, 0) if k else p

        uniq = [os.getpid() % 100000 * 1000]
        # GLOBAL across buffers AND PID-salted: per-call counters reuse
        # HLO keys; the persistent compile cache replays a previous
        # process's poisoned (wrong-layout) executables for the same keys

        def pin(rx):
            for _ in range(16):
                uniq[0] += 1
                f = jax.jit(lambda s, k=uniq[0]: prep_fn(s, k),
                            out_shardings=shardings[0] if shardings else None)
                out = f(rx)
                if not shardings or tuple(
                        out.format.layout.major_to_minor) == (0, 1, 2, 3):
                    return jax.block_until_ready(out)
            raise RuntimeError("could not pin planar buffer layout")

        prxs = [pin(rx) for rx in rxs]

        def pstep_fn(s, carry):
            # pinned planar input + the fused sync+align route — the
            # best-measured configuration on-chip (the chunked kernel
            # output saves more HBO writes structurally but its extra
            # per-program work loses in dispatch-floored windows)
            out = ot.decode_frame_planar(s, n_blocks=nb, guard_bands=True,
                                         modulation=mod)
            return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

        pstep = jax.jit(pstep_fn, in_shardings=shardings) if shardings \
            else jax.jit(pstep_fn)
        pout = np.asarray(jax.jit(lambda s: ot.decode_frame_planar(
            s, n_blocks=nb, guard_bands=True, modulation=mod))(prxs[0]))
        perrs = int(np.count_nonzero(pout[:, 16:16 + PAYLOAD] != datas[0]))
        assert perrs == 0, f"planar route: {perrs} byte errors"
        pc = [pstep(prxs[0], jnp.float32(0.0))]
        float(pc[0])

        def pmeasure():
            t0 = time.perf_counter()
            c = pc[0]
            for i in range(REPS):
                c = pstep(prxs[i % N_INPUTS], c)
            float(c)
            pc[0] = c
            return (time.perf_counter() - t0) / REPS

        pdt, pattempts = _retry(pmeasure, THRESH["headline_planar"],
                                jax.default_backend() == "cpu",
                                max_tries=4)
        planar = {"seconds_per_step": pdt,
                  "samples_per_s": n_samples / pdt,
                  "attempts_seconds_per_step": pattempts}
    except Exception as e:
        planar = {"error": repr(e)[:300]}

    # single-call blocking latency (forced per call via the carry fetch)
    t1 = time.perf_counter()
    c = carry_box[0]
    for i in range(5):
        c = step(rxs[i % N_INPUTS], c)
        float(c)
    lat = (time.perf_counter() - t1) / 5

    return {
        "value": n_samples / dt,
        "detail": {
            "batch": BATCH, "frame_samples": int(rxs[0].shape[1]),
            "payload_bytes": PAYLOAD, "byte_errors_clean_batch": errs,
            "seconds_per_step": dt, "blocking_latency_s": lat,
            "attempts_seconds_per_step": attempts,
            "planar_serving_input": planar,
        },
    }


def bench_hamming(jax, jnp, ot):
    """Config 4: Hamming-coded continuous streaming (presync extract)."""
    from ofdm_tpu.config import DEFAULT_CONFIG as cfg
    from ofdm_tpu.fec import hamming
    from ofdm_tpu.phy import streaming as st

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
    n_samples = HAM_FRAMES * flen

    @jax.jit
    def step(s, carry):
        first = jnp.maximum(
            st._first_sync(s, spacing=spacing, need=need, cfg=cfg),
            0).astype(jnp.int32)
        out = st._extract_and_decode_presync(
            s, first, n_frames=HAM_FRAMES, spacing=spacing, need=need,
            nb=nb, flen=flen, guard_bands=True, modulation=mod, cfg=cfg,
            payload_len=plen, n_bytes=HAM_DATA_BYTES, fec="hamming")
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9, out

    carry, out0 = step(streams[0], jnp.float32(0.0))
    errs = int(np.count_nonzero(np.asarray(out0) != datas[0]))
    carry_box = [carry]

    def measure():
        c = carry_box[0]
        t0 = time.perf_counter()
        for i in range(HAM_REPS):
            c, _ = step(streams[i % 2], c)
        float(c)
        carry_box[0] = c
        return (time.perf_counter() - t0) / HAM_REPS

    dt, attempts = _retry(measure, THRESH["hamming"],
                          jax.default_backend() == "cpu")

    # planar-pinned input variant (VERDICT r4 #2): captures arrive as fc32
    # planes from the native deinterleaver — the honest serving interface.
    # Pre-tiled f32[2, tiles, 128] pinned row-major; the presync extractor
    # runs fully planar (handoff per the round-5 harness A/B).
    planar = None
    try:
        t = streams[0].shape[-1]
        tiles = -(-t // 128) + 1
        sfmt = ot.planar_stream_format() \
            if jax.default_backend() == "tpu" else None

        def prep_fn(s, k=0):
            p = jnp.pad(jnp.stack([jnp.real(s), jnp.imag(s)]),
                        ((0, 0), (0, tiles * 128 - t))).reshape(2, tiles, 128)
            return jnp.roll(jnp.roll(p, k, 1), -k, 1) if k else p

        uniq = [os.getpid() % 100000 * 1000 + 250]

        def pin(s):
            for _ in range(16):
                uniq[0] += 1
                f = jax.jit(lambda x, k=uniq[0]: prep_fn(x, k),
                            out_shardings=sfmt)
                out = f(s)
                if sfmt is None or tuple(
                        out.format.layout.major_to_minor) == (0, 1, 2):
                    return jax.block_until_ready(out)
            raise RuntimeError("could not pin planar stream layout")

        pstreams = [pin(s) for s in streams]

        def pstep_fn(p, carry):
            out = st._decode_regular_tiled(
                p, n_frames=HAM_FRAMES, spacing=spacing, need=need,
                nb=nb, flen=flen, guard_bands=True, modulation=mod, cfg=cfg,
                payload_len=plen, n_bytes=HAM_DATA_BYTES, fec="hamming",
                resync=False)
            return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9, out

        pstep = jax.jit(pstep_fn, in_shardings=(sfmt, None)) if sfmt \
            else jax.jit(pstep_fn)
        pc, pout0 = pstep(pstreams[0], jnp.float32(0.0))
        perrs = int(np.count_nonzero(np.asarray(pout0) != datas[0]))
        assert perrs == 0, f"planar streaming route: {perrs} byte errors"
        pbox = [pc]

        def pmeasure():
            c = pbox[0]
            t0 = time.perf_counter()
            for i in range(HAM_REPS):
                c, _ = pstep(pstreams[i % 2], c)
            float(c)
            pbox[0] = c
            return (time.perf_counter() - t0) / HAM_REPS

        pdt, pattempts = _retry(pmeasure, THRESH["hamming"],
                                jax.default_backend() == "cpu", max_tries=4)
        planar = {"seconds_per_step": pdt,
                  "samples_per_s": n_samples / pdt,
                  "composition": "tiled-assembly (_decode_regular_tiled)",
                  "attempts_seconds_per_step": pattempts}
    except Exception as e:
        planar = {"error": repr(e)[:300]}

    return {
        "metric": "samples/s/chip (64QAM hamming streaming presync)",
        "value": n_samples / dt,
        "unit": "samples/s",
        "vs_baseline": n_samples / dt / BASELINE_PER_CHIP,
        "detail": {"n_frames": HAM_FRAMES, "frame_samples": flen,
                   "data_bytes": HAM_DATA_BYTES, "wire_bytes": plen,
                   "user_byte_errors_clean_batch": errs,
                   "user_GBps": HAM_FRAMES * HAM_DATA_BYTES / dt / 1e9,
                   "seconds_per_step": dt,
                   "attempts_seconds_per_step": attempts,
                   "planar_pinned_input": planar},
    }


def bench_serving(jax, jnp, ot):
    """Config 5: sustained serving composition — device-resident buffers,
    >= 4 in flight, host tail = batched RS(255,223) + xterm-256 colorspace.
    Wall-clock includes the host tail; every image frame byte-checked.

    Round-5 composition (VERDICT r4 #4): the decode graph slices the RS
    payload region ON DEVICE (header + padding never cross the tunnel),
    per-buffer fetches + host tails run on worker threads overlapped with
    the next buffers' dispatches, and a device-resident sustained number
    (outputs consumed on device, no per-buffer fetch) is recorded next to
    the d2h-included one."""
    import collections
    from concurrent.futures import ThreadPoolExecutor

    from ofdm_tpu.config import DEFAULT_CONFIG as cfg
    from ofdm_tpu.core.transfer import to_device, to_host
    from ofdm_tpu.fec import reed_solomon as rs
    from ofdm_tpu.packets.colors import id_to_rgb
    from ofdm_tpu.packets.header import HEADER_LEN
    from ofdm_tpu.phy import streaming as st
    from ofdm_tpu.phy.streaming import _extract_and_decode, _first_sync

    mod = ot.Modulation.QAM64
    payload_len = (SRV_USER // rs.K + 1) * rs.N
    nb = ot.n_data_blocks(payload_len, mod, True)
    flen = cfg.sync_len + nb * cfg.sym_len
    spacing = flen
    buffer_len = SRV_FRAMES * spacing + 2 * cfg.sym_len
    need = SRV_FRAMES * spacing + cfg.sym_len

    rng = np.random.default_rng(5)
    pixels = rng.integers(0, 256, (SRV_DISTINCT, SRV_FRAMES, SRV_USER),
                          dtype=np.uint8)
    dev_bufs, truth = [], []
    for b in range(SRV_DISTINCT):
        coded = np.stack([rs.encode_stream(pixels[b, f])
                          for f in range(SRV_FRAMES)])
        tx = ot.encode(jnp.asarray(coded), guard_bands=True, modulation=mod)
        stream = tx.reshape(-1)
        stream = jnp.pad(stream, (0, buffer_len - stream.shape[-1]))
        rxs = ot.channel(stream, snr=45.0, timing_error=(b % 2 == 1),
                         key=jax.random.key(100 + b))
        dev_bufs.append(jax.block_until_ready(
            to_device(np.ascontiguousarray(to_host(rxs)))))
        truth.append(pixels[b])
    n_samples = int(dev_bufs[0].size)
    n_buffers = SRV_ROUNDS * SRV_DISTINCT

    @jax.jit
    def serve(s, carry):
        s = s + (carry * np.float32(1e-30)).astype(s.dtype)
        first = jnp.maximum(
            _first_sync(s, spacing=spacing, need=need, cfg=cfg),
            0).astype(jnp.int32)
        out = _extract_and_decode(
            s, first, n_frames=SRV_FRAMES, spacing=spacing, need=need,
            nb=nb, flen=flen, guard_bands=True, modulation=mod, cfg=cfg)
        # device-side payload slice: only the RS code bytes ever cross the
        # tunnel (the header + demod padding stay on device)
        raw = out[:, HEADER_LEN:HEADER_LEN + payload_len]
        return raw, carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    def process(raw_np, b_idx):
        data, ok = rs.decode_payload_rows(raw_np, SRV_USER)
        _ = id_to_rgb(data.reshape(-1)).reshape(SRV_FRAMES, SRV_H, SRV_W, 3)
        return bool(ok.all()) and np.array_equal(data, truth[b_idx])

    def fetch_and_process(o, b_idx):
        return process(np.asarray(o), b_idx)

    carry = jnp.float32(0.0)
    out, carry = serve(dev_bufs[0], carry)     # compile + warm
    t0 = time.perf_counter()
    out_np = np.asarray(out)
    d2h_s = time.perf_counter() - t0           # sliced-payload fetch cost
    assert process(out_np, 0)

    def measure():
        """d2h-included wall clock: fetch + RS tail on worker threads,
        overlapped with the in-flight dispatch window."""
        nonlocal carry
        bad = 0
        futures = collections.deque()
        with ThreadPoolExecutor(max_workers=2) as ex:
            t0 = time.perf_counter()
            for i in range(n_buffers):
                o, c2 = serve(dev_bufs[i % SRV_DISTINCT], carry)
                carry = c2
                futures.append(ex.submit(fetch_and_process, o,
                                         i % SRV_DISTINCT))
                while len(futures) > SRV_IN_FLIGHT:
                    bad += not futures.popleft().result()
            while futures:
                bad += not futures.popleft().result()
            wall = time.perf_counter() - t0
        assert bad == 0, f"{bad} serving buffers failed byte check"
        return wall / n_buffers

    def measure_device_resident():
        """Sustained decode rate with outputs consumed on device (the
        direct-attached deployment shape: a colocated consumer reads the
        payload bytes without crossing this tunnel).  The carry chain
        forces every buffer's full decode."""
        nonlocal carry
        t0 = time.perf_counter()
        for i in range(n_buffers):
            _, carry = serve(dev_bufs[i % SRV_DISTINCT], carry)
        float(carry)
        return (time.perf_counter() - t0) / n_buffers

    dt, attempts = _retry(measure, THRESH["serving"],
                          jax.default_backend() == "cpu", max_tries=3)
    dev_dt, dev_attempts = _retry(
        measure_device_resident, THRESH["serving"],
        jax.default_backend() == "cpu", max_tries=2)

    # planar-pinned input variant: buffers upload as pre-tiled f32 planes
    # (the native fc32 deinterleaver's output — no complex assembly on
    # either side of the PCIe/tunnel), per-row resync via the fused kernel.
    planar = None
    try:
        t = int(dev_bufs[0].shape[-1])
        tiles = -(-t // 128) + 1
        sfmt = ot.planar_stream_format() \
            if jax.default_backend() == "tpu" else None

        def prep_fn(s, k=0):
            p = jnp.pad(jnp.stack([jnp.real(s), jnp.imag(s)]),
                        ((0, 0), (0, tiles * 128 - t))).reshape(2, tiles, 128)
            return jnp.roll(jnp.roll(p, k, 1), -k, 1) if k else p

        uniq = [os.getpid() % 100000 * 1000 + 500]

        def pin(s):
            for _ in range(16):
                uniq[0] += 1
                f = jax.jit(lambda x, k=uniq[0]: prep_fn(x, k),
                            out_shardings=sfmt)
                o = f(s)
                if sfmt is None or tuple(
                        o.format.layout.major_to_minor) == (0, 1, 2):
                    return jax.block_until_ready(o)
            raise RuntimeError("could not pin planar stream layout")

        pbufs = [pin(s) for s in dev_bufs]

        def serve_planar_fn(p, carry):
            # complex assembled FROM the tiled planes (full-sublane reads;
            # see streaming._decode_regular_tiled), then the measured-best
            # complex resync composition
            s = jax.lax.complex(p[0], p[1]).reshape(-1)
            s = s + (carry * np.float32(1e-30)).astype(s.dtype)
            first = jnp.maximum(
                _first_sync(s, spacing=spacing, need=need, cfg=cfg),
                0).astype(jnp.int32)
            out = _extract_and_decode(
                s, first, n_frames=SRV_FRAMES, spacing=spacing, need=need,
                nb=nb, flen=flen, guard_bands=True, modulation=mod, cfg=cfg)
            raw = out[:, HEADER_LEN:HEADER_LEN + payload_len]
            return raw, carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

        serve_planar = jax.jit(serve_planar_fn, in_shardings=(sfmt, None)) \
            if sfmt else jax.jit(serve_planar_fn)
        pcarry = jnp.float32(0.0)
        praw, pcarry = serve_planar(pbufs[0], pcarry)
        assert process(np.asarray(praw), 0), "planar serving byte check"

        def pmeasure():
            nonlocal pcarry
            bad = 0
            futures = collections.deque()
            with ThreadPoolExecutor(max_workers=2) as ex:
                t0 = time.perf_counter()
                for i in range(n_buffers):
                    o, pcarry = serve_planar(pbufs[i % SRV_DISTINCT], pcarry)
                    futures.append(ex.submit(fetch_and_process, o,
                                             i % SRV_DISTINCT))
                    while len(futures) > SRV_IN_FLIGHT:
                        bad += not futures.popleft().result()
                while futures:
                    bad += not futures.popleft().result()
                wall = time.perf_counter() - t0
            assert bad == 0, f"{bad} planar serving buffers failed"
            return wall / n_buffers

        pdt, pattempts = _retry(pmeasure, THRESH["serving"],
                                jax.default_backend() == "cpu", max_tries=2)
        planar = {"seconds_per_buffer": pdt,
                  "samples_per_s": n_samples / pdt,
                  "attempts_seconds_per_buffer": pattempts}
    except Exception as e:
        planar = {"error": repr(e)[:300]}

    gss = n_samples / dt
    return {
        "metric": "sustained samples/s/chip (serving: decode + RS + colorspace)",
        "value": gss,
        "unit": "samples/s",
        "vs_baseline": gss / BASELINE_PER_CHIP,
        "detail": {"frames_per_buffer": SRV_FRAMES,
                   "samples_per_buffer": n_samples,
                   "buffers": n_buffers,
                   "in_flight": SRV_IN_FLIGHT,
                   "image_frames_per_s": SRV_FRAMES / dt,
                   "seconds_per_buffer": dt,
                   "rs_native": rs._LIB is not None,
                   "d2h_seconds_per_buffer": d2h_s,
                   "device_resident_seconds_per_buffer": dev_dt,
                   "device_resident_samples_per_s": n_samples / dev_dt,
                   "device_resident_attempts": dev_attempts,
                   "planar_pinned_input": planar,
                   "note": ("wall-clock includes the host RS+colorspace "
                            "tail; the payload region is sliced on device "
                            "and fetches overlap dispatches on worker "
                            "threads.  device_resident_* is the same chain "
                            "with outputs consumed on device (the "
                            "direct-attached deployment shape; this "
                            "tunnel's d2h RTT is ~100x a local PCIe's)"),
                   "attempts_seconds_per_buffer": attempts},
    }


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    # the serving host tail needs the native RS codec (numpy fallback is
    # ~2 MB/s and would swamp the composition); build quietly if missing
    here = os.path.dirname(os.path.abspath(__file__))
    if not os.path.exists(os.path.join(here, "native", "librs_codec.so")):
        try:
            subprocess.run(["make", "-C", os.path.join(here, "native")],
                           capture_output=True, timeout=300, check=False)
        except Exception:
            pass

    import ofdm_tpu as ot

    head = bench_headline(jax, jnp, ot)
    # emit the headline IMMEDIATELY (partial record): if a runner kills the
    # process during the slower config-4/5 measurements below, this line is
    # still on stdout; the final full JSON (last line) supersedes it
    print(json.dumps({
        "metric": "samples/s/chip (64QAM demod)",
        "value": head["value"],
        "unit": "samples/s",
        "vs_baseline": head["value"] / BASELINE_PER_CHIP,
        "detail": {**head["detail"], "partial": True,
                   "backend": jax.default_backend()},
    }), flush=True)
    configs = {}
    config_list = () if os.environ.get("BENCH_HEADLINE_ONLY") else (
        ("hamming_streaming", bench_hamming), ("serving", bench_serving))
    for name, fn in config_list:
        try:
            configs[name] = fn(jax, jnp, ot)
        except Exception as e:          # a secondary config must never
            configs[name] = {"error": repr(e)[:500]}   # sink the headline
    head["detail"]["configs"] = configs
    head["detail"]["backend"] = jax.default_backend()

    if jax.default_backend() == "tpu":
        ham = configs.get("hamming_streaming", {}).get("detail", {})
        srv = configs.get("serving", {}).get("detail", {})
        _record_attempt({
            "utc": time.strftime("%H:%M", time.gmtime()),
            "process": "bench",
            "complex_ms": [a * 1e3 for a in
                           head["detail"]["attempts_seconds_per_step"]],
            "planar_pinned_ms": [
                a * 1e3 for a in head["detail"].get(
                    "planar_serving_input", {}).get(
                    "attempts_seconds_per_step", [])],
            "hamming_ms": [a * 1e3 for a in
                           ham.get("attempts_seconds_per_step", [])],
            "hamming_planar_ms": [
                a * 1e3 for a in ham.get("planar_pinned_input", {}).get(
                    "attempts_seconds_per_step", [])],
            "serving_s": srv.get("attempts_seconds_per_buffer", []),
            "serving_device_resident_s": srv.get(
                "device_resident_attempts", []),
            "serving_planar_s": srv.get("planar_pinned_input", {}).get(
                "attempts_seconds_per_buffer", []),
        })

    print(json.dumps({
        "metric": "samples/s/chip (64QAM demod)",
        "value": head["value"],
        "unit": "samples/s",
        "vs_baseline": head["value"] / BASELINE_PER_CHIP,
        "detail": head["detail"],
    }))


if __name__ == "__main__":
    main()
