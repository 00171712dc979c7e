"""TPU experiment: sustained end-to-end serving benchmark (BASELINE config 5).

The jetson-shaped composition (examples/jetson_rx.rs:24-116), measured as a
COMPOSITION rather than stage-by-stage: a host-only producer thread feeds
~2M-sample capture buffers through the bounded SampleFeed; the main loop
uploads each buffer (double-buffered), decodes ALL frames in it with ONE
fused dispatch (sync + extract + batched rx chain), keeps >= 4 buffers in
flight, and on fetch runs the host tail — batched RS(255,223) de-FEC
(one native call per buffer) + xterm-256 colorspace mapping to RGB image
frames.  Reports sustained sample throughput, image frames/s, and the
per-buffer latency distribution.

Honesty: every dispatch mixes a carry scalar derived from the previous
buffer's decoded bytes into its input at 1e-30 weight (+1 per step), so no
two dispatches repeat and no runtime result cache can elide device work
(bench.py methodology); buffers also rotate across 8 distinct channel
realizations.  Correctness gates the number: every recovered image frame
must equal its transmitted pixels.

Run nohup'd:
  setsid nohup python3 tools/exp_serving.py > /tmp/exp_serving.log 2>&1 &
"""

import collections
import json
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
if os.environ.get("SERVE_CPU"):          # CPU smoke mode (axon sitecustomize
    jax.config.update("jax_platforms", "cpu")   # overrides JAX_PLATFORMS env)

import ofdm_tpu as ot
from ofdm_tpu.config import DEFAULT_CONFIG as cfg
from ofdm_tpu.core.transfer import to_device, to_host
from ofdm_tpu.fec import reed_solomon as rs
from ofdm_tpu.io.feed import SampleFeed, double_buffered
from ofdm_tpu.packets.colors import id_to_rgb
from ofdm_tpu.packets.header import HEADER_LEN

MOD = ot.Modulation.QAM64
W = H = 24                       # reference dancing.bytes image geometry
USER_BYTES = W * H               # 576 px ids / frame
# env-overridable for CPU smoke runs (tests/test_serving_smoke.py)
N_DISTINCT = int(os.environ.get("SERVE_DISTINCT", 8))
ROUNDS = int(os.environ.get("SERVE_ROUNDS", 6))       # buffers = 8 x 6 = 48
IN_FLIGHT = int(os.environ.get("SERVE_IN_FLIGHT", 4))
N_FRAMES = int(os.environ.get("SERVE_FRAMES", 780))   # ~2M samples/buffer
# SERVE_RESIDENT=1: keep the distinct buffers device-resident (uploaded
# once) and serve from them — isolates the device pipeline + host tail from
# the tunnel's h2d bandwidth, which on the axon relay (~20 MiB/s) is 2-3
# orders of magnitude below a PCIe/direct attach and otherwise dominates
# the composition.  The carry chain still makes every dispatch unique.
RESIDENT = bool(os.environ.get("SERVE_RESIDENT"))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    log("backend:", jax.default_backend())
    payload_len = (USER_BYTES // rs.K + 1) * rs.N      # 765 coded bytes
    nb = ot.n_data_blocks(payload_len, MOD, True)
    flen = cfg.sync_len + nb * cfg.sym_len
    spacing = flen                                     # back-to-back frames
    n_frames = N_FRAMES
    buffer_len = n_frames * spacing + 2 * cfg.sym_len
    log(f"frame: {USER_BYTES} user B -> {payload_len} coded B -> {nb} blocks "
        f"-> {flen} samples; {n_frames} frames / {buffer_len}-sample buffer")

    # ---- pregenerate N_DISTINCT buffers + their ground-truth pixels --------
    rng = np.random.default_rng(5)
    pixels = rng.integers(0, 256, (N_DISTINCT, n_frames, USER_BYTES),
                          dtype=np.uint8)
    host_bufs, truth = [], []
    for b in range(N_DISTINCT):
        coded = np.stack([rs.encode_stream(pixels[b, f])
                          for f in range(n_frames)])
        tx = ot.encode(jnp.asarray(coded), guard_bands=True, modulation=MOD)
        stream = tx.reshape(-1)
        stream = jnp.pad(stream, (0, buffer_len - stream.shape[-1]))
        rxs = ot.channel(stream, snr=45.0, timing_error=(b % 2 == 1),
                         key=jax.random.key(100 + b))
        host_bufs.append(np.ascontiguousarray(to_host(rxs)))
        truth.append(pixels[b])
        log(f"  buffer {b} ready ({host_bufs[b].nbytes/2**20:.1f} MiB)")
    n_samples = host_bufs[0].size

    # ---- ONE fused serving dispatch per buffer -----------------------------
    need = n_frames * spacing + cfg.sym_len

    @partial(jax.jit, static_argnames=())
    def serve(s, carry):
        s = s + (carry * np.float32(1e-30)).astype(s.dtype)
        from ofdm_tpu.phy.streaming import (_extract_and_decode, _first_sync)
        first = jnp.maximum(
            _first_sync(s, spacing=spacing, need=need, cfg=cfg),
            0).astype(jnp.int32)
        out = _extract_and_decode(
            s, first, n_frames=n_frames, spacing=spacing, need=need, nb=nb,
            flen=flen, guard_bands=True, modulation=MOD, cfg=cfg)
        carry = carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9
        return out, carry

    # ---- the serving loop ---------------------------------------------------
    def source():
        for r in range(ROUNDS):
            for b in range(N_DISTINCT):
                yield host_bufs[b]

    def process(out_np, b_idx):
        """Host tail: batched RS + colorspace; returns (n_frames, rgb, ok)."""
        raw = out_np[:, HEADER_LEN:HEADER_LEN + payload_len]
        data, ok = rs.decode_payload_rows(raw, USER_BYTES)
        rgb = id_to_rgb(data.reshape(-1)).reshape(n_frames, H, W, 3)
        match = np.array_equal(data, truth[b_idx])
        return rgb, bool(ok.all()) and match

    # warm compile (first dispatch compiles 2-10 min through the tunnel)
    log("compiling the serving graph...")
    carry = jnp.float32(0.0)
    out, carry = serve(to_device(host_bufs[0]), carry)
    _ = np.asarray(out)
    log("compiled; starting timed run")

    # chip-phase context: chained trivial-dispatch cost (NORMAL ~0.0x ms;
    # the DEGRADED phase adds noisy multi-ms overhead — docs/BENCHMARKS.md)
    @jax.jit
    def _trivial(c):
        return c * 1.0000001 + 1.0
    tc = jnp.float32(0.0)
    tc = _trivial(tc); float(tc)
    t0 = time.perf_counter()
    for _ in range(16):
        tc = _trivial(tc)
    float(tc)
    dispatch_overhead_ms = (time.perf_counter() - t0) / 16 * 1e3
    log(f"chained trivial dispatch: {dispatch_overhead_ms:.3f} ms/step")

    # h2d transfer bandwidth of this runtime (the jetson scenario's capture
    # upload; ~GB/s on PCIe-attached chips, ~20 MiB/s through this tunnel)
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(to_device(host_bufs[0]))
    h2d_mibps = host_bufs[0].nbytes * 3 / (time.perf_counter() - t0) / 2**20
    log(f"h2d bandwidth: {h2d_mibps:.1f} MiB/s")

    if RESIDENT:
        dev_bufs = [jax.block_until_ready(to_device(b)) for b in host_bufs]
        log("buffers device-resident")

    lat, frame_count = [], 0
    clean_ok = clean_n = cfo_ok = cfo_n = 0
    pending = collections.deque()
    t_start = time.perf_counter()
    n_buffers = 0

    def drain_one():
        nonlocal frame_count, clean_ok, clean_n, cfo_ok, cfo_n
        t_d0, b_idx, o = pending.popleft()
        rgb, ok = process(np.asarray(o), b_idx)
        lat.append(time.perf_counter() - t_d0)
        frame_count += rgb.shape[0]
        if b_idx % 2 == 0:          # no-CFO buffers: the correctness gate
            clean_ok += ok
            clean_n += 1
        else:                       # CFO buffers: robustness report
            cfo_ok += ok
            cfo_n += 1

    if RESIDENT:
        for i in range(ROUNDS * N_DISTINCT):
            t_d = time.perf_counter()
            out, carry = serve(dev_bufs[i % N_DISTINCT], carry)
            pending.append((t_d, i % N_DISTINCT, out))
            n_buffers += 1
            while len(pending) > IN_FLIGHT:
                drain_one()
    else:
        with SampleFeed(source()) as feed:
            for i, buf in enumerate(double_buffered(feed, to_device)):
                t_d = time.perf_counter()
                out, carry = serve(buf, carry)
                pending.append((t_d, i % N_DISTINCT, out))
                n_buffers += 1
                while len(pending) > IN_FLIGHT:
                    drain_one()
    while pending:
        drain_one()
    wall = time.perf_counter() - t_start

    lat_ms = np.sort(np.asarray(lat)) * 1e3
    res = {
        "buffers": n_buffers,
        "clean_buffers_ok": f"{clean_ok}/{clean_n}",
        "cfo_buffers_ok": f"{cfo_ok}/{cfo_n}",
        "all_clean_ok": clean_ok == clean_n,
        "wall_s": wall,
        "sustained_gss": n_buffers * n_samples / wall / 1e9,
        "image_frames_per_s": frame_count / wall,
        "user_bytes_per_s": frame_count * USER_BYTES / wall,
        "latency_ms": {
            "p50": float(np.percentile(lat_ms, 50)),
            "p90": float(np.percentile(lat_ms, 90)),
            "p99": float(np.percentile(lat_ms, 99)),
            "max": float(lat_ms[-1]),
        },
        "ms_per_buffer": wall / n_buffers * 1e3,
        "in_flight": IN_FLIGHT,
        "samples_per_buffer": int(n_samples),
        "dispatch_overhead_ms": dispatch_overhead_ms,
        "h2d_mibps": h2d_mibps,
        "resident": RESIDENT,
    }
    print("\nRESULTS " + json.dumps(res))
    log("DONE")


if __name__ == "__main__":
    main()
