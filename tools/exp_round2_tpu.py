"""Round-2 TPU experiment batch (VERDICT tasks 7, 9, 10).

Runs sequentially on the attached chip (only ONE process may own it):

  A. streaming re-measure — decode_regular's resync path now rides the fused
     Pallas sync+align kernel (search_window support landed in round 1's
     last commit but was never re-timed); re-time resync/presync/burst.
  B. latency breakdown — single-buffer blocking decode vs the tunnel's bare
     dispatch round-trip (a trivial jit), to attribute the ~25 ms blocking
     latency to runtime RTT vs compute (VERDICT task 9).
  C. batch-512 VMEM cliff — one 512-row dispatch vs two pipelined 256-row
     dispatches per step, chained methodology (VERDICT task 10).

Chained cache-proof methodology identical to bench.py (carry on the output
side, +1 per step, final-carry fetch).

Run nohup'd:
  setsid nohup python3 tools/exp_round2_tpu.py > /tmp/exp_round2.log 2>&1 &
"""

from __future__ import annotations

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
MOD = ot.Modulation.QAM64


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def chained_rate(step, inputs, n_samples, reps=50):
    carry = jnp.float32(0.0)
    carry = step(inputs[0], carry)
    float(carry)                      # compile + warm
    t0 = time.perf_counter()
    for i in range(reps):
        carry = step(inputs[i % len(inputs)], carry)
    float(carry)
    dt = (time.perf_counter() - t0) / reps
    return n_samples / dt, dt


# --------------------------------------------------------------- A: streaming
def exp_streaming():
    from ofdm_tpu.phy import streaming as st
    from ofdm_tpu.phy.rx import decode_aligned

    n_frames = 256
    nb = ot.n_data_blocks(PAYLOAD, MOD, True)
    flen = cfg.sync_len + nb * cfg.sym_len
    spacing = flen
    need = n_frames * spacing + cfg.sym_len
    n_samples = n_frames * flen

    rng = np.random.default_rng(0)
    datas, streams = [], []
    for i in range(2):
        d = rng.integers(0, 256, (n_frames, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=MOD)
        s = ot.channel(tx.reshape(-1), snr=45.0, key=jax.random.key(i))
        s = jnp.pad(s, (0, max(0, need - s.shape[-1])))
        datas.append(d)
        streams.append(jax.block_until_ready(s))

    kw = dict(n_frames=n_frames, spacing=spacing, need=need, nb=nb,
              flen=flen, guard_bands=True, modulation=MOD, cfg=cfg)

    @jax.jit
    def step_resync(s, carry):
        first = jnp.maximum(
            st._first_sync(s, spacing=spacing, need=need, cfg=cfg),
            0).astype(jnp.int32)
        out = st._extract_and_decode(s, first, **kw)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    @jax.jit
    def step_presync(s, carry):
        first = jnp.maximum(
            st._first_sync(s, spacing=spacing, need=need, cfg=cfg),
            0).astype(jnp.int32)
        out = st._extract_and_decode_presync(s, first, **kw)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    # correctness gate
    p, ok = st.decode_regular(streams[0], n_frames=n_frames, spacing=spacing,
                              payload_len=PAYLOAD, guard_bands=True,
                              modulation=MOD)
    errs = int(np.count_nonzero(p != datas[0]))
    log(f"A correctness: byte errors = {errs} (gate 0)")

    for name, step in (("resync(fused sync_align)", step_resync),
                       ("presync", step_presync)):
        rate, dt = chained_rate(step, streams, n_samples)
        log(f"A streaming {name}: {dt * 1e3:.2f} ms/step = {rate / 1e9:.2f} GS/s")


# ----------------------------------------------------------------- B: latency
def exp_latency():
    nb = ot.n_data_blocks(PAYLOAD, MOD, True)
    frame = cfg.sync_len + nb * cfg.sym_len

    rng = np.random.default_rng(1)
    d = rng.integers(0, 256, (1, PAYLOAD), dtype=np.uint8)
    tx = ot.encode(d, guard_bands=True, modulation=MOD)
    rx = ot.channel(tx, snr=45.0, key=jax.random.key(9))
    rx = jnp.pad(rx, ((0, 0), (0, max(0, frame + 80 - rx.shape[-1]))))
    rx = jax.block_until_ready(rx)

    @jax.jit
    def dec1(s, carry):
        out = ot.decode_frame(s, n_blocks=nb, guard_bands=True, modulation=MOD)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    @jax.jit
    def trivial(x, carry):
        return carry + 1.0 + jnp.sum(x) * 1e-30

    tiny = jax.block_until_ready(jnp.ones((8, 128), jnp.float32))

    for name, fn, arg in (("trivial dispatch RTT", trivial, tiny),
                          ("decode_frame batch=1", dec1, rx)):
        carry = jnp.float32(0.0)
        carry = fn(arg, carry)
        float(carry)                      # compile + warm
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            carry = fn(arg, carry)
            float(carry)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        log(f"B {name}: median {ts[len(ts) // 2] * 1e3:.2f} ms "
            f"min {ts[0] * 1e3:.2f} ms")

    # async pipeline depth: issue K batch=1 decodes then block once — the
    # per-buffer cost a double-buffered receiver actually pays
    for k in (4, 16):
        carry = jnp.float32(0.0)
        carry = dec1(rx, carry)
        float(carry)
        t0 = time.perf_counter()
        for _ in range(k):
            carry = dec1(rx, carry)
        float(carry)
        log(f"B pipelined x{k} batch=1: {(time.perf_counter() - t0) / k * 1e3:.2f} "
            f"ms/buffer")


# --------------------------------------------------------------- C: batch 512
def exp_batch512():
    nb = ot.n_data_blocks(PAYLOAD, MOD, True)
    frame = cfg.sync_len + nb * cfg.sym_len

    rng = np.random.default_rng(2)
    rxs = []
    for i in range(2):
        d = rng.integers(0, 256, (512, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=MOD)
        rx = ot.channel(tx, snr=45.0, timing_error=(i > 0),
                        key=jax.random.key(i))
        rx = jnp.pad(rx, ((0, 0), (0, max(0, frame - rx.shape[-1]))))
        rxs.append(jax.block_until_ready(rx))
    n_samples = rxs[0].shape[0] * rxs[0].shape[1]

    dec = lambda s: ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                                    modulation=MOD)

    @jax.jit
    def step_512(s, carry):
        out = dec(s)
        return carry + 1.0 + jnp.max(out).astype(jnp.float32) * 1e-9

    @jax.jit
    def step_2x256(s, carry):
        a = dec(s[:256])
        b = dec(s[256:])
        return (carry + 1.0 + jnp.max(a).astype(jnp.float32) * 1e-9
                + jnp.max(b).astype(jnp.float32) * 1e-9)

    # two separate dispatches (issued back-to-back, block once per step):
    # halves the VMEM working set per executable like step_2x256 but lets
    # the runtime pipeline the two halves' HBM transfers
    half = jax.jit(lambda s, carry: carry + 1.0
                   + jnp.max(dec(s)).astype(jnp.float32) * 1e-9)

    for name, step in (("1x512 fused step", step_512),
                       ("2x256 inside one jit", step_2x256)):
        rate, dt = chained_rate(step, rxs, n_samples, reps=24)
        log(f"C {name}: {dt * 1e3:.2f} ms/step = {rate / 1e9:.2f} GS/s")

    carry = jnp.float32(0.0)
    carry = half(rxs[0][:256], carry)
    float(carry)
    t0 = time.perf_counter()
    for i in range(24):
        s = rxs[i % 2]
        carry = half(s[:256], carry)
        carry = half(s[256:], carry)
    float(carry)
    dt = (time.perf_counter() - t0) / 24
    log(f"C 2x256 separate dispatches: {dt * 1e3:.2f} ms/step = "
        f"{n_samples / dt / 1e9:.2f} GS/s")


def main():
    log("backend:", jax.default_backend())
    exp_streaming()
    exp_latency()
    exp_batch512()
    log("done")


if __name__ == "__main__":
    main()
