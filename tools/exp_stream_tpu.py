"""Multi-frame streaming decode throughput on the attached TPU chip.

Measures the decode_regular graph (global first-frame sync + periodic frame
extraction + batched decode_frame with a 160-sample per-row re-sync window)
against the single-frame headline path (full-buffer scan per row).  The
streaming graph amortizes acquisition: each row's sync searches sym_len
samples instead of the whole 19k-sample buffer.

Chained cache-proof methodology identical to bench.py (carry on the output
side, +1 per step, final-carry fetch).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

N_FRAMES = 256
PAYLOAD = 8192
REPS = 50
N_INPUTS = 2


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    import ofdm_tpu as ot
    from ofdm_tpu.config import DEFAULT_CONFIG as cfg
    from ofdm_tpu.phy import streaming as st

    mod = ot.Modulation.QAM64
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    flen = cfg.sync_len + nb * cfg.sym_len
    spacing = flen
    need = N_FRAMES * spacing + cfg.sym_len

    rng = np.random.default_rng(0)
    datas, streams = [], []
    for i in range(N_INPUTS):
        d = rng.integers(0, 256, (N_FRAMES, PAYLOAD), dtype=np.uint8)
        tx = ot.encode(d, guard_bands=True, modulation=mod)
        s = ot.channel(tx.reshape(-1), snr=45.0, key=jax.random.key(i))
        s = jnp.pad(s, (0, max(0, need - s.shape[-1])))
        datas.append(d)
        streams.append(jax.block_until_ready(s))
    n_samples = N_FRAMES * flen

    kw = dict(n_frames=N_FRAMES, spacing=spacing, need=need, nb=nb,
              flen=flen, guard_bands=True, modulation=mod, cfg=cfg)

    @jax.jit
    def step(s, carry):
        first = jnp.maximum(
            st._first_sync(s, spacing=spacing, need=need, cfg=cfg), 0)
        out = st._extract_and_decode(s, first.astype(jnp.int32), **kw)
        chk = jnp.max(out).astype(jnp.float32)
        return carry + 1.0 + chk * 1e-9, out

    # presync variant: with exact spacing the global sync fully determines
    # every frame start — extract rows and run decode_aligned directly
    # (no per-row re-sync / alignment gather at all)
    from ofdm_tpu.phy.rx import decode_aligned
    n_chunks = cfg.n_sync_chunks + nb

    @jax.jit
    def step_presync(s, carry):
        first = jnp.maximum(
            st._first_sync(s, spacing=spacing, need=need, cfg=cfg),
            0).astype(jnp.int32)
        sp = jnp.pad(s, (0, cfg.sym_len))
        rows = jax.lax.dynamic_slice_in_dim(
            sp, first, N_FRAMES * spacing).reshape(N_FRAMES, spacing)[:, :flen]
        out, _ = decode_aligned(rows, n_chunks=n_chunks, guard_bands=True,
                                modulation=mod, cfg=cfg)
        chk = jnp.max(out).astype(jnp.float32)
        return carry + 1.0 + chk * 1e-9, out

    @jax.jit
    def step_presync_planar(s, carry):
        first = jnp.maximum(
            st._first_sync(s, spacing=spacing, need=need, cfg=cfg),
            0).astype(jnp.int32)
        sp = jnp.pad(s, (0, cfg.sym_len))
        f = jnp.stack([jnp.real(sp), jnp.imag(sp)])          # [2, T] planar
        w = jax.lax.dynamic_slice(f, (jnp.zeros((), first.dtype), first),
                                  (2, N_FRAMES * spacing))
        rows = jax.lax.complex(w[0], w[1]).reshape(
            N_FRAMES, spacing)[:, :flen]
        out, _ = decode_aligned(rows, n_chunks=n_chunks, guard_bands=True,
                                modulation=mod, cfg=cfg)
        chk = jnp.max(out).astype(jnp.float32)
        return carry + 1.0 + chk * 1e-9, out

    for name, fn in [("resync", step), ("presync", step_presync),
                     ("presync_planar", step_presync_planar)]:
        carry, out0 = fn(streams[0], jnp.float32(0.0))
        out0 = jax.block_until_ready(out0)
        errs = int(np.count_nonzero(
            np.asarray(out0)[:, 16:16 + PAYLOAD] != datas[0]))

        t0 = time.perf_counter()
        for i in range(REPS):
            carry, _ = fn(streams[i % N_INPUTS], carry)
        float(carry)
        dt = (time.perf_counter() - t0) / REPS

        value = n_samples / dt
        print(json.dumps({
            "metric": f"samples/s/chip (64QAM streaming multi-frame, {name})",
            "value": value,
            "unit": "samples/s",
            "vs_baseline": value / (10e9 / 16),
            "detail": {"n_frames": N_FRAMES, "frame_samples": flen,
                       "payload_bytes": PAYLOAD,
                       "byte_errors_clean_batch": errs,
                       "seconds_per_step": dt,
                       "backend": jax.default_backend()},
        }))


if __name__ == "__main__":
    main()
