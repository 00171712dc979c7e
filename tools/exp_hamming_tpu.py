"""Hamming-coded streaming pipeline throughput on the attached TPU chip.

BASELINE config 4 ("Hamming-coded streaming pipeline, continuous multi-frame
demod", examples/stream_bytes.rs-shaped workload): 256 back-to-back 64QAM
frames whose payloads are Hamming(7,4)-coded user data.  The FEC tail (bit
matmuls, fec/hamming.py) fuses INTO the decode graph, so one dispatch per
buffer demods + corrects every frame and only the corrected user bytes leave
the device.

Variants:
- none/presync:    fec=None baseline (raw payload bytes out)
- hamming/presync: fused Hamming tail, presync extraction
- hamming/resync:  fused Hamming tail, per-row re-sync window

Chained cache-proof methodology identical to bench.py (carry argument makes
every dispatch's argument tuple unique; final-carry fetch forces the chain).
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
DATA_BYTES = 4680          # user bytes/frame; coded_len -> 8190 wire bytes
REPS = 50
N_INPUTS = 2


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    import ofdm_tpu as ot
    from ofdm_tpu.config import DEFAULT_CONFIG as cfg
    from ofdm_tpu.fec import hamming
    from ofdm_tpu.phy import streaming as st

    mod = ot.Modulation.QAM64
    plen = st.coded_len(DATA_BYTES, "hamming")
    nb = ot.n_data_blocks(plen, mod, True)
    flen = cfg.sync_len + nb * cfg.sym_len
    spacing = flen
    need = N_FRAMES * spacing + cfg.sym_len

    rng = np.random.default_rng(0)
    datas, streams = [], []
    for i in range(N_INPUTS):
        d = rng.integers(0, 256, (N_FRAMES, DATA_BYTES), dtype=np.uint8)
        coded = hamming.encode(jnp.asarray(d))
        tx = ot.encode(np.asarray(coded), guard_bands=True, modulation=mod)
        s = ot.channel(tx.reshape(-1), snr=45.0, key=jax.random.key(i))
        s = jnp.pad(s, (0, max(0, need - s.shape[-1])))
        datas.append(d)
        streams.append(jax.block_until_ready(s))
    n_samples = N_FRAMES * flen

    kw = dict(n_frames=N_FRAMES, spacing=spacing, need=need, nb=nb,
              flen=flen, guard_bands=True, modulation=mod, cfg=cfg)

    def make_step(fec, resync):
        fn = st._extract_and_decode if resync else st._extract_and_decode_presync
        fkw = dict(kw)
        if fec == "hamming":
            fkw.update(payload_len=plen, n_bytes=DATA_BYTES, fec="hamming")

        @jax.jit
        def step(s, carry):
            first = jnp.maximum(
                st._first_sync(s, spacing=spacing, need=need, cfg=cfg),
                0).astype(jnp.int32)
            out = fn(s, first, **fkw)
            chk = jnp.max(out).astype(jnp.float32)
            return carry + 1.0 + chk * 1e-9, out

        return step

    for name, fec, resync in [("none/presync", None, False),
                              ("hamming/presync", "hamming", False),
                              ("hamming/resync", "hamming", True)]:
        fn = make_step(fec, resync)
        carry, out0 = fn(streams[0], jnp.float32(0.0))
        out0 = np.asarray(jax.block_until_ready(out0))
        if fec == "hamming":
            errs = int(np.count_nonzero(out0 != datas[0]))
        else:
            errs = int(np.count_nonzero(out0[:, 16:16 + DATA_BYTES]
                                        != np.asarray(hamming.encode(
                                            jnp.asarray(datas[0])))[:, :DATA_BYTES]))

        t0 = time.perf_counter()
        for i in range(REPS):
            carry, _ = fn(streams[i % N_INPUTS], carry)
        float(carry)
        dt = (time.perf_counter() - t0) / REPS

        value = n_samples / dt
        print(json.dumps({
            "metric": f"samples/s/chip (64QAM hamming streaming, {name})",
            "value": value,
            "unit": "samples/s",
            "vs_baseline": value / (10e9 / 16),
            "detail": {"n_frames": N_FRAMES, "frame_samples": flen,
                       "data_bytes": DATA_BYTES, "wire_bytes": plen,
                       "user_byte_errors_clean_batch": errs,
                       "user_GBps": N_FRAMES * DATA_BYTES / dt / 1e9,
                       "seconds_per_step": dt,
                       "backend": jax.default_backend()},
        }), flush=True)


if __name__ == "__main__":
    main()
