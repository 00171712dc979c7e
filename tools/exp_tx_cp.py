"""TPU experiment: round-3 tx pass eliminations, interleaved A/B.

Two full-stream passes left the packed tx chain this round:
  1. CP folded into the IFFT matrix (idft_matmul_rows_cp): the matmul
     writes prefixed 80-sample blocks directly — no [..., cp] gather +
     concat pass (bitwise-identical columns).
  2. Constant-folded prefix peak: the max reduction runs over the data
     samples only and the scale divide fuses into the prefix/data concat —
     peak_normalize never materializes an unscaled frame (bitwise-identical
     scale factor).

Variants (interleaved A,B,A,B,... in ONE process — chip drift):
  A  round-2 formulation, rebuilt inline: idft_matmul_rows + CP concat +
     peak_normalize(concat(prefix, data))
  B  production encode_payload (both optimizations)

Value equality (f32-rounding tolerance for the matmul shape change, exact
CP structure) is asserted before timing.

Run nohup'd:
  setsid nohup python3 tools/exp_tx_cp.py > /tmp/exp_tx_cp.log 2>&1 &
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
from ofdm_tpu.ops.fft import idft_matmul_rows
from ofdm_tpu.phy.tx import (_group_symbols, _pilot_time, _sync_prefix,
                             encode_payload, peak_normalize)
from ofdm_tpu.phy.modulation import modulate_bytes_packed

BATCH = 256
PAYLOAD = 8192
ROUNDS = 24


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def tx_round2(p, mod):
    """Round-2 packed tx, rebuilt inline for the A side."""
    syms = modulate_bytes_packed(p, mod, dtype=jnp.complex64)
    grouped = _group_symbols(syms, cfg.carriers_per_block(True))
    t = idft_matmul_rows(grouped, tuple(cfg.data_indices), cfg.n_fft)
    t = t + jnp.asarray(_pilot_time(cfg), dtype=jnp.complex64)
    prefixed = jnp.concatenate([t[..., -cfg.cp_len:], t], axis=-1)
    ds = prefixed.reshape(*prefixed.shape[:-2], -1)
    prefix = jnp.asarray(_sync_prefix(cfg), dtype=jnp.complex64)
    prefix = jnp.broadcast_to(prefix, (*ds.shape[:-1], prefix.shape[0]))
    return peak_normalize(jnp.concatenate([prefix, ds], axis=-1))


def main():
    log("backend:", jax.default_backend())
    mod = ot.Modulation.QAM64
    rng = np.random.default_rng(0)
    payloads = [jax.block_until_ready(jnp.asarray(
        rng.integers(0, 256, (BATCH, PAYLOAD + 16), dtype=np.uint8)))
        for _ in range(4)]
    nb = ot.n_data_blocks(PAYLOAD, mod, True)
    n_samples = BATCH * (880 + nb * 80)

    @jax.jit
    def step_a(p, carry):
        p = p.at[:, -1].add(carry.astype(jnp.uint8))
        tx = tx_round2(p, mod)
        return carry + 1.0 + jnp.max(jnp.real(tx)).astype(jnp.float32) * 1e-9

    @jax.jit
    def step_b(p, carry):
        p = p.at[:, -1].add(carry.astype(jnp.uint8))
        tx = encode_payload(p, guard_bands=True, modulation=mod)
        return carry + 1.0 + jnp.max(jnp.real(tx)).astype(jnp.float32) * 1e-9

    # value equality gate (f32-rounding tolerance; the scale factor and CP
    # structure are exact).  complex64 d2h is UNIMPLEMENTED on this backend:
    # go through the split-plane transfer shim.
    from ofdm_tpu.core.transfer import to_host
    fa = to_host(jax.jit(lambda p: tx_round2(p, mod))(payloads[0][:8]))
    fb = to_host(jax.jit(lambda p: encode_payload(
        p, guard_bands=True, modulation=mod))(payloads[0][:8]))
    err = np.abs(fa - fb).max()
    log(f"A-vs-B max |diff| = {err:.2e}")
    assert err < 2e-6, err

    variants = {"A_round2": step_a, "B_cp_fold": step_b}
    carries = {k: jnp.float32(0.0) for k in variants}
    for k, stp in variants.items():
        carries[k] = stp(payloads[0], carries[k])
        float(carries[k])
    times = {k: 0.0 for k in variants}
    for r in range(ROUNDS):
        for k, stp in variants.items():
            t0 = time.perf_counter()
            for i in range(8):
                carries[k] = stp(payloads[(r * 8 + i) % 4], carries[k])
            float(carries[k])
            times[k] += time.perf_counter() - t0
    res = {}
    for k in variants:
        dt = times[k] / (ROUNDS * 8)
        res[k] = {"ms": dt * 1e3, "gss": n_samples / dt / 1e9}
        log(f"{k:12s} {dt*1e3:.3f} ms = {n_samples/dt/1e9:.2f} GS/s")
    res["speedup"] = res["A_round2"]["ms"] / res["B_cp_fold"]["ms"]
    log(f"tx cp-fold speedup: {res['speedup']:.3f}x")
    print("\nRESULTS " + json.dumps(res))
    log("DONE")


if __name__ == "__main__":
    main()
