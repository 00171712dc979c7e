"""Benchmark the native RS(255,223) codec (VERDICT round-1 task 4).

Measures native/librs_codec.so on this host two ways:
- raw: the C entry point on preallocated buffers — the sustained rate a
  streaming server sees when it owns its buffers.
- wrapper: ofdm_tpu.fec.reed_solomon.encode_blocks/decode_blocks, which pay a
  defensive numpy copy (decode corrects in place).

Derives the end-to-end sample rate each mode sustains against the TPU demod:
at the headline 64QAM+GB shape the demodulator emits 36 payload bytes per
80-sample symbol (0.45 B/sample), so an X GS/s demod needs 0.45*X GB/s of RS
decode to keep up (SURVEY.md section 7 "decide with a benchmark"; reference
RS streaming at /root/reference/src/utils.rs:97-180).

Run: python tools/bench_rs.py [--n-blocks 8192] [--reps 5]
Results recorded in docs/BENCHMARKS.md.
"""

import argparse
import ctypes
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ofdm_tpu.fec import reed_solomon as rs  # noqa: E402

PER_SAMPLE = 36.0 / 80.0    # payload bytes per sample, 64QAM + guard bands


def timed(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-blocks", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    nb, reps = args.n_blocks, args.reps

    assert rs._LIB is not None, "build native/ first: make -C native"
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (nb, rs.K), dtype=np.uint8)
    coded = rs.encode_blocks(data)

    def corrupt_with(n_err):
        c = coded.copy()
        for i in range(nb):
            pos = rng.choice(rs.N, n_err, replace=False)
            c[i, pos] ^= rng.integers(1, 256, n_err, dtype=np.uint8)
        out, ok = rs.decode_blocks(c)
        assert ok.all() and np.array_equal(out, data), f"{n_err}-err failed"
        return c

    rows = []

    # --- raw C calls, preallocated buffers --------------------------------
    out_buf = np.empty((nb, rs.N), np.uint8)
    t = timed(lambda: rs._LIB.rs_encode_blocks(u8p(data), nb, u8p(out_buf)),
              reps)
    rows.append(("encode (raw)", nb * rs.K / t / 1e9))

    ok = np.empty(nb, np.uint8)
    clean = coded.copy()
    t = timed(lambda: rs._LIB.rs_decode_blocks(u8p(clean), nb, u8p(ok)), reps)
    assert ok.all()
    rows.append(("decode clean (raw)", nb * rs.N / t / 1e9))

    for n_err in (8, 16):
        bufs = [corrupt_with(n_err) for _ in range(reps)]
        it = iter(bufs)
        t = timed(lambda: rs._LIB.rs_decode_blocks(u8p(next(it)), nb, u8p(ok)),
                  reps)
        assert ok.all()
        rows.append((f"decode {n_err}err/blk (raw)", nb * rs.N / t / 1e9))

    # --- library wrappers (defensive copy included) ------------------------
    t = timed(lambda: rs.encode_blocks(data), reps)
    rows.append(("encode (wrapper)", nb * rs.K / t / 1e9))
    t = timed(lambda: rs.decode_blocks(coded), reps)
    rows.append(("decode clean (wrapper)", nb * rs.N / t / 1e9))

    print(f"RS(255,223) native codec, {nb} blocks, "
          f"OMP_NUM_THREADS={os.environ.get('OMP_NUM_THREADS', 'auto')}, "
          f"{os.cpu_count()} cpus")
    print(f"{'op':<26}{'GB/s':>8}{'sustains GS/s (64QAM+GB)':>28}")
    for name, gbs in rows:
        print(f"{name:<26}{gbs:>8.2f}{gbs / PER_SAMPLE:>22.2f}")


if __name__ == "__main__":
    main()
