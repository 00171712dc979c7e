"""Receive chain: sample stream -> bytes.

Rebuilds the reference decoder (src/receiver.rs:8-96) as a batched, jittable
pipeline.  The reference's sequential per-sample/per-block loops become fused
tensor ops:

  1. frame sync  — short-kernel sliding correlation against the locking
     signal; offset arithmetic identical to src/receiver.rs:20-25.
  2. CFO         — f_delta = |mean(angle(chunk4/chunk3))/80| (Schmidl-Cox
     style, src/receiver.rs:231-240) applied as exp(-j f_delta n) with a
     global sample index across all chunks (src/receiver.rs:44-50).
  3. channel est — h_k = mean over 5 training blocks of FFT(block[16:])/T_k
     (src/receiver.rs:212-229); equalization Y/h_k (src/receiver.rs:67-70).
  4. phase corr  — per data block, phi = mean over pilots of angle(Y_eq[pilot]);
     that block's data bins *= exp(-j phi) (src/receiver.rs:106-145).  The
     reference applies this retroactively after pushing samples; operating
     block-wise on tensors is equivalent.
  5. demod       — hard decision + LSB-first bit packing (src/receiver.rs:147-190).

Two entry points: ``decode`` (reference-parity, host-driven dynamic length)
and ``decode_frame`` (fully static shapes, batched, one XLA computation —
the production/benchmark path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..config import DEFAULT_CONFIG, FrameConfig
from ..core.transfer import to_device, to_host
from ..ops.fft import fft
from ..ops.xcorr import locking_sync_offset
from ..packets.header import HEADER_LEN, Header
from .modulation import Modulation


class DecodeError(ValueError):
    """Raised when the stream cannot be decoded (reference: anyhow errors)."""


def sync_offset(samples: jnp.ndarray, cfg: FrameConfig = DEFAULT_CONFIG,
                compute_dtype=None) -> jnp.ndarray:
    """Reference frame-sync offset (batched over leading axes)."""
    dtype = np.complex64 if samples.dtype == jnp.complex64 else np.complex128
    template = constants.locking_for(cfg).astype(dtype)
    return locking_sync_offset(samples, template, compute_dtype=compute_dtype)


def _cfo_estimate(chunks: jnp.ndarray, cfg: FrameConfig,
                  estimator: str = "reference") -> jnp.ndarray:
    """f_delta from the last two preamble chunks (src/receiver.rs:231-240 uses
    chunks 3 and 4 — the 3rd/4th preamble repeats in the default geometry).

    estimator="reference": mean of per-sample angles, |.|/sym_len — exact
    parity, including its failure when noise wraps individual angles past
    +-pi (drift near pi, i.e. CFO draws with u -> 1; the reference comments
    on this in src/channel.rs:50-54).
    estimator="coherent": angle of the complex-averaged lag product
    angle(sum right*conj(left))/sym_len — same statistic on clean signals
    but immune to per-sample wrap outliers, extending usable CFO right up to
    the pi/sym_len ambiguity bound.
    """
    last = cfg.n_locking + cfg.n_preamble - 1
    return _cfo_estimate_lr(chunks[..., last - 1, :], chunks[..., last, :],
                            cfg, estimator)


def _cfo_estimate_lr(left, right, cfg: FrameConfig, estimator: str):
    """CFO estimate from the two preamble chunks (see _cfo_estimate)."""
    if estimator == "coherent":
        corr = jnp.sum(right * jnp.conj(left), axis=-1)
        return jnp.abs(jnp.angle(corr) / cfg.sym_len)
    ang = jnp.angle(right / left)
    return jnp.abs(jnp.mean(ang, axis=-1) / cfg.sym_len)


def _equalize_and_extract(eq: jnp.ndarray, guard_bands: bool, cfg: FrameConfig):
    """Per-block pilot phase correction + data-bin extraction.

    eq: [..., nb, n_fft] equalized blocks -> [..., nb * carriers] symbols.
    """
    if guard_bands:
        pilots = eq[..., list(cfg.pilot_indices)]
        phi = jnp.mean(jnp.angle(pilots), axis=-1, keepdims=True)
        data = eq[..., cfg.data_indices] * jnp.exp(-1j * phi.astype(eq.real.dtype)
                                                   ).astype(eq.dtype)
    else:
        data = eq
    return data.reshape(*data.shape[:-2], -1)


# Production resolution of derot_impl="auto" (decode_frame, streaming).
# "stream" = derotate the whole sample stream elementwise; "matrix" = fold
# the within-symbol phasor into a per-row DFT matrix.  "matrix" is the
# production default on STRUCTURAL evidence (tools/../tmp hlo comparison,
# docs/BENCHMARKS.md round 3b): the compiled TPU module drops the two
# full-stream derotate copy buffers (126.0 -> 88.8 MB of big-buffer writes
# per headline step, everything else identical), is byte-identical
# (tests/test_decode_options.py), and measures 1.5x on CPU; degraded-phase
# TPU timing was noise-bound in both directions (+-0.3 ms), which cannot
# outweigh a 37 MB/step traffic reduction on an HBM-bound chain.
_DEROT_AUTO = "matrix"

# Production lowering of the decode_frame fused TPU route:
#   "complex" = sync_align's complex64 output into decode_aligned's matrix
#               tail (the round-3 production composition);
#   "planar"  = the kernel's f32 planes into decode_planar_matrix;
#   "chunked" = slot-major chunk-plane kernel output + slot-ordered tail.
# "complex" is the default on MEASURED evidence (round-4 roofline +
# same-window A/Bs): despite near-identical HLO entry-write totals, the
# planar handoff composition measured ~0.1-0.2 ms/step slower than the
# complex one at the headline shape (XLA pipelines the complex composition
# better), and the chunked variant's extra per-program regroup work loses
# in dispatch-floored windows.  The planar/chunked routes remain the
# production path for PLANAR INPUT streams (decode_frame_planar), where
# the complex composition isn't available without building the complex
# stream first.
_FUSED_AUTO = "complex"


def _derot_matrix_core(cp_re, cp_im, *, n_chunks: int, guard_bands: bool,
                       modulation: Modulation, cfg: FrameConfig,
                       dft_precision, cfo_estimator: str):
    """Matrix-derot decode tail on PLANAR chunk views f32[..., n_chunks, sym].

    Shared by decode_aligned's derot_impl="matrix" branch (which splits its
    complex chunks into planes — same cost as the packed concat it replaces)
    and decode_planar_matrix (which feeds the fused Pallas sync+align
    kernel's planes directly, so the aligned stream is never materialized
    as complex64).  Receives RAW (un-derotated) planes; the CFO derotation
    reaches the data blocks only through the per-row DFT matrix + the
    per-chunk phase on the bin tensor, so the sample stream is read exactly
    once (by the two planar DFT matmuls).  Only the n_training + chunk-6
    slices (tiny) are assembled as complex.
    """
    from ..ops.fft import dft_matmul_select_derot_planar
    sym = cfg.sym_len
    rd = cp_re.dtype
    cplx = jax.lax.complex
    last = cfg.n_locking + cfg.n_preamble - 1
    f_delta = _cfo_estimate_lr(
        cplx(cp_re[..., last - 1, :], cp_im[..., last - 1, :]),
        cplx(cp_re[..., last, :], cp_im[..., last, :]), cfg, cfo_estimator)
    chunk6 = cplx(cp_re[..., 6, :], cp_im[..., 6, :])

    def phasor(angles):
        return jnp.exp(jax.lax.complex(jnp.zeros_like(angles), -angles))

    # Channel estimate: derotate just the n_training chunks (tiny tensor).
    t0 = cfg.n_locking + cfg.n_preamble
    tr_raw = cplx(cp_re[..., t0:t0 + cfg.n_training, cfg.cp_len:],
                  cp_im[..., t0:t0 + cfg.n_training, cfg.cp_len:])
    tr_idx = ((jnp.arange(cfg.n_training, dtype=rd) + t0) * sym)[:, None] \
        + (jnp.arange(cfg.n_fft, dtype=rd) + cfg.cp_len)[None, :]
    tr = tr_raw * phasor(f_delta[..., None, None] * tr_idx).astype(tr_raw.dtype)
    training_ref = jnp.asarray(
        constants.training_signals(cfg.n_fft, cfg.training_seed),
        dtype=tr_raw.dtype)
    h_k = jnp.mean(fft(tr) / training_ref, axis=-2)

    chunk6_post = chunk6 * phasor(
        f_delta[..., None] * (jnp.arange(sym, dtype=rd) + 6 * sym)
    ).astype(chunk6.dtype)

    if guard_bands:
        nd = len(cfg.data_indices)
        sel = tuple(cfg.data_indices) + tuple(cfg.pilot_indices)
        default_prec = jax.lax.Precision.HIGH
    else:
        nd = cfg.n_fft
        sel = tuple(range(cfg.n_fft))
        # stream-path parity: the non-guard arm defaults to the
        # full-precision transform (channel est divides by these outputs)
        default_prec = jax.lax.Precision.HIGHEST
    prec = dft_precision if dft_precision is not None else default_prec

    y = dft_matmul_select_derot_planar(
        cp_re[..., cfg.n_sync_chunks:, cfg.cp_len:],
        cp_im[..., cfg.n_sync_chunks:, cfg.cp_len:],
        sel, f_delta, sample_offset=cfg.cp_len, precision=prec)
    # per-chunk derotation phase, applied on the (small) bin tensor where it
    # fuses into the equalize divide
    n_data = n_chunks - cfg.n_sync_chunks
    rot_dc = phasor(f_delta[..., None]
                    * ((jnp.arange(n_data, dtype=rd) + cfg.n_sync_chunks)
                       * sym))
    y = y * rot_dc[..., :, None].astype(y.dtype)

    if guard_bands:
        eq = y / h_k[..., sel][..., None, :]
        phi = jnp.mean(jnp.angle(eq[..., nd:]), axis=-1, keepdims=True)
        data = eq[..., :nd] * jnp.exp(-1j * phi.astype(eq.real.dtype)
                                      ).astype(eq.dtype)
        syms = data.reshape(*data.shape[:-2], -1)
    else:
        eq = y / h_k[..., None, :]
        syms = _equalize_and_extract(eq, guard_bands, cfg)
    from .modulation import demodulate_symbols_packed
    out = demodulate_symbols_packed(syms, modulation)
    diag = {"f_delta": f_delta, "h_k": h_k, "equalized": syms,
            "chunk6_pre": chunk6, "chunk6_post": chunk6_post}
    return out, diag


@partial(jax.jit, static_argnames=("n_chunks", "guard_bands", "modulation",
                                   "cfg", "dft_precision", "cfo_estimator"))
def decode_planar_matrix(planes: jnp.ndarray, *, n_chunks: int,
                         guard_bands: bool = False,
                         modulation: Modulation = Modulation.BPSK,
                         cfg: FrameConfig = DEFAULT_CONFIG,
                         dft_precision=None,
                         cfo_estimator: str = "reference"):
    """Matrix-derot decode of a PLANAR aligned stream.

    ``planes``: f32[..., 2, n_chunks * sym_len] real/imag planes of the
    sync-aligned stream — exactly what ``sync_align(..., planar=True)``
    returns — batched over leading axes.  Same outputs as
    ``decode_aligned(complex(planes[...,0,:], planes[...,1,:]),
    derot_impl="matrix")`` (to f32 rounding; byte-identical at operating
    SNRs, gated by tests), but the complex64 aligned stream is never built:
    the round-3 headline profile spent one full extra HBM write + re-read
    of the 39 MB aligned intermediate on that round-trip (VERDICT r3 §weak 1).
    """
    sym = cfg.sym_len
    cp = planes[..., : n_chunks * sym].reshape(
        *planes.shape[:-1], n_chunks, sym)
    return _derot_matrix_core(cp[..., 0, :, :], cp[..., 1, :, :],
                              n_chunks=n_chunks, guard_bands=guard_bands,
                              modulation=modulation, cfg=cfg,
                              dft_precision=dft_precision,
                              cfo_estimator=cfo_estimator)


@partial(jax.jit, static_argnames=("n_chunks", "guard_bands", "modulation",
                                   "cfg", "dft_precision", "cfo_estimator",
                                   "demod_impl", "derot_impl"))
def decode_aligned(aligned: jnp.ndarray, *, n_chunks: int,
                   guard_bands: bool = False,
                   modulation: Modulation = Modulation.BPSK,
                   cfg: FrameConfig = DEFAULT_CONFIG,
                   dft_precision=None, cfo_estimator: str = "reference",
                   demod_impl: str = "xla", derot_impl: str = "stream"):
    """Decode a sync-aligned stream of exactly ``n_chunks * sym_len`` samples.

    Returns (bytes_u8[..., n_bytes], diagnostics dict).  Batched over leading
    axes.  The stream must start at the locking block (post sync trim).

    ``demod_impl`` selects the post-DFT tail lowering: "xla" (default) runs
    equalize/pilot-phase/demod/pack as XLA fusions; "pallas" runs them as one
    VMEM-resident Pallas pass (kernels/demod_pallas.py — TPU production path,
    selected by decode_frame's auto mode); "interpret" is the pallas path in
    interpret mode (CPU-testable).  The pallas tail equalizes by the
    precomputed reciprocal channel (y * (1/h) instead of y / h) and uses a
    polynomial atan2 for the pilot phase (~2e-4 rad) — sub-ulp-of-a-decision
    deviations at any workable SNR; byte equality is gated by tests.

    ``derot_impl`` selects the CFO-derotation lowering ("stream" / "matrix" /
    "auto"; see _DEROT_AUTO).  "matrix" is only implemented for the XLA demod
    tail — requesting it together with demod_impl="pallas"/"interpret" raises
    ValueError (auto resolves to "stream" there).
    """
    sym = cfg.sym_len
    chunks = aligned[..., : n_chunks * sym].reshape(*aligned.shape[:-1], n_chunks, sym)
    rd = jnp.real(aligned).dtype

    if derot_impl == "auto":
        # the pallas demod tail has no matrix-derot lowering (its DFT feed is
        # the planar select matmul without the per-row derot fold); auto
        # resolves to the stream derotation there
        derot_impl = "stream" if demod_impl in ("pallas", "interpret") \
            else _DEROT_AUTO
    if derot_impl == "matrix":
        if demod_impl in ("pallas", "interpret"):
            raise ValueError(
                "derot_impl='matrix' is not implemented for the pallas/"
                "interpret demod tail — use demod_impl='xla' or "
                "derot_impl='stream'/'auto'")
        # Fold the within-symbol derotation phasor into a per-row DFT matrix
        # (ops/fft.py) instead of materializing a derotated copy of the
        # whole stream: the full-stream elementwise complex-multiply pass
        # was the largest HBM tranche of the aligned decode (~0.43 ms of
        # the 0.635 ms at the headline shape — see docs/BENCHMARKS.md
        # "Roofline").  Only the 5 training chunks and the chunk-6 debug
        # tap are derotated elementwise (tiny), and the remaining per-chunk
        # phase fuses into the equalizer on the (small) bin tensor.
        # Mathematically identical to the stream path; agrees to f32
        # rounding, byte-identical at any workable SNR
        # (tests/test_decode_options.py).
        return _derot_matrix_core(
            jnp.real(chunks), jnp.imag(chunks), n_chunks=n_chunks,
            guard_bands=guard_bands, modulation=modulation, cfg=cfg,
            dft_precision=dft_precision, cfo_estimator=cfo_estimator)

    # CFO estimate + global derotation (sample index spans all chunks).
    # exp(-i f (sym*c + j)) factors into an outer product of two short
    # phasor vectors, so only n_chunks + sym transcendentals are evaluated
    # instead of one per sample — the rest is cheap complex multiplies.
    f_delta = _cfo_estimate(chunks, cfg, cfo_estimator)
    chunk6_pre = chunks[..., 6, :]      # reference debug tap (receiver.rs:41)
    c_idx = jnp.arange(n_chunks, dtype=rd) * sym
    j_idx = jnp.arange(sym, dtype=rd)

    def phasor(angles):
        return jnp.exp(jax.lax.complex(jnp.zeros_like(angles), -angles))

    rot_c = phasor(f_delta[..., None] * c_idx)        # [..., n_chunks]
    rot_j = phasor(f_delta[..., None] * j_idx)        # [..., sym]
    rot = rot_c[..., :, None] * rot_j[..., None, :]
    chunks = chunks * rot.astype(chunks.dtype)

    # Channel estimate from the 5 training chunks.
    t0 = cfg.n_locking + cfg.n_preamble
    training_rx = chunks[..., t0:t0 + cfg.n_training, cfg.cp_len:]
    training_ref = jnp.asarray(
        constants.training_signals(cfg.n_fft, cfg.training_seed), dtype=chunks.dtype)
    h_k = jnp.mean(fft(training_rx) / training_ref, axis=-2)

    # Data blocks: CP strip + DFT + equalize.  dft_precision trades MXU
    # passes for accuracy on the (large) data-block transform; the (small)
    # channel-estimation transform above always stays at full precision.
    # Default is HIGH (bf16x3): ~2^-16 relative error = a -96 dB noise
    # floor, >= 40 dB below even QAM256's 55 dB operating point, at half
    # HIGHEST's MXU passes — 0.773 -> 0.635 ms for the aligned decode at
    # the headline shape with zero byte errors on every shipped modulation
    # (tools/exp_roofline2.py + exp_modmatrix_tpu.py, round 3).
    # With guard bands on, the DFT is evaluated only at the 52 used bins
    # (48 data + 4 pilots) as a packed [.., 128] x [128, 104] matmul — the
    # guard bins are never computed and equalize/pilot-phase/demod run on
    # the packed layout with no 64-bin intermediate (byte-identical to the
    # full transform; measured faster in tools/exp_xla_opt.py).
    from ..ops.fft import dft_matmul, dft_matmul_select, dft_matmul_select_planar
    data_t = chunks[..., cfg.n_sync_chunks:, cfg.cp_len:]
    prec = dft_precision if dft_precision is not None \
        else jax.lax.Precision.HIGH
    if guard_bands:
        nd = len(cfg.data_indices)
        sel = tuple(cfg.data_indices) + tuple(cfg.pilot_indices)
    else:
        nd = cfg.n_fft
        sel = tuple(range(cfg.n_fft))
    if demod_impl in ("pallas", "interpret"):
        from ..kernels.demod_pallas import eq_demod_pack
        # n_out=128: every physical lane of the planes is a defined value
        # (zero beyond the selected bins) — Mosaic tile padding is undefined
        # and must never reach a K-padded matmul reduction (ops/fft.py note)
        n_out = max(128, len(sel))
        yr, yi = dft_matmul_select_planar(data_t, sel, precision=prec,
                                          n_out=n_out)
        invh = 1.0 / h_k[..., sel]
        invh = jnp.pad(invh, [(0, 0)] * (invh.ndim - 1)
                       + [(0, n_out - len(sel))])
        out = eq_demod_pack(yr, yi, invh, n_data=nd,
                            n_pilots=len(cfg.pilot_indices) if guard_bands else 0,
                            modulation=modulation,
                            interpret=(demod_impl == "interpret"))
        diag = {"f_delta": f_delta, "h_k": h_k, "equalized": None,
                "chunk6_pre": chunk6_pre, "chunk6_post": chunks[..., 6, :]}
        return out, diag
    if guard_bands:
        y = dft_matmul_select(data_t, sel, precision=prec)
        eq = y / h_k[..., sel][..., None, :]
        phi = jnp.mean(jnp.angle(eq[..., nd:]), axis=-1, keepdims=True)
        data = eq[..., :nd] * jnp.exp(-1j * phi.astype(eq.real.dtype)
                                      ).astype(eq.dtype)
        syms = data.reshape(*data.shape[:-2], -1)
    else:
        if dft_precision is not None:
            y = dft_matmul(data_t, precision=dft_precision)
        else:
            y = fft(data_t)
        eq = y / h_k[..., None, :]
        syms = _equalize_and_extract(eq, guard_bands, cfg)
    # SoA demod+pack: per-symbol uint8 codes + shift/or packing — no
    # n_syms*bps bool bit tensor (byte-identical, locked by tests; the same
    # treatment as fec/hamming.py)
    from .modulation import demodulate_symbols_packed
    out = demodulate_symbols_packed(syms, modulation)
    diag = {"f_delta": f_delta, "h_k": h_k, "equalized": syms,
            "chunk6_pre": chunk6_pre, "chunk6_post": chunks[..., 6, :]}
    return out, diag


def _planar_align(flat: jnp.ndarray, offsets: jnp.ndarray,
                  need: int, impl: str = "auto") -> jnp.ndarray:
    """Per-row alignment gather on a real/imag-stacked planar view.

    complex[R, T], int[R] -> complex[R, need].  Two byte-identical
    implementations:

    - "xla": one dynamic_slice of a [2, need] tile per row on float planes —
      ~1.4x faster end-to-end than the complex row gather
      (tools/exp_xla_opt.py), and 2x faster than per-plane / concatenated
      layouts (tools/exp_align2.py).
    - "pallas": VMEM-resident tile-dim slice + aligned lane rotate
      (kernels/align_pallas.py) — another ~1.3x over the XLA gather at the
      headline shape (tools/exp_align_pallas.py: 0.655 vs 0.864 ms).

    "auto" picks pallas on the TPU backend for complex64, xla elsewhere
    (Pallas TPU kernels don't run on the CPU backend outside interpret mode).
    """
    if impl == "auto":
        impl = "pallas" if (flat.dtype == jnp.complex64 and
                            jax.devices()[0].platform == "tpu") else "xla"
    if impl == "pallas":
        from ..kernels.align_pallas import planar_align
        return planar_align(flat, offsets, need)
    f = jnp.stack([jnp.real(flat), jnp.imag(flat)], axis=1)   # [R, 2, T]

    def take(row, off):
        return jax.lax.dynamic_slice(row, (jnp.zeros((), off.dtype), off),
                                     (2, need))

    a = jax.vmap(take)(f, offsets)
    return jax.lax.complex(a[:, 0], a[:, 1])


@partial(jax.jit, static_argnames=("cfg",))
def _sync_jit(samples, cfg: FrameConfig = DEFAULT_CONFIG):
    return sync_offset(samples, cfg)


@partial(jax.jit, static_argnames=("n_chunks", "guard_bands", "modulation", "cfg"))
def _align_decode(samples, offset, *, n_chunks: int, guard_bands: bool,
                  modulation: Modulation, cfg: FrameConfig):
    need = n_chunks * cfg.sym_len
    padded = jnp.pad(samples, (0, max(0, need)))
    aligned = jax.lax.dynamic_slice_in_dim(padded, offset, need)
    return decode_aligned(aligned, n_chunks=n_chunks, guard_bands=guard_bands,
                          modulation=modulation, cfg=cfg)


def decode(samples, guard_bands: bool = False,
           modulation: Modulation = Modulation.BPSK,
           cfg: FrameConfig = DEFAULT_CONFIG,
           return_diagnostics: bool = False):
    """Reference-parity decode of one 1-D sample stream (src/receiver.rs:8-96).

    Host-driven: pulls the sync offset to the host, pads the tail chunk with
    zeros like split_into_chunks (src/receiver.rs:192-210), parses the header
    and truncates to packet_length.  Raises DecodeError like the reference's
    early bail on short input.  All device work stays inside jit computations
    (some TPU runtimes mis-execute eager op-by-op dispatch).
    """
    samples = samples if isinstance(samples, jax.Array) else to_device(samples)
    offset = int(_sync_jit(samples, cfg))
    # The reference computes offset = peak_lag - 1 and would panic on a
    # negative cast (split_off(-1 as usize)); a clean un-delayed stream sits
    # at peak_lag 0.  Clamp small negatives to 0 — same alignment, no crash.
    if offset == -1:
        offset = 0
    if offset < 0 or offset > samples.shape[-1]:
        raise DecodeError(f"sync offset {offset} out of range")
    remaining = samples.shape[-1] - offset
    if remaining < (cfg.n_sync_chunks * cfg.sym_len):
        raise DecodeError("Input not long enough, bailing early")

    n_chunks = -(-remaining // cfg.sym_len)
    out, diag = _align_decode(samples, offset, n_chunks=n_chunks,
                              guard_bands=guard_bands, modulation=modulation,
                              cfg=cfg)
    from ..obs import taps
    if taps.enabled():
        # reference tap names (src/receiver.rs:41,52,58,76)
        taps.tap("preq_correction_3a", to_host(diag["chunk6_pre"]))
        taps.tap("post_correction_3a", to_host(diag["chunk6_post"]))
        taps.tap("hk_estimate_3a", to_host(diag["h_k"]))
        taps.tap("no_phaseoffset", to_host(diag["equalized"]))
    raw = np.asarray(out)
    if raw.shape[-1] < HEADER_LEN:
        raise DecodeError("decoded stream shorter than header")
    header = Header.from_bytes(raw[:HEADER_LEN].tobytes())
    payload = raw[HEADER_LEN:HEADER_LEN + header.packet_length]
    if header.packet_length > raw.shape[-1] - HEADER_LEN:
        # Reference Vec::truncate caps at available length; mirror that.
        payload = raw[HEADER_LEN:]
    if return_diagnostics:
        diag = {k: to_host(v) for k, v in diag.items()}
        diag["offset"] = offset
        return payload, diag
    return payload


@partial(jax.jit, static_argnames=("n_blocks", "guard_bands", "modulation",
                                   "cfg", "sync_dtype", "search_window",
                                   "dft_precision", "cfo_estimator",
                                   "align_impl", "demod_impl", "derot_impl"))
def decode_frame(samples: jnp.ndarray, *, n_blocks: int,
                 guard_bands: bool = False,
                 modulation: Modulation = Modulation.BPSK,
                 cfg: FrameConfig = DEFAULT_CONFIG,
                 sync_dtype=None,
                 search_window: int | None = None,
                 dft_precision=None, cfo_estimator: str = "coherent",
                 align_impl: str = "auto",
                 demod_impl: str = "auto",
                 derot_impl: str = "auto") -> jnp.ndarray:
    """Fully-static batched decode: complex[..., T] -> uint8[..., n_bytes].

    ``n_blocks`` is the expected number of data OFDM symbols (known from the
    deployment config).  Sync offset is resolved on-device with
    ``dynamic_slice`` — no host round-trip — so the whole rx chain is one XLA
    computation.  This is the production streaming/benchmark path.

    ``align_impl`` selects the sync/alignment lowering: "auto" (default)
    uses the fused Pallas sync+align kernel on the TPU backend (complex64,
    full-buffer scan), falling back to the XLA sync + Pallas/XLA alignment
    gather; "fused" / "pallas" / "xla" force a path.

    ``sync_dtype=jnp.bfloat16`` runs the sync correlation on the MXU at ~2x
    throughput (peak detection is bf16-tolerant).  ``search_window`` bounds
    the acquisition scan to the first W samples when the frame start is
    approximately known (streaming reacquisition); None scans the whole
    buffer like the reference (src/receiver.rs:20).

    ``demod_impl``: "auto" (default) runs the post-DFT tail (equalize +
    pilot phase + demod + byte pack) as one fused Pallas VMEM pass on the
    TPU backend for complex64 whole-byte blocks, XLA fusions elsewhere;
    "pallas" / "xla" force a path (see decode_aligned).

    ``cfo_estimator`` defaults to "coherent" on this production path: the
    reference's per-sample-angle mean loses whole frames when the CFO draw
    nears the per-sample wrap (u >= 0.99 in tools/exp_cfo.py: 15/16 frames
    lost vs 0 for coherent; identical behavior on clean signals).  The
    parity entry point ``decode`` keeps the reference estimator.
    """
    squeeze = samples.ndim == 1
    if squeeze:
        samples = samples[None, :]
    n_chunks = cfg.n_sync_chunks + n_blocks
    need = n_chunks * cfg.sym_len
    pad = max(0, need - samples.shape[-1])
    samples = jnp.pad(samples, [(0, 0)] * (samples.ndim - 1) + [(0, pad)])

    batch_shape = samples.shape[:-1]
    flat = samples.reshape(-1, samples.shape[-1])

    impl = align_impl
    template = constants.locking_for(cfg)
    if impl == "auto" and (samples.dtype == jnp.complex64
                           and jax.devices()[0].platform == "tpu"
                           and sync_dtype is None
                           and template.shape[-1] <= 128):
        impl = "fused"
    # Resolve the tail lowering up front (the fused-route variant selection
    # below depends on it; see _FUSED_AUTO for the measured rationale).
    demod = "xla" if demod_impl == "auto" else demod_impl
    derot = derot_impl
    if derot == "auto":
        derot = "stream" if demod in ("pallas", "interpret") else _DEROT_AUTO
    if impl == "chunked" or (impl == "fused" and derot == "matrix"
                             and demod == "xla" and _FUSED_AUTO == "chunked"
                             and cfo_estimator == "coherent"
                             and dft_precision is None):
        # fused sync+align emitting SLOT-MAJOR chunk planes + the
        # slot-ordered matrix-derot tail: the contiguous-window route's
        # output relayout / chunk reshape / plane split copies never exist
        # (round-4 HLO audit; see kernels/chain_pallas.sync_align_chunked)
        from ..kernels.chain_pallas import sync_align_chunked
        chun, slots, m_per = sync_align_chunked(
            flat, template.astype(np.complex64), n_chunks=n_chunks,
            cfg=cfg, search_window=search_window,
            interpret=(jax.devices()[0].platform != "tpu"))
        out = decode_chunked_matrix(
            chun, n_chunks=n_chunks, m_per=m_per, guard_bands=guard_bands,
            modulation=modulation, cfg=cfg, cfo_estimator=cfo_estimator)
        out = out.reshape(*batch_shape, out.shape[-1])
        return out[0] if squeeze else out
    if impl in ("fused", "fused_planar"):
        # one VMEM-resident Pallas pass: correlation matmul + argmax +
        # aligned window write — the stream is read from HBM exactly once
        # (kernels/align_pallas.py sync_align); search_window bounds the
        # in-kernel lag scan (streaming reacquisition)
        from ..kernels.align_pallas import sync_align
        if derot == "matrix" and demod == "xla" \
                and (impl == "fused_planar" or _FUSED_AUTO == "planar"):
            planes = sync_align(flat, template.astype(np.complex64), need,
                                search_window=search_window, planar=True)
            planes = planes.reshape(*batch_shape, 2, need)
            out, _ = decode_planar_matrix(
                planes, n_chunks=n_chunks, guard_bands=guard_bands,
                modulation=modulation, cfg=cfg, dft_precision=dft_precision,
                cfo_estimator=cfo_estimator)
            return out[0] if squeeze else out
        aligned = sync_align(flat, template.astype(np.complex64), need,
                             search_window=search_window)
    else:
        scan = samples if search_window is None else \
            samples[..., : search_window + cfg.sym_len]
        offsets = jnp.clip(sync_offset(scan, cfg, compute_dtype=sync_dtype),
                           0, samples.shape[-1] - need)
        aligned = _planar_align(flat, offsets.reshape(-1), need, impl=impl)
    aligned = aligned.reshape(*batch_shape, need)

    # demod "auto" resolved to the XLA tail above: the fused Pallas tail
    # measured SLOWER on the attached chip (1.85 vs 1.24 ms at the headline
    # shape, and the round-2 SoA packed demod widened the gap to 0.92 ms —
    # XLA's own fusions already keep the tail short, and the planar-DFT
    # feed reads the packed input twice); see tools/exp_demod_tail.py and
    # docs/BENCHMARKS.md.  "pallas" forces the kernel path.
    out, _ = decode_aligned(aligned, n_chunks=n_chunks, guard_bands=guard_bands,
                            modulation=modulation, cfg=cfg,
                            dft_precision=dft_precision,
                            cfo_estimator=cfo_estimator, demod_impl=demod,
                            derot_impl=derot)
    return out[0] if squeeze else out


def decode_frame_planar(planes: jnp.ndarray, *, n_blocks: int,
                        guard_bands: bool = False,
                        modulation: Modulation = Modulation.BPSK,
                        cfg: FrameConfig = DEFAULT_CONFIG,
                        search_window: int | None = None,
                        align_impl: str = "auto",
                        interpret: bool = False) -> jnp.ndarray:
    """``decode_frame`` for a PLANAR sample stream f32[..., 2, T].

    The serving-honest input interface: captures are interleaved fc32 on the
    wire, the native loader deinterleaves to planes (native/iq_loader.cpp),
    and complex h2d transfers are UNIMPLEMENTED on some TPU runtimes (planes
    are what actually crosses the PCIe/tunnel — core/transfer.py).  On TPU
    the planes feed the fused Pallas sync+align kernel DIRECTLY and the
    planar matrix-derot tail decodes them — no complex64 stream ever exists
    device-side, and when the planes are the jit argument itself the entire
    input-side prep of the complex path (X64Split + stack + relayout,
    ~118 MB/step at the headline shape — round-4 HLO audit) disappears.
    For zero input copies, pre-pad the stream so T is a multiple of 128
    with at least one all-zero tile beyond the true samples.

    ``align_impl``: "auto" = the fused sync+align kernel + the complex
    handoff into the matrix tail (best-measured composition, see
    _FUSED_AUTO); "chunked" = the slot-major chunk-plane kernel +
    slot-ordered tail (lower HBM traffic but measured slower on the
    attached chip — docs/BENCHMARKS.md "Round 5"); "fused_planar" = the
    kernel's f32 planes into decode_planar_matrix.  Off-TPU this
    assembles the complex view and runs the standard decode_frame (CPU
    parity path) — ``interpret=True`` instead forces the TPU composition
    with the Pallas kernels in interpret mode (multichip dryruns /
    kernel-path tests on CPU meshes).
    """
    if planes.ndim >= 4 and planes.shape[-1] == 128 and planes.shape[-3] == 2:
        # pre-tiled [..., 2, tiles, 128] form (planar_input_format): merge
        # the tile split — a free bitcast on a row-major argument
        planes = planes.reshape(*planes.shape[:-2], -1)
    squeeze = planes.ndim == 2
    if squeeze:
        planes = planes[None]
    assert planes.shape[-2] == 2, "planes must be [..., 2, T]"
    template = constants.locking_for(cfg)
    tpl_ok = (template.shape[-1] <= 128 and cfg.sym_len <= 128
              and np.allclose(np.asarray(template).imag, 0.0))
    on_tpu = jax.devices()[0].platform == "tpu"
    n_chunks = cfg.n_sync_chunks + n_blocks
    need = n_chunks * cfg.sym_len
    if (on_tpu or interpret) and tpl_ok:
        pad = max(0, need - planes.shape[-1])
        planes = jnp.pad(planes, [(0, 0)] * (planes.ndim - 1) + [(0, pad)])
        batch_shape = planes.shape[:-2]
        flatp = planes.reshape(-1, 2, planes.shape[-1])
        if align_impl == "chunked":
            from ..kernels.chain_pallas import sync_align_chunked
            chun, slots, m_per = sync_align_chunked(
                flatp, template.astype(np.complex64), n_chunks=n_chunks,
                cfg=cfg, search_window=search_window, interpret=interpret)
            out = decode_chunked_matrix(
                chun, n_chunks=n_chunks, m_per=m_per,
                guard_bands=guard_bands, modulation=modulation, cfg=cfg)
        elif align_impl == "fused_planar":
            from ..kernels.align_pallas import sync_align
            ap = sync_align(flatp, template.astype(np.complex64), need,
                            search_window=search_window, planar=True,
                            interpret=interpret)
            out, _ = decode_planar_matrix(
                ap.reshape(-1, 2, need), n_chunks=n_chunks,
                guard_bands=guard_bands, modulation=modulation, cfg=cfg,
                cfo_estimator="coherent")
        else:
            # planar INPUT + the complex handoff composition: the kernel
            # consumes the planes zero-copy and emits complex64 into
            # decode_aligned's matrix tail — the composition XLA pipelines
            # best (round-4 roofline finding, see _FUSED_AUTO)
            from ..kernels.align_pallas import sync_align
            aligned = sync_align(flatp, template.astype(np.complex64), need,
                                 search_window=search_window,
                                 interpret=interpret)
            out, _ = decode_aligned(
                aligned, n_chunks=n_chunks, guard_bands=guard_bands,
                modulation=modulation, cfg=cfg, cfo_estimator="coherent",
                derot_impl="matrix")
        out = out.reshape(*batch_shape, out.shape[-1])
    else:
        cplx = jax.lax.complex(planes[..., 0, :], planes[..., 1, :])
        out = decode_frame(cplx, n_blocks=n_blocks, guard_bands=guard_bands,
                           modulation=modulation, cfg=cfg,
                           search_window=search_window)
    return out[0] if squeeze else out


def planar_input_format(device=None):
    """jit ``in_shardings`` entry pinning a planar-stream argument to the
    row-major layout the fused Pallas kernels consume.

    XLA auto-assigns batch-minor layouts to large planar parameters, which
    costs a full-stream relayout copy before the kernel (39.6 MB/step at
    the headline shape — round-4 HLO audit).  Passing the stream as
    f32[R, 2, tiles, 128] (tiles = ceil(T/128) + 1 spare zero tile) with

        step = jax.jit(fn, in_shardings=(ot.planar_input_format(), ...))

    removes every input-side copy: the parameter IS the kernel operand.
    """
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding
    if device is None:
        device = jax.devices()[0]
    return Format(Layout(major_to_minor=(0, 1, 2, 3)),
                  SingleDeviceSharding(device))


def planar_stream_format(device=None):
    """``planar_input_format`` for a pre-tiled STREAM argument: a single
    continuous capture as f32[2, tiles, 128] (tiles = ceil(T/128), row-major
    pinned) — the zero-copy upload shape for ``streaming.decode_regular``
    and the serving extractors, which merge the tile split as a free
    bitcast.  Pin via the same attempt loop as the batch format (bench.py
    ``pin``): the remote compile helper caches executables by HLO and may
    ignore the requested layout nondeterministically."""
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding
    if device is None:
        device = jax.devices()[0]
    return Format(Layout(major_to_minor=(0, 1, 2)),
                  SingleDeviceSharding(device))


@partial(jax.jit, static_argnames=("n_chunks", "m_per", "guard_bands",
                                   "modulation", "cfg", "cfo_estimator"))
def decode_chunked_matrix(chun: jnp.ndarray, *, n_chunks: int, m_per: int,
                          guard_bands: bool = False,
                          modulation: Modulation = Modulation.BPSK,
                          cfg: FrameConfig = DEFAULT_CONFIG,
                          cfo_estimator: str = "coherent") -> jnp.ndarray:
    """Matrix-derot decode of SLOT-MAJOR chunk planes.

    ``chun``: (re, im) f32[..., slots, 128] planes from kernels.chain_pallas.
    sync_align_chunked — chunk c at slot (c % n_cls) * m_per + c // n_cls,
    samples at lanes 0:sym_len, lanes beyond sym_len hold following-stream
    samples (defined, ignored).  The whole tail runs in slot order (the
    per-chunk derot phase is computed per slot) and only the FINAL packed
    byte tensor is gathered into chunk order — so the kernel output is
    consumed as-is, with none of the contiguous-window route's relayout /
    chunk-reshape / plane-split copies (round-4 HLO audit).  Returns
    uint8[..., n_bytes] identical in layout to decode_frame's output.
    """
    from ..ops.fft import dft_matmul_select_derot_planar
    cr, ci = chun
    sym = cfg.sym_len
    slots = cr.shape[-2]
    n_cls = slots // m_per
    rd = jnp.float32
    cplx = jax.lax.complex

    def slot_of(c):
        return (c % n_cls) * m_per + c // n_cls
    last = cfg.n_locking + cfg.n_preamble - 1
    f_delta = _cfo_estimate_lr(
        cplx(cr[..., slot_of(last - 1), :sym], ci[..., slot_of(last - 1), :sym]),
        cplx(cr[..., slot_of(last), :sym], ci[..., slot_of(last), :sym]),
        cfg, cfo_estimator)

    def phasor(angles):
        return jnp.exp(jax.lax.complex(jnp.zeros_like(angles), -angles))

    # channel estimate from the training slots (tiny gather)
    t0 = cfg.n_locking + cfg.n_preamble
    tsl = jnp.asarray([slot_of(t0 + i) for i in range(cfg.n_training)])
    trr = jnp.take(cr, tsl, axis=-2)[..., cfg.cp_len:cfg.cp_len + cfg.n_fft]
    tri = jnp.take(ci, tsl, axis=-2)[..., cfg.cp_len:cfg.cp_len + cfg.n_fft]
    tr_raw = cplx(trr, tri)
    tr_idx = ((jnp.arange(cfg.n_training, dtype=rd) + t0) * sym)[:, None] \
        + (jnp.arange(cfg.n_fft, dtype=rd) + cfg.cp_len)[None, :]
    tr = tr_raw * phasor(f_delta[..., None, None] * tr_idx).astype(tr_raw.dtype)
    training_ref = jnp.asarray(
        constants.training_signals(cfg.n_fft, cfg.training_seed),
        dtype=tr_raw.dtype)
    h_k = jnp.mean(fft(tr) / training_ref, axis=-2)

    if guard_bands:
        nd = len(cfg.data_indices)
        sel = tuple(cfg.data_indices) + tuple(cfg.pilot_indices)
    else:
        nd = cfg.n_fft
        sel = tuple(range(cfg.n_fft))
    prec = jax.lax.Precision.HIGH if guard_bands \
        else jax.lax.Precision.HIGHEST

    # derot-DFT over ALL slots (order-agnostic; garbage slots discarded at
    # the end) — the operand is a plain lane slice of the kernel output
    y = dft_matmul_select_derot_planar(
        cr[..., cfg.cp_len:cfg.cp_len + cfg.n_fft],
        ci[..., cfg.cp_len:cfg.cp_len + cfg.n_fft],
        sel, f_delta, sample_offset=cfg.cp_len, precision=prec)
    sloti = jnp.arange(slots)
    c_of = (sloti % m_per) * n_cls + sloti // m_per
    rot = phasor(f_delta[..., None] * rd(sym) * c_of.astype(rd))
    y = y * rot[..., :, None].astype(y.dtype)

    eq = y / h_k[..., sel][..., None, :]
    if guard_bands:
        phi = jnp.mean(jnp.angle(eq[..., nd:]), axis=-1, keepdims=True)
        data = eq[..., :nd] * jnp.exp(-1j * phi.astype(eq.real.dtype)
                                      ).astype(eq.dtype)
    else:
        data = eq
    from .modulation import demodulate_symbols_packed
    syms = data.reshape(*data.shape[:-2], -1)        # [.., slots * nd]
    by = demodulate_symbols_packed(syms, modulation)
    from .modulation import BITS_PER_SYMBOL
    bpb = nd * BITS_PER_SYMBOL[modulation] // 8
    by = by.reshape(*by.shape[:-1], slots, bpb)
    perm = jnp.asarray([slot_of(c) for c in range(cfg.n_sync_chunks,
                                                  n_chunks)])
    by = jnp.take(by, perm, axis=-2)                 # chunk order, tiny
    return by.reshape(*by.shape[:-2], -1)
