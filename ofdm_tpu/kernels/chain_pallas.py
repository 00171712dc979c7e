"""Fully-fused Pallas rx chain: sync + align + CFO + derot-DFT + equalize +
demod + byte pack in ONE VMEM-resident pass per row.

Round-4 HLO audit (docs/BENCHMARKS.md "Round-4 fused chain"): the production
XLA pipeline around the fused sync+align kernel spent ~240 MB/step of HBM
writes on layout copies and operand materialization between the kernel and
the demod tail (XLA prefers batch-minor layouts for the big 3D tensors,
Mosaic requires row-major; every handoff is a full-stream relayout).  The
only way to kill that traffic is to keep the stream inside the kernel until
the data is small: this kernel reads the planar sample stream once from HBM
and writes only the packed payload words (s32, ~2% of the stream bytes) plus
a tiny diagnostics row.

Per-row pipeline (reference math as in phy/rx.py decode_aligned, cited
there against src/receiver.rs):

  1. frame sync: banded-Toeplitz correlation matmul + first-occurrence
     argmax (same as align_pallas._sync_align_kernel; real templates only).
  2. CFO (coherent): corr = sum over the last preamble chunk of
     s[j+sym] * conj(s[j]); f_delta = |atan2(corr)| / sym_len.  atan2 is the
     demod_pallas polynomial (~2e-4 rad); the pilot-phase correction absorbs
     the residual per-block constant, so the error is sub-decision.
  3. chunk regrouping WITHOUT strided slices or reshapes: the stream is
     windowed n_cls = 128/gcd(sym_len, 128) times (class p shifted by
     (sym_len*p) % 128 lanes), which lands every chunk of class p on a tile
     boundary; a 0/1 selection MATMUL S_p[m, k] then gathers the class's
     chunk rows into a [m_per, 128] block (MXU does the strided gather).
  4. derot-DFT: the per-sample CFO phasor is folded into the row-scaled DFT
     matrix built in-kernel from cos/sin (ops/fft.py dft_matmul_select_derot
     math); one [slots, 128] x [128, 128] complex matmul per plane pair.
     Rows outside [cp_len, cp_len + n_fft) are zero in the weight planes, so
     CP samples and chunk-tail overrun lanes multiply by zero (all values
     are defined stream samples - no Mosaic garbage-lane hazard).
  5. per-chunk phase + channel estimate: training rows are gathered with
     another 0/1 matmul (avoids sublane-offset-1 row slices), h_k =
     mean(Y_tr * (1/T_ref)), invh = conj(h)/|h|^2.
  6. equalize + pilot residual phase + hard-decision demod + LSB-first byte
     pack: same math as kernels/demod_pallas.py (shared helpers), with the
     pack matmul TRANSPOSED (pack^T contracted against the bit planes' lane
     axis) so the output is [2*n_words, slots] - lane dim = slots stays
     dense and the HBM output buffer is ~2% of the stream instead of a
     128-lane-padded word tensor.

The XLA epilogue only touches the tiny word tensor: transpose, class-major
-> chunk-order gather, lo+hi<<16 recombine, bitcast to bytes.

Byte-level agreement with decode_frame is gated by tests at operating SNRs
(exact payload equality); bitwise f32 agreement with the XLA path is not
expected (different reduction orders, polynomial atan2).
"""

from __future__ import annotations

import functools
from functools import lru_cache
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_CONFIG, FrameConfig
from ..phy.modulation import BITS_PER_SYMBOL, Modulation
from .align_pallas import _take_window
from .demod_pallas import _atan2_soft, _gray_planes, _pack_matrix_lanes

LANE = 128


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a[K, M] x b[N, K] -> [M, N] (both operands 'transposed'): contracts
    a's sublane dim with b's lane dim so the OUTPUT lane dim is b's sublane
    count - used for the transposed byte-pack matmul."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _chain_kernel(in_ref, w_ref, s_ref, s1_ref, wr_ref, wi_ref, tsel_ref,
                  rinv_ref, pack_ref, out_ref, diag_ref, *,
                  t, max_off, sym, cp, n_fft, n_cls, m_per, span, k_pad,
                  n_lag_tiles, lag_bound, last_chunk, n_train,
                  n_data, n_pilots, bps, n_words, real_template, profile):
    # ---- 1. frame sync (align_pallas real-template form) ----------------
    sr = in_ref[0, 0]
    si = in_ref[0, 1]
    n_tiles = sr.shape[0]
    srn = pltpu.roll(sr, shift=n_tiles - 1, axis=0)
    sin = pltpu.roll(si, shift=n_tiles - 1, axis=0)
    n = n_lag_tiles
    if real_template:
        cre = _dot(sr[:n], w_ref[0:128, :]) + _dot(srn[:n], w_ref[128:256, :])
        cim = _dot(si[:n], w_ref[0:128, :]) + _dot(sin[:n], w_ref[128:256, :])
    else:
        # generic complex template: decomposed [.., 512] x [512, 256]
        # product (align_pallas._sync_align_kernel form)
        c = (_dot(sr[:n], w_ref[0:128, :]) + _dot(srn[:n], w_ref[128:256, :])
             + _dot(si[:n], w_ref[256:384, :])
             + _dot(sin[:n], w_ref[384:512, :]))
        cre, cim = c[:, :128], c[:, 128:]
    power = cre * cre + cim * cim
    tiles_i = jax.lax.broadcasted_iota(jnp.int32, power.shape, 0)
    lanes_i = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1)
    lag = tiles_i * 128 + lanes_i
    p = jnp.where(lag < lag_bound, power, -1.0)
    peak = jnp.max(p)
    idx = jnp.min(jnp.where(p == peak, lag, jnp.int32(2 * t)))
    off = jnp.clip(idx - 1, 0, max_off)

    if profile == "sync_only":
        x = jnp.zeros((n_cls * m_per, LANE), jnp.float32) + peak \
            + off.astype(jnp.float32)
        out_ref[0] = _dot_t(pack_ref[0], x).astype(jnp.int32)
        diag_ref[0] = jnp.zeros((8, LANE), jnp.float32) + peak
        return

    # ---- 3. chunk regrouping: ONE window + selection MATMULS ------------
    # v1 took n_cls shifted windows (heavy VPU roll/select passes over the
    # whole window per class — measured 1.8 ms/step); v2 takes the window
    # once and lets the MXU do the strided gather: S/S1 pick each slot's
    # low/high tile row, then a per-class static lane roll + carry select
    # on the TINY [m_per, 128] class block aligns the chunk to lane 0.
    w = _take_window(in_ref, off, k_pad)            # [2, k_pad, 128]
    xlr = _dot(s_ref[:, :], w[0])                   # [slots, 128] low tile
    xli = _dot(s_ref[:, :], w[1])
    xhr = _dot(s1_ref[:, :], w[0])                  # [slots, 128] tile + 1
    xhi = _dot(s1_ref[:, :], w[1])

    def regroup(xl, xh):
        parts = []
        for q in range(n_cls):
            s_q = (sym * q) % 128
            lo = xl[q * m_per:(q + 1) * m_per, :]
            hi = xh[q * m_per:(q + 1) * m_per, :]
            if s_q == 0:
                parts.append(lo)
                continue
            rl = pltpu.roll(lo, shift=128 - s_q, axis=1)
            rh = pltpu.roll(hi, shift=128 - s_q, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, rl.shape, 1)
            parts.append(jnp.where(lane < 128 - s_q, rl, rh))
        return jnp.concatenate(parts, axis=0)       # [slots, 128]

    chre = regroup(xlr, xhr)
    chim = regroup(xli, xhi)

    # ---- 2. coherent CFO from the regrouped preamble chunk rows ---------
    # chunk c lives at slot (c % n_cls) * m_per + c // n_cls; lanes 0:sym
    # hold its samples.  corr = sum right * conj(left) over the full chunk.
    sl_l = (last_chunk - 1) % n_cls * m_per + (last_chunk - 1) // n_cls
    sl_r = last_chunk % n_cls * m_per + last_chunk // n_cls
    lr = chre[sl_l:sl_l + 1, :]
    li = chim[sl_l:sl_l + 1, :]
    rr = chre[sl_r:sl_r + 1, :]
    ri = chim[sl_r:sl_r + 1, :]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, lr.shape, 1)
    cm = lane1 < sym
    corr_re = jnp.sum(jnp.where(cm, rr * lr + ri * li, 0.0))
    corr_im = jnp.sum(jnp.where(cm, ri * lr - rr * li, 0.0))
    f_delta = jnp.abs(_atan2_soft(corr_im, corr_re)) / jnp.float32(sym)

    # ---- 4. derot-DFT: row-phased select matrix built in-kernel ---------
    rowi = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
    ang = f_delta * rowi.astype(jnp.float32)
    cr = jnp.cos(ang)
    ci = -jnp.sin(ang)
    wr = wr_ref[:, :]
    wi = wi_ref[:, :]
    wpr = cr * wr - ci * wi                         # [128, 128]
    wpi = cr * wi + ci * wr
    yr = _dot(chre, wpr) - _dot(chim, wpi)          # [slots, 128]
    yi = _dot(chre, wpi) + _dot(chim, wpr)

    # ---- 5a. per-chunk phase exp(-i f sym c) on the bin rows ------------
    slots = n_cls * m_per
    sloti = jax.lax.broadcasted_iota(jnp.int32, (slots, 1), 0)
    c_of = (sloti % m_per) * n_cls + sloti // m_per
    angc = f_delta * jnp.float32(sym) * c_of.astype(jnp.float32)
    cc = jnp.cos(angc)
    cs = jnp.sin(angc)
    yr, yi = yr * cc + yi * cs, yi * cc - yr * cs

    # ---- 5b. channel estimate from the training rows --------------------
    trr = _dot(tsel_ref[:, :], yr)                  # [8, 128]
    tri = _dot(tsel_ref[:, :], yi)
    rir = rinv_ref[:, 0:128]
    rii = rinv_ref[:, 128:256]
    inv_n = jnp.float32(1.0 / n_train)
    hr = jnp.sum(trr * rir - tri * rii, axis=0, keepdims=True) * inv_n
    hi = jnp.sum(trr * rii + tri * rir, axis=0, keepdims=True) * inv_n
    hm = hr * hr + hi * hi
    hm = jnp.maximum(hm, jnp.float32(1e-37))
    ihr = hr / hm                                   # [1, 128]
    ihi = -hi / hm

    # ---- profiling cut points (profile != "full" outputs garbage) -------
    if profile == "no_dft":
        out_ref[0] = _dot_t(pack_ref[0], chre).astype(jnp.int32)
        diag_ref[0] = jnp.zeros((8, LANE), jnp.float32) + f_delta
        return
    if profile == "no_tail":
        out_ref[0] = _dot_t(pack_ref[0], yr).astype(jnp.int32)
        diag_ref[0] = jnp.zeros((8, LANE), jnp.float32) + ihr
        return

    # ---- 6. equalize + pilot phase + demod + transposed pack ------------
    e_r = yr * ihr - yi * ihi
    e_i = yr * ihi + yi * ihr
    if n_pilots and profile != "no_atan2":
        lane = jax.lax.broadcasted_iota(jnp.int32, e_r.shape, 1)
        pilot = (lane >= n_data) & (lane < n_data + n_pilots)
        at2 = _atan2_soft(e_i, e_r)
        phi = jnp.sum(jnp.where(pilot, at2, 0.0), axis=1, keepdims=True) \
            * jnp.float32(1.0 / n_pilots)
        pc, ps = jnp.cos(phi), jnp.sin(phi)
        d_r = e_r * pc + e_i * ps
        d_i = e_i * pc - e_r * ps
    else:
        d_r, d_i = e_r, e_i
    if bps == 1:
        planes = [(d_r > 0.0).astype(jnp.float32)]
    elif bps == 2:
        l = d_r >= 0.0
        r = jnp.where(l, d_i >= 0.0, d_i > 0.0)
        planes = [l.astype(jnp.float32), r.astype(jnp.float32)]
    else:
        half = bps // 2
        n_levels = 1 << half
        planes = _gray_planes(d_r, half, n_levels) + \
            _gray_planes(d_i, half, n_levels)
    if profile == "no_pack":
        out_ref[0] = _dot_t(pack_ref[0], planes[0]).astype(jnp.int32)
    else:
        lohi = _dot_t(pack_ref[0], planes[0])       # [2*n_words, slots]
        for b in range(1, bps):
            lohi = lohi + _dot_t(pack_ref[b], planes[b])
        out_ref[0] = lohi.astype(jnp.int32)

    z = jnp.zeros((1, LANE), jnp.float32)
    diag_ref[0] = jnp.concatenate(
        [z + f_delta, z + off.astype(jnp.float32), hr, hi,
         jnp.zeros((4, LANE), jnp.float32)], axis=0)


@lru_cache(maxsize=None)
def _class_geometry(sym: int, n_chunks: int):
    n_cls = 128 // gcd(sym, 128)
    span = sym * n_cls // 128
    m_per = -(-n_chunks // n_cls)
    m_per = -(-m_per // 8) * 8
    # +2: the high-tile select (S1) reads row k0 + span*m + 1
    k_rows = 2 + max((sym * q - (sym * q) % 128) // 128 + span * (m_per - 1)
                     for q in range(n_cls))
    k_pad = -(-k_rows // 8) * 8
    return n_cls, span, m_per, k_pad


@lru_cache(maxsize=None)
def _select_matrix(sym: int, n_chunks: int, hi: bool = False) -> np.ndarray:
    """[n_cls * m_per, k_pad] 0/1 gather: row q*m_per + m selects window
    tile row floor(sym*(m*n_cls + q)/128) (+1 for the ``hi`` carry tile) —
    chunk c = m*n_cls + q starts at lane (sym*q) % 128 of that tile."""
    n_cls, span, m_per, k_pad = _class_geometry(sym, n_chunks)
    s = np.zeros((n_cls * m_per, k_pad), np.float32)
    for q in range(n_cls):
        k0 = (sym * q - (sym * q) % 128) // 128
        for m in range(m_per):
            s[q * m_per + m, k0 + span * m + (1 if hi else 0)] = 1.0
    return s


@lru_cache(maxsize=None)
def _train_select_matrix(sym: int, n_chunks: int, t0: int, n_train: int) -> np.ndarray:
    """[8, slots] 0/1 rows gathering the n_train training-chunk slots."""
    n_cls, _, m_per, _ = _class_geometry(sym, n_chunks)
    s = np.zeros((8, n_cls * m_per), np.float32)
    for i in range(n_train):
        c = t0 + i
        slot = (c % n_cls) * m_per + c // n_cls
        s[i, slot] = 1.0
    return s


@lru_cache(maxsize=None)
def _chunk_perm(sym: int, n_chunks: int, n_sync: int) -> np.ndarray:
    """slot index of data chunk c for c in [n_sync, n_chunks)."""
    n_cls, _, m_per, _ = _class_geometry(sym, n_chunks)
    return np.array([(c % n_cls) * m_per + c // n_cls
                     for c in range(n_sync, n_chunks)], np.int32)


@lru_cache(maxsize=None)
def _dft_row_planes(n_fft: int, cp: int, sel: tuple):
    """[128, 128] W planes: rows cp..cp+n_fft hold DFT[j, sel[k]], rest 0."""
    from ..ops.fft import _dft_select_planes
    wr64, wi64 = _dft_select_planes(n_fft, sel, "float32")
    wr = np.zeros((LANE, LANE), np.float32)
    wi = np.zeros((LANE, LANE), np.float32)
    wr[cp:cp + n_fft, :len(sel)] = wr64
    wi[cp:cp + n_fft, :len(sel)] = wi64
    return wr, wi


@lru_cache(maxsize=None)
def _refinv_planes(n_fft: int, seed: int, sel: tuple, n_train: int):
    """[8, 256]: rows 0..n_train = re/im of 1/T_ref at sel bins."""
    from .. import constants
    tref = constants.training_signals(n_fft, seed)    # [n_fft], shared by
    inv = 1.0 / tref[list(sel)]                       # all training chunks
    out = np.zeros((8, 2 * LANE), np.float32)
    out[:n_train, :len(sel)] = inv.real.astype(np.float32)
    out[:n_train, LANE:LANE + len(sel)] = inv.imag.astype(np.float32)
    return out


def decode_chain(flat, template, *, n_blocks: int,
                 modulation: Modulation = Modulation.BPSK,
                 guard_bands: bool = False,
                 cfg: FrameConfig = DEFAULT_CONFIG,
                 search_window: int | None = None,
                 interpret: bool = False,
                 return_diag: bool = False,
                 profile: str = "full"):
    """Fused-chain decode: complex64[R, T] or planar f32[R, 2, T] ->
    uint8[R, n_bytes] (bytes in decode_frame's layout: n_blocks data blocks,
    demod-packed).  TPU production path for real locking templates,
    sym_len <= 128, coherent CFO; see module docstring.  The caller
    (phy/rx.py decode_frame) handles eligibility and fallback."""
    from ..ops.xcorr import (_TEMPLATE_STORE, _template_is_real,
                             _toeplitz_template, _toeplitz_template_real)
    sym = cfg.sym_len
    assert sym <= 128, "fused chain needs sym_len <= 128"
    n_chunks = cfg.n_sync_chunks + n_blocks
    need = n_chunks * sym
    tpl = np.asarray(template)
    k = tpl.shape[-1]
    assert k <= 128
    key = (tpl.tobytes(), k)
    _TEMPLATE_STORE[key] = tpl
    real_template = _template_is_real(tpl)
    if real_template:
        w = jnp.asarray(_toeplitz_template_real(key, k, "float32"))  # [256,128]
    else:
        w = jnp.asarray(_toeplitz_template(key, k, "float32"))       # [512,256]

    if flat.ndim == 3:                       # planar [R, 2, T]
        r, _, t = flat.shape
        planes = flat.astype(jnp.float32)
    else:
        r, t = flat.shape
        planes = jnp.stack([jnp.real(flat), jnp.imag(flat)],
                           axis=1).astype(jnp.float32)
    assert t >= need

    n_cls, span, m_per, k_pad = _class_geometry(sym, n_chunks)
    lag_bound = t if search_window is None else min(t, search_window + k)
    n_lag_tiles = -(-lag_bound // 128)
    # _take_window reads k_pad + 1 tiles from q = off // 128
    if flat.ndim == 3 and t % 128 == 0 and t // 128 >= k_pad + 2:
        # pre-padded planar input: zero input-side copies (see sync_align);
        # sync offsets clip to the last position whose window fits
        tiles = t // 128
        n_lag_tiles = min(n_lag_tiles, tiles - 1)
        lag_bound = min(lag_bound, n_lag_tiles * 128)
    else:
        tiles = max(n_lag_tiles + 1, (t - need) // 128 + k_pad + 2)
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, tiles * 128 - t)))
    planes = planes.reshape(r, 2, tiles, 128)
    max_off = min(t - need, (tiles - k_pad - 1) * 128 - 1)
    assert max_off >= 0

    if guard_bands:
        sel = tuple(cfg.data_indices) + tuple(cfg.pilot_indices)
        n_data, n_pilots = len(cfg.data_indices), len(cfg.pilot_indices)
    else:
        sel = tuple(range(cfg.n_fft))
        n_data, n_pilots = cfg.n_fft, 0
    bps = BITS_PER_SYMBOL[modulation]
    n_bits = n_data * bps
    assert n_bits % 8 == 0
    n_bytes_pb = n_bits // 8
    n_words = -(-n_bytes_pb // 4)

    wr, wi = _dft_row_planes(cfg.n_fft, cfg.cp_len, sel)
    t0 = cfg.n_locking + cfg.n_preamble
    smat = jnp.asarray(_select_matrix(sym, n_chunks))
    smat1 = jnp.asarray(_select_matrix(sym, n_chunks, hi=True))
    tsel = jnp.asarray(_train_select_matrix(sym, n_chunks, t0, cfg.n_training))
    rinv = jnp.asarray(_refinv_planes(cfg.n_fft, cfg.training_seed, sel,
                                      cfg.n_training))
    pack = jnp.asarray(_pack_matrix_lanes(LANE, n_data, bps))
    slots = n_cls * m_per

    kern = functools.partial(
        _chain_kernel, t=t, max_off=max_off, sym=sym, cp=cfg.cp_len,
        n_fft=cfg.n_fft, n_cls=n_cls, m_per=m_per, span=span, k_pad=k_pad,
        n_lag_tiles=n_lag_tiles, lag_bound=lag_bound,
        last_chunk=cfg.n_locking + cfg.n_preamble - 1, n_train=cfg.n_training,
        n_data=n_data, n_pilots=n_pilots, bps=bps, n_words=n_words,
        real_template=real_template, profile=profile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 2, tiles, 128), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(tuple(w.shape), lambda i: (0, 0)),
            pl.BlockSpec((slots, k_pad), lambda i: (0, 0)),
            pl.BlockSpec((slots, k_pad), lambda i: (0, 0)),
            pl.BlockSpec((LANE, LANE), lambda i: (0, 0)),
            pl.BlockSpec((LANE, LANE), lambda i: (0, 0)),
            pl.BlockSpec((8, slots), lambda i: (0, 0)),
            pl.BlockSpec((8, 2 * LANE), lambda i: (0, 0)),
            pl.BlockSpec((bps, LANE, 2 * n_words), lambda i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * n_words, slots), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0)),
        ],
    )
    words, diag = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r, 2 * n_words, slots), jnp.int32),
            jax.ShapeDtypeStruct((r, 8, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(planes, w, smat, smat1, jnp.asarray(wr), jnp.asarray(wi), tsel, rinv,
      pack)

    # tiny XLA epilogue on the word tensor
    perm = jnp.asarray(_chunk_perm(sym, n_chunks, cfg.n_sync_chunks))
    wt = jnp.swapaxes(words, -1, -2)                 # [R, slots, 2w]
    wt = jnp.take(wt, perm, axis=-2)                 # [R, n_blocks, 2w]
    lo = wt[..., :n_words]
    hi = wt[..., n_words:]
    by = jax.lax.bitcast_convert_type(lo + (hi << 16), jnp.uint8)
    by = by.reshape(r, n_blocks, 4 * n_words)[..., :n_bytes_pb]
    out = by.reshape(r, n_blocks * n_bytes_pb)
    if return_diag:
        return out, {"f_delta": diag[:, 0, 0], "offset": diag[:, 1, 0],
                     "h_k": jax.lax.complex(diag[:, 2, :len(sel)],
                                            diag[:, 3, :len(sel)])}
    return out


def _sync_chunk_kernel(in_ref, w_ref, s_ref, s1_ref, outr_ref, outi_ref, *,
                       t, max_off, sym, n_cls, m_per, k_pad,
                       n_lag_tiles, lag_bound, real_template):
    """sync + align + chunk regroup ONLY: emits slot-major chunk planes
    f32[2, slots, 128] (chunk c at slot (c % n_cls) * m_per + c // n_cls,
    samples at lanes 0:sym).  The decode tail then never needs the
    row-major -> batch-minor relayout + [.., n_chunks, sym] reshape copies
    of the contiguous-window output (round-4 HLO audit: ~136 MB/step)."""
    sr = in_ref[0, 0]
    si = in_ref[0, 1]
    n_tiles = sr.shape[0]
    srn = pltpu.roll(sr, shift=n_tiles - 1, axis=0)
    sin = pltpu.roll(si, shift=n_tiles - 1, axis=0)
    n = n_lag_tiles
    if real_template:
        cre = _dot(sr[:n], w_ref[0:128, :]) + _dot(srn[:n], w_ref[128:256, :])
        cim = _dot(si[:n], w_ref[0:128, :]) + _dot(sin[:n], w_ref[128:256, :])
    else:
        c = (_dot(sr[:n], w_ref[0:128, :]) + _dot(srn[:n], w_ref[128:256, :])
             + _dot(si[:n], w_ref[256:384, :])
             + _dot(sin[:n], w_ref[384:512, :]))
        cre, cim = c[:, :128], c[:, 128:]
    power = cre * cre + cim * cim
    tiles_i = jax.lax.broadcasted_iota(jnp.int32, power.shape, 0)
    lanes_i = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1)
    lag = tiles_i * 128 + lanes_i
    p = jnp.where(lag < lag_bound, power, -1.0)
    peak = jnp.max(p)
    idx = jnp.min(jnp.where(p == peak, lag, jnp.int32(2 * t)))
    off = jnp.clip(idx - 1, 0, max_off)

    w = _take_window(in_ref, off, k_pad)
    xlr = _dot(s_ref[:, :], w[0])
    xli = _dot(s_ref[:, :], w[1])
    xhr = _dot(s1_ref[:, :], w[0])
    xhi = _dot(s1_ref[:, :], w[1])

    def regroup(xl, xh):
        parts = []
        for q in range(n_cls):
            s_q = (sym * q) % 128
            lo = xl[q * m_per:(q + 1) * m_per, :]
            hi = xh[q * m_per:(q + 1) * m_per, :]
            if s_q == 0:
                parts.append(lo)
                continue
            rl = pltpu.roll(lo, shift=128 - s_q, axis=1)
            rh = pltpu.roll(hi, shift=128 - s_q, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, rl.shape, 1)
            parts.append(jnp.where(lane < 128 - s_q, rl, rh))
        return jnp.concatenate(parts, axis=0)

    # two separate plane outputs: a single [2, slots, 128] output gets
    # split into dense per-plane copies by the XLA tail (67 MB/step)
    outr_ref[0] = regroup(xlr, xhr)
    outi_ref[0] = regroup(xli, xhi)


def sync_align_chunked(flat, template, *, n_chunks: int,
                       cfg: FrameConfig = DEFAULT_CONFIG,
                       search_window: int | None = None,
                       interpret: bool = False):
    """complex64[R, T] or planar f32[R, 2, T] -> two f32[R, slots, 128]
    slot-major chunk planes (see _sync_chunk_kernel; separate re/im
    outputs so the tail never splits a stacked tensor).  Returns
    ((re, im), slots, m_per) — slot/chunk mapping as in decode_chain."""
    from ..ops.xcorr import (_TEMPLATE_STORE, _template_is_real,
                             _toeplitz_template, _toeplitz_template_real)
    sym = cfg.sym_len
    assert sym <= 128
    need = n_chunks * sym
    tpl = np.asarray(template)
    k = tpl.shape[-1]
    assert k <= 128
    key = (tpl.tobytes(), k)
    _TEMPLATE_STORE[key] = tpl
    real_template = _template_is_real(tpl)
    if real_template:
        w = jnp.asarray(_toeplitz_template_real(key, k, "float32"))
    else:
        w = jnp.asarray(_toeplitz_template(key, k, "float32"))

    if flat.ndim == 3:
        r, _, t = flat.shape
        planes = flat.astype(jnp.float32)
    else:
        r, t = flat.shape
        planes = jnp.stack([jnp.real(flat), jnp.imag(flat)],
                           axis=1).astype(jnp.float32)
    assert t >= need

    n_cls, span, m_per, k_pad = _class_geometry(sym, n_chunks)
    lag_bound = t if search_window is None else min(t, search_window + k)
    n_lag_tiles = -(-lag_bound // 128)
    if flat.ndim == 3 and t % 128 == 0 and t // 128 >= k_pad + 2:
        tiles = t // 128
        n_lag_tiles = min(n_lag_tiles, tiles - 1)
        lag_bound = min(lag_bound, n_lag_tiles * 128)
    else:
        tiles = max(n_lag_tiles + 1, (t - need) // 128 + k_pad + 2)
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, tiles * 128 - t)))
    planes = planes.reshape(r, 2, tiles, 128)
    max_off = min(t - need, (tiles - k_pad - 1) * 128 - 1)
    assert max_off >= 0

    smat = jnp.asarray(_select_matrix(sym, n_chunks))
    smat1 = jnp.asarray(_select_matrix(sym, n_chunks, hi=True))
    slots = n_cls * m_per
    kern = functools.partial(
        _sync_chunk_kernel, t=t, max_off=max_off, sym=sym, n_cls=n_cls,
        m_per=m_per, k_pad=k_pad, n_lag_tiles=n_lag_tiles,
        lag_bound=lag_bound, real_template=real_template)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 2, tiles, 128), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(tuple(w.shape), lambda i: (0, 0)),
            pl.BlockSpec((slots, k_pad), lambda i: (0, 0)),
            pl.BlockSpec((slots, k_pad), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, slots, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, slots, 128), lambda i: (i, 0, 0)),
        ],
    )
    outr, outi = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r, slots, 128), jnp.float32),
            jax.ShapeDtypeStruct((r, slots, 128), jnp.float32),
        ],
        interpret=interpret,
    )(planes, w, smat, smat1)
    return (outr, outi), slots, m_per
