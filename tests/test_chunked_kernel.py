"""Slot-major chunked sync+align kernel (kernels/chain_pallas.py) parity.

Interpret mode on CPU; the compiled path is exercised on TPU by the round-5
harness (tools/exp_r5_harness.py) and the multichip dryrun.  The invariant:
payload bytes EXACT vs the transmitted data and vs decode_frame's default
route.  (The round-4 one-pass full-chain kernel these tests used to cover
was removed in round 5 — docs/MOSAIC_TECHNIQUES.md; the chunk-regroup
machinery it pioneered lives on here.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ofdm_tpu as ot
from ofdm_tpu import constants
from ofdm_tpu.config import DEFAULT_CONFIG as cfg
from ofdm_tpu.kernels.chain_pallas import sync_align_chunked
from ofdm_tpu.phy.rx import decode_chunked_matrix

TPL = np.asarray(constants.locking_for(cfg)).astype(np.complex64)


def _frame_batch(rng, n_rows, payload_len, mod, gb, snr, key, timing=True):
    data = rng.integers(0, 256, (n_rows, payload_len), dtype=np.uint8)
    tx = ot.encode(data, guard_bands=gb, modulation=mod, dtype=jnp.complex64)
    rx = ot.channel(tx, snr=snr, timing_error=timing,
                    key=jax.random.key(key)).astype(jnp.complex64)
    nb = ot.n_data_blocks(payload_len, mod, gb)
    need = (cfg.n_sync_chunks + nb) * cfg.sym_len
    rx = jnp.pad(rx, ((0, 0), (0, max(0, need + 40 - rx.shape[-1]))))
    return data, rx, nb


@pytest.mark.parametrize("mod,snr", [
    (ot.Modulation.BPSK, 30.0),
    (ot.Modulation.QPSK, 30.0),
    (ot.Modulation.QAM16, 35.0),
    (ot.Modulation.QAM64, 45.0),
    (ot.Modulation.QAM256, 55.0),
])
def test_chunked_payload_exact_all_modulations(mod, snr):
    rng = np.random.default_rng(5)
    data, rx, nb = _frame_batch(rng, 4, 240, mod, True, snr, key=3)
    out = np.asarray(ot.decode_frame(rx, n_blocks=nb, guard_bands=True,
                                     modulation=mod, align_impl="chunked"))
    np.testing.assert_array_equal(out[:, 16:16 + 240], data)
    ref = np.asarray(ot.decode_frame(rx, n_blocks=nb, guard_bands=True,
                                     modulation=mod))
    # header+payload byte-exact vs the default route (pad symbols of the
    # last block may round differently across reduction orders)
    np.testing.assert_array_equal(out[:, :16 + 240], ref[:, :16 + 240])


def test_chunked_no_guard_bands():
    rng = np.random.default_rng(6)
    data, rx, nb = _frame_batch(rng, 3, 200, ot.Modulation.QPSK, False,
                                30.0, key=4)
    out = np.asarray(ot.decode_frame(rx, n_blocks=nb, guard_bands=False,
                                     modulation=ot.Modulation.QPSK,
                                     align_impl="chunked"))
    np.testing.assert_array_equal(out[:, 16:16 + 200], data)


def test_chunked_planar_input_matches_complex():
    rng = np.random.default_rng(7)
    data, rx, nb = _frame_batch(rng, 3, 120, ot.Modulation.QAM16, True,
                                35.0, key=5)
    n_chunks = cfg.n_sync_chunks + nb
    (ar, ai), slots, m_per = sync_align_chunked(rx, TPL, n_chunks=n_chunks,
                                                interpret=True)
    planes = jnp.stack([jnp.real(rx), jnp.imag(rx)], axis=1)
    (br, bi), _, _ = sync_align_chunked(planes, TPL, n_chunks=n_chunks,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(ar), np.asarray(br), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(ai), np.asarray(bi), rtol=0, atol=0)
    out = np.asarray(decode_chunked_matrix(
        (ar, ai), n_chunks=n_chunks, m_per=m_per, guard_bands=True,
        modulation=ot.Modulation.QAM16))
    np.testing.assert_array_equal(out[:, 16:16 + 120], data)


def test_chunked_search_window_bounds_acquisition():
    rng = np.random.default_rng(8)
    data, rx, nb = _frame_batch(rng, 2, 120, ot.Modulation.QPSK, True,
                                35.0, key=6, timing=False)
    # push the frame 600 samples in; a 1024 window finds it, 64 misses it
    delayed = jnp.concatenate(
        [jnp.zeros((rx.shape[0], 600), rx.dtype), rx], axis=-1)
    found = np.asarray(ot.decode_frame(delayed, n_blocks=nb,
                                       guard_bands=True,
                                       modulation=ot.Modulation.QPSK,
                                       align_impl="chunked",
                                       search_window=1024))
    np.testing.assert_array_equal(found[:, 16:16 + 120], data)
    missed = np.asarray(ot.decode_frame(delayed, n_blocks=nb,
                                        guard_bands=True,
                                        modulation=ot.Modulation.QPSK,
                                        align_impl="chunked",
                                        search_window=64))
    assert (missed[:, 16:16 + 120] != data).any()


def test_chunked_boundary_offsets():
    """Frame starts at lane/tile boundary offsets exercise every roll class
    of the selection-matmul regroup."""
    rng = np.random.default_rng(9)
    payload = rng.integers(0, 256, 90, dtype=np.uint8)
    tx = np.asarray(ot.encode(payload, guard_bands=True,
                              modulation=ot.Modulation.QPSK,
                              dtype=jnp.complex64))
    nb = ot.n_data_blocks(90, ot.Modulation.QPSK, True)
    need = (cfg.n_sync_chunks + nb) * cfg.sym_len
    offs = [0, 1, 79, 80, 127, 128, 129, 255]
    T = need + 400
    s = 0.003 * (rng.standard_normal((len(offs), T))
                 + 1j * rng.standard_normal((len(offs), T)))
    for i, off in enumerate(offs):
        s[i, off:off + tx.shape[-1]] += tx
    s = jnp.asarray(s.astype(np.complex64))
    out = np.asarray(ot.decode_frame(s, n_blocks=nb, guard_bands=True,
                                     modulation=ot.Modulation.QPSK,
                                     align_impl="chunked"))
    np.testing.assert_array_equal(out[:, 16:16 + 90],
                                  np.tile(payload, (len(offs), 1)))


def test_decode_frame_planar_entry_forms():
    """decode_frame_planar matches decode_frame for the [R, 2, T] and the
    pre-tiled [R, 2, tiles, 128] (planar_input_format) argument forms."""
    rng = np.random.default_rng(12)
    data, rx, nb = _frame_batch(rng, 3, 120, ot.Modulation.QPSK, True,
                                35.0, key=9)
    planes = jnp.stack([jnp.real(rx), jnp.imag(rx)], axis=1)
    ref = np.asarray(ot.decode_frame(rx, n_blocks=nb, guard_bands=True,
                                     modulation=ot.Modulation.QPSK))
    pl_out = np.asarray(ot.decode_frame_planar(
        planes, n_blocks=nb, guard_bands=True,
        modulation=ot.Modulation.QPSK))
    np.testing.assert_array_equal(pl_out, ref)
    t = planes.shape[-1]
    tiles = -(-t // 128) + 1
    p4 = jnp.pad(planes, ((0, 0), (0, 0), (0, tiles * 128 - t))
                 ).reshape(planes.shape[0], 2, tiles, 128)
    p4_out = np.asarray(ot.decode_frame_planar(
        p4, n_blocks=nb, guard_bands=True, modulation=ot.Modulation.QPSK))
    np.testing.assert_array_equal(p4_out, ref)
    np.testing.assert_array_equal(ref[:, 16:16 + 120], data)


def test_chunked_custom_geometry():
    """The class-phase regrouping must generalize beyond sym_len=80:
    sym=96 gives gcd(96,128)=32 -> 4 classes x 3-tile span."""
    from ofdm_tpu.config import FrameConfig
    c2 = FrameConfig(n_fft=80, cp_len=16, locking_seed=7,
                     pilot_indices=(3, 20, 50, 70))
    rng = np.random.default_rng(14)
    data = rng.integers(0, 256, (3, 100), dtype=np.uint8)
    tx = ot.encode(data, guard_bands=False, modulation=ot.Modulation.QPSK,
                   cfg=c2, dtype=jnp.complex64)
    rx = ot.channel(tx, snr=35.0, key=jax.random.key(2)).astype(jnp.complex64)
    nb = ot.n_data_blocks(100, ot.Modulation.QPSK, False, c2)
    need = (c2.n_sync_chunks + nb) * c2.sym_len
    rx = jnp.pad(rx, ((0, 0), (0, max(0, need + 40 - rx.shape[-1]))))
    tpl = np.asarray(constants.locking_for(c2)).astype(np.complex64)
    n_chunks = c2.n_sync_chunks + nb
    chun, slots, m_per = sync_align_chunked(rx, tpl, n_chunks=n_chunks,
                                            cfg=c2, interpret=True)
    out = np.asarray(decode_chunked_matrix(
        chun, n_chunks=n_chunks, m_per=m_per, guard_bands=False,
        modulation=ot.Modulation.QPSK, cfg=c2))
    np.testing.assert_array_equal(out[:, 16:16 + 100], data)


def test_chunked_sync_align_and_tail_parity():
    """sync_align_chunked + decode_chunked_matrix (slot-ordered tail) must
    byte-match decode_frame on the payload across modulations."""
    rng = np.random.default_rng(15)
    for mod, snr in [(ot.Modulation.QPSK, 35.0), (ot.Modulation.QAM64, 45.0)]:
        data, rx, nb = _frame_batch(rng, 3, 240, mod, True, snr, key=8)
        n_chunks = cfg.n_sync_chunks + nb
        chun, slots, m_per = sync_align_chunked(rx, TPL, n_chunks=n_chunks,
                                                interpret=True)
        out = np.asarray(decode_chunked_matrix(
            chun, n_chunks=n_chunks, m_per=m_per, guard_bands=True,
            modulation=mod))
        ref = np.asarray(ot.decode_frame(rx, n_blocks=nb, guard_bands=True,
                                         modulation=mod))
        np.testing.assert_array_equal(out[:, :16 + 240], ref[:, :16 + 240])
        np.testing.assert_array_equal(out[:, 16:16 + 240], data)
        assert out.shape == ref.shape


def test_decode_frame_chunked_option():
    """decode_frame(align_impl='chunked') routes sync_align_chunked + the
    slot-ordered tail (interpret off-TPU) and matches the default bytes."""
    rng = np.random.default_rng(16)
    data, rx, nb = _frame_batch(rng, 2, 120, ot.Modulation.QAM16, True,
                                35.0, key=10)
    out = np.asarray(ot.decode_frame(rx, n_blocks=nb, guard_bands=True,
                                     modulation=ot.Modulation.QAM16,
                                     align_impl="chunked"))
    ref = np.asarray(ot.decode_frame(rx, n_blocks=nb, guard_bands=True,
                                     modulation=ot.Modulation.QAM16))
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(out[:, 16:16 + 120], data)
