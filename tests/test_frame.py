"""Frame assembly tests: wire-format parity with the reference transmitter."""

import jax.numpy as jnp
import numpy as np

import ofdm_tpu as ot
from ofdm_tpu import constants
from ofdm_tpu.config import DEFAULT_CONFIG as CFG
from ofdm_tpu.phy.tx import _sync_prefix, peak_normalize, symbols_to_blocks


def test_frame_length_formula():
    # 400-byte payload + 16-byte header = 3328 bits BPSK -> 52 blocks no-GB
    assert ot.n_data_blocks(400, ot.Modulation.BPSK, False) == 52
    assert ot.frame_len(400, ot.Modulation.BPSK, False) == 800 + 52 * 80
    # guardbands: 48 carriers -> ceil(3328/48) = 70 blocks
    assert ot.n_data_blocks(400, ot.Modulation.BPSK, True) == 70
    # QPSK halves the symbol count
    assert ot.n_data_blocks(400, ot.Modulation.QPSK, False) == 26


def test_guard_pilot_layout():
    # Layout from src/transmitter.rs:151-160.
    gm, pm, dm = CFG.guard_mask, CFG.pilot_mask, CFG.data_mask
    assert gm.sum() == 12 and pm.sum() == 4 and dm.sum() == 48
    assert all(gm[i] for i in [0, 1, 2, 3, 4, 5, 32, 59, 60, 61, 62, 63])
    assert all(pm[i] for i in [6, 25, 39, 58])
    assert not (gm & pm).any()


def test_sync_prefix_structure():
    pre = _sync_prefix(CFG)
    assert pre.shape == (800,)
    np.testing.assert_array_equal(pre[:80], constants.locking_signal(80))
    for i in range(4):
        np.testing.assert_array_equal(pre[80 + i * 80: 160 + i * 80],
                                      constants.preamble(80))
    # training blocks: IFFT + CP
    t = np.fft.ifft(constants.training_signals(64))
    expected = np.concatenate([t[-16:], t])
    for i in range(5):
        np.testing.assert_allclose(pre[400 + i * 80: 480 + i * 80], expected,
                                   atol=1e-12)


def test_block_layout_guardbands():
    # encode_block fills skipped bins with 0, pilots with 1+0j, data in order
    # (src/transmitter.rs:144-165).
    syms = jnp.arange(1, 49, dtype=jnp.complex128)  # one block of data
    blocks = np.asarray(symbols_to_blocks(syms, True))
    assert blocks.shape == (1, 64)
    b = blocks[0]
    np.testing.assert_array_equal(b[CFG.guard_mask], 0)
    np.testing.assert_array_equal(b[CFG.pilot_mask], 1)
    np.testing.assert_array_equal(b[CFG.data_mask], np.arange(1, 49))
    # data fills bins in ascending index order: first data bin is 7
    assert b[7] == 1 and b[8] == 2


def test_block_zero_padding():
    syms = jnp.ones(50, dtype=jnp.complex128)
    blocks = np.asarray(symbols_to_blocks(syms, False))
    assert blocks.shape == (1, 64)
    np.testing.assert_array_equal(blocks[0, 50:], 0)


def test_peak_normalize_reference_semantics():
    # src/transmitter.rs:183-194: divide by max positive re/im (no abs).
    x = jnp.asarray([-8.0 + 0j, 2.0 + 0j, 0.0 + 4.0j])
    out = np.asarray(peak_normalize(x))
    np.testing.assert_allclose(out, [-2 + 0j, 0.5 + 0j, 0 + 1j])


def test_encode_normalized_and_deterministic():
    data = bytes(range(100))
    tx = np.asarray(ot.encode(data, dtype=jnp.complex128))
    m = max(tx.real.max(), tx.imag.max())
    assert np.isclose(m, 1.0)
    tx2 = np.asarray(ot.encode(data, dtype=jnp.complex128))
    np.testing.assert_array_equal(tx, tx2)


def test_encode_batch_consistent_with_single():
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (3, 64), dtype=np.uint8)
    txb = np.asarray(ot.encode(batch, dtype=jnp.complex128))
    for i in range(3):
        np.testing.assert_allclose(
            txb[i], np.asarray(ot.encode(batch[i], dtype=jnp.complex128)),
            atol=1e-12)


def test_header_wire_format():
    from ofdm_tpu.packets.header import Header
    h = Header(400)
    b = h.to_bytes()
    assert len(b) == 16
    assert b[:2] == bytes([0x90, 0x01]) and all(x == 0 for x in b[2:])
    assert Header.from_bytes(b).packet_length == 400


def test_packed_spectrum_ifft_parity():
    """The tx-side packed sparse-spectrum IFFT (48 data bins + constant pilot
    waveform) must match the scatter + full-IFFT path to float tolerance and
    round-trip exactly."""
    from ofdm_tpu.phy.tx import encode_payload
    rng = np.random.default_rng(7)
    payload = jnp.asarray(rng.integers(0, 256, (3, 150), dtype=np.uint8))
    for mod in (ot.Modulation.QPSK, ot.Modulation.QAM64):
        full = np.asarray(encode_payload(payload, guard_bands=True,
                                         modulation=mod, pack_spectrum=False))
        packed = np.asarray(encode_payload(payload, guard_bands=True,
                                           modulation=mod, pack_spectrum=True))
        np.testing.assert_allclose(packed, full, atol=1e-5)


def test_packed_spectrum_roundtrip_exact():
    rng = np.random.default_rng(8)
    data = rng.integers(0, 256, 100, dtype=np.uint8)
    tx = ot.encode(data, guard_bands=True, modulation=ot.Modulation.QAM64)
    assert tx.dtype == jnp.complex64  # packed path active by default
    delayed = jnp.concatenate([jnp.zeros(5, tx.dtype), tx])
    out = ot.decode(delayed, guard_bands=True, modulation=ot.Modulation.QAM64)
    np.testing.assert_array_equal(out[:100], data)
