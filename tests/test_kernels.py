"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU
by the benchmark harness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ofdm_tpu import constants


def test_planar_align_pallas_matches_xla():
    """The Pallas alignment-copy kernel (tile-dim slice + lane rotate with
    cross-tile carry) must be bit-identical to the XLA planar gather for
    offsets hitting every alignment class (0, <128, =128 boundary, >128)."""
    from ofdm_tpu.kernels.align_pallas import planar_align
    from ofdm_tpu.phy.rx import _planar_align

    rng = np.random.default_rng(3)
    t, need = 2100, 1700
    flat = jnp.asarray((rng.standard_normal((7, t))
                        + 1j * rng.standard_normal((7, t))).astype(np.complex64))
    offs = jnp.asarray(np.array([0, 1, 127, 128, 129, 300, t - need],
                                dtype=np.int32))
    ref = np.asarray(_planar_align(flat, offs, need, impl="xla"))
    pal = np.asarray(planar_align(flat, offs, need, interpret=True))
    np.testing.assert_array_equal(pal, ref)


def test_fused_sync_align_matches_xla():
    """The fused sync+align kernel must reproduce sync_offset + planar
    alignment exactly on well-separated peaks (delays spanning tile
    boundaries and the clip edge)."""
    from ofdm_tpu.config import DEFAULT_CONFIG
    from ofdm_tpu.kernels.align_pallas import sync_align
    from ofdm_tpu.phy.rx import _planar_align, sync_offset

    tpl = np.asarray(constants.locking_for(DEFAULT_CONFIG)).astype(np.complex64)
    t, need = 2560, 2400
    delays = [0, 1, 63, 127, 128, 129, 150, 200]
    rng = np.random.default_rng(5)
    s = 0.01 * (rng.standard_normal((len(delays), t))
                + 1j * rng.standard_normal((len(delays), t)))
    for i, d in enumerate(delays):
        s[i, d:d + 80] += tpl
    s = jnp.asarray(s.astype(np.complex64))
    offs = jnp.clip(sync_offset(s, DEFAULT_CONFIG), 0, t - need)
    ref = np.asarray(_planar_align(s, offs, need, impl="xla"))
    got = np.asarray(sync_align(s, tpl, need, interpret=True))
    np.testing.assert_array_equal(got, ref)
    # the locking template is real, so the above exercises the half-MAC
    # real-template branch; a genuinely complex template must take the
    # generic 4-partial branch and find the same windows
    tpl_c = (tpl * np.exp(0.7j)).astype(np.complex64)
    s2 = np.asarray(s).copy()
    for i, d in enumerate(delays):
        s2[i, d:d + 80] += tpl_c - tpl
    s2 = jnp.asarray(s2)
    from ofdm_tpu.ops.xcorr import locking_sync_offset
    offs2 = jnp.clip(locking_sync_offset(s2, tpl_c), 0, t - need)
    ref2 = np.asarray(_planar_align(s2, offs2, need, impl="xla"))
    got2 = np.asarray(sync_align(s2, tpl_c, need, interpret=True))
    np.testing.assert_array_equal(got2, ref2)


def test_sync_align_planar_matches_complex():
    """planar=True must return exactly the planes of the complex output."""
    from ofdm_tpu.config import DEFAULT_CONFIG
    from ofdm_tpu.kernels.align_pallas import sync_align

    tpl = np.asarray(constants.locking_for(DEFAULT_CONFIG)).astype(np.complex64)
    t, need = 2560, 2400
    rng = np.random.default_rng(11)
    s = 0.01 * (rng.standard_normal((4, t)) + 1j * rng.standard_normal((4, t)))
    for i, d in enumerate([0, 127, 128, 150]):
        s[i, d:d + 80] += tpl
    s = jnp.asarray(s.astype(np.complex64))
    c = np.asarray(sync_align(s, tpl, need, interpret=True))
    p = np.asarray(sync_align(s, tpl, need, interpret=True, planar=True))
    assert p.shape == (4, 2, need) and p.dtype == np.float32
    np.testing.assert_array_equal(p[:, 0], c.real)
    np.testing.assert_array_equal(p[:, 1], c.imag)


def test_demodulate_symbols_packed_parity():
    """Packed SoA demod == bits_to_bytes(demodulate_symbols(...)) for every
    scheme, including QPSK's im==0 fallthrough edges and non-group-aligned
    symbol counts."""
    import jax.numpy as jnp
    import numpy as np

    from ofdm_tpu.core.bitops import bits_to_bytes
    from ofdm_tpu.phy.modulation import (Modulation, demodulate_symbols,
                                         demodulate_symbols_packed)

    rng = np.random.default_rng(21)
    for scheme in Modulation:
        for n_sym in [4, 7, 12, 33, 128]:
            re = rng.normal(0, 4, (3, n_sym))
            im = rng.normal(0, 4, (3, n_sym))
            # exercise exact-zero edges (QPSK decision table fallthrough)
            re[0, : n_sym // 2] = 0.0
            im[1, : n_sym // 2] = 0.0
            syms = jnp.asarray(re + 1j * im, jnp.complex64)
            want = np.asarray(bits_to_bytes(demodulate_symbols(syms, scheme)))
            got = np.asarray(demodulate_symbols_packed(syms, scheme))
            np.testing.assert_array_equal(
                got, want, err_msg=f"{scheme} n_sym={n_sym}")


def test_modulate_bytes_packed_parity():
    """SoA byte->symbol mapping == modulate_bits(bytes_to_bits(...)) exactly
    (same level constants, same zero-padded tail symbol) for every scheme,
    both dtypes, and non-group-aligned byte counts."""
    import jax.numpy as jnp
    import numpy as np

    from ofdm_tpu.core.bitops import bytes_to_bits
    from ofdm_tpu.phy.modulation import (Modulation, modulate_bits,
                                         modulate_bytes_packed)

    rng = np.random.default_rng(22)
    for scheme in Modulation:
        for n in [1, 2, 3, 5, 17, 96]:
            data = jnp.asarray(rng.integers(0, 256, (2, n), dtype=np.uint8))
            for dtype in (jnp.complex64, jnp.complex128):
                want = np.asarray(modulate_bits(bytes_to_bits(data), scheme,
                                                dtype=dtype))
                got = np.asarray(modulate_bytes_packed(data, scheme,
                                                       dtype=dtype))
                np.testing.assert_array_equal(
                    got, want, err_msg=f"{scheme} n={n} {dtype}")


def test_pin_rowmajor_identity():
    """The layout-pin Pallas copy must be an exact identity."""
    from ofdm_tpu.kernels.align_pallas import pin_rowmajor
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((5, 2, 7, 128)).astype(np.float32))
    y = pin_rowmajor(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
