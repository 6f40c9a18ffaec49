"""Bit codec tests: roundtrips replicating the reference's inline test
(sparc_public/sparc.py:1003-1008) plus modulated variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldpc_sparc_tpu.utils import bits as bitops


@pytest.mark.parametrize("M,K", [(32, 1), (512, 1), (4, 2), (8, 4), (16, 8)])
def test_bits_msg_vector_roundtrip(M, K):
    L = 64
    sec = (M.bit_length() - 1) + (K.bit_length() - 1)
    key = jax.random.key(0)
    bits = bitops.random_bits(key, L * sec)
    beta = bitops.bits_to_msg_vector(bits, M, K)
    assert beta.shape == (L * M,)
    # exactly one nonzero per section, unit modulus
    nz = np.asarray(jnp.abs(beta).reshape(L, M) > 1e-6).sum(axis=1)
    assert np.all(nz == 1)
    bits2 = bitops.msg_vector_to_bits(beta, M, K)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(bits2))


def test_amplitude_roundtrip():
    # L3 convention: nonzero value sqrt(n*P/L) (sparc_sophie/sparc_new.py:1298)
    M, L, amp = 16, 32, 7.25
    bits = bitops.random_bits(jax.random.key(1), L * 4)
    beta = bitops.bits_to_msg_vector(bits, M, 1, amplitude=amp)
    vals = np.asarray(beta).reshape(L, M).max(axis=1)
    np.testing.assert_allclose(vals, amp, rtol=1e-6)
    bits2 = bitops.msg_vector_to_bits(beta, M, 1)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(bits2))


def test_gray_tables():
    # gray<->binary involution (sparc_public/sparc.py:206-223)
    for K in (2, 4, 8, 16):
        b = np.arange(K)
        assert np.array_equal(bitops.gray2bin(bitops.bin2gray(b)), b)
        # mod/demod tables invert each other
        mod = bitops.psk_mod_table(K)
        c = bitops.psk_constel(K)
        demod = bitops.psk_demod_table(K)
        for bb in range(K):
            k = np.argmin(np.abs(c - mod[bb]))
            assert demod[k] == bb


def test_ints_bits_msb_first():
    # MSB-first convention of bin_arr_2_int (sparc_public/sparc.py:182-189)
    bits = jnp.asarray([1, 0, 1], dtype=jnp.int32)
    assert int(bitops.bits_to_ints(bits, 3)) == 5
    np.testing.assert_array_equal(
        np.asarray(bitops.ints_to_bits(jnp.asarray(5), 3)), [1, 0, 1])
