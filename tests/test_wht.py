"""FWHT kernel tests: exactness vs the dense Sylvester Hadamard matrix and
the algebraic properties the design operator relies on."""

import numpy as np
import jax.numpy as jnp
import pytest

from ldpc_sparc_tpu.ops.wht import fwht, _hadamard_np, _factorize


@pytest.mark.parametrize("w", [2, 8, 64, 256, 2048])
def test_fwht_matches_dense(w):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, w)).astype(np.float32)
    got = np.asarray(fwht(jnp.asarray(x)))
    want = x @ _hadamard_np(w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_fwht_involution():
    # H H = w I  =>  fwht(fwht(x)) == w * x
    w = 512
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, w)).astype(np.float32)
    y = np.asarray(fwht(fwht(jnp.asarray(x))))
    np.testing.assert_allclose(y, w * x, rtol=1e-4, atol=1e-2)


def test_fwht_complex():
    w = 128
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((3, w)) + 1j * rng.standard_normal((3, w))).astype(np.complex64)
    got = np.asarray(fwht(jnp.asarray(x)))
    want = x @ _hadamard_np(w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_factorize():
    for mlf in (5, 7, 10):
        assert _factorize(0, mlf) == [1]
        for lw in (1, 3, 10, 11, 20, 21):
            fs = _factorize(lw, mlf)
            assert int(np.prod(fs)) == 1 << lw
            assert all(f <= 1 << mlf for f in fs)
