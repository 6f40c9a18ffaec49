"""Pallas BP kernel vs the XLA kernel (interpret mode on CPU).

Validation chain (SURVEY.md section 4): Pallas kernel == XLA kernel
(bit-exact f32, tested here) == C++ float64 oracle (decision/iteration
agreement, tested in test_ldpc.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldpc_sparc_tpu.models.ldpc import get_code
from ldpc_sparc_tpu.ops.bp import bp_decode
from ldpc_sparc_tpu.ops.bp_pallas import bp_decode_pallas


# interpret mode executes the unrolled kernel op-by-op in Python — keep the
# codes tiny (z=6) so the suite stays fast; the TPU path is exercised by
# bench.py and is bit-identical by construction
@pytest.mark.parametrize("standard,rate,z,method", [
    ("802.16", "1/2", 6, "sumprod"),
    ("802.16", "5/6", 6, "minsum"),
])
def test_pallas_matches_xla(standard, rate, z, method):
    code = get_code(standard, rate, z)
    rng = np.random.default_rng(hash((standard, rate, z, method)) % 2**32)
    sigma2 = 1.0 / 10 ** (2.5 / 10)
    B = 3
    us = rng.integers(0, 2, (B, code.K))
    xs = np.asarray(code.encode(jnp.asarray(us)))
    ys = (1.0 - 2.0 * xs) + rng.normal(0, np.sqrt(sigma2), xs.shape)
    llr = jnp.asarray(2.0 / sigma2 * ys, jnp.float32)

    r_ref = bp_decode(llr, code.graph, 15, method)
    r_pal = bp_decode_pallas(llr, code.graph, 15, method, interpret=True)
    np.testing.assert_array_equal(np.asarray(r_ref.iterations),
                                  np.asarray(r_pal.iterations))
    np.testing.assert_allclose(np.asarray(r_ref.app), np.asarray(r_pal.app),
                               rtol=1e-5, atol=1e-4)


def test_pallas_noiseless_fixed_point():
    code = get_code("802.16", "1/2", 6)
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, code.K)
    x = np.asarray(code.encode(jnp.asarray(u)))
    y = jnp.asarray(10.0 * (0.5 - x), jnp.float32)
    r = bp_decode_pallas(y, code.graph, 100, "sumprod", interpret=True)
    assert int(r.iterations) == 0
    assert np.array_equal(np.asarray(r.app) < 0, x.astype(bool))


def test_bp_decode_pallas_backend_multidim_batch():
    """bp_decode's documented (..., Nv) contract must hold on the pallas
    backend too (regression: the dispatcher used to skip the XLA branch's
    batch flattening, so a (A, B, Nv) batch crashed on TPU only)."""
    code = get_code("802.16", "1/2", 6)
    rng = np.random.default_rng(7)
    us = rng.integers(0, 2, (2, 3, code.K))
    xs = np.asarray(code.encode(jnp.asarray(us.reshape(6, code.K)))
                    ).reshape(2, 3, code.N)
    llr = jnp.asarray(10.0 * (0.5 - xs), jnp.float32)      # noiseless

    r = bp_decode(llr, code.graph, 20, "sumprod", backend="pallas_interpret")
    assert r.app.shape == (2, 3, code.N)
    assert r.iterations.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(r.iterations),
                                  np.zeros((2, 3), np.int32))
    assert np.array_equal(np.asarray(r.app) < 0, xs.astype(bool))


def test_bp_backend_env_validated(monkeypatch):
    """An invalid LDPC_SPARC_BP_BACKEND raises instead of falling through
    (advisor r3); a valid explicit value wins for the small-batch helper."""
    import pytest
    from ldpc_sparc_tpu.ops.bp import (default_bp_backend,
                                       small_batch_bp_backend)
    monkeypatch.setenv("LDPC_SPARC_BP_BACKEND", "auto")
    with pytest.raises(ValueError):
        default_bp_backend()
    with pytest.raises(ValueError):
        small_batch_bp_backend()
    monkeypatch.setenv("LDPC_SPARC_BP_BACKEND", "pallas")
    assert default_bp_backend() == "pallas"
    assert small_batch_bp_backend() == "pallas"
    monkeypatch.delenv("LDPC_SPARC_BP_BACKEND")
    assert small_batch_bp_backend() == "xla"
