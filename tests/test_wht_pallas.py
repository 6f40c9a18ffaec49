"""Fused Pallas SRHT kernel vs the XLA FWHT chain (interpret mode on CPU).

Validation chain: the Pallas two-matmul FWHT (ops/wht_pallas.py) must equal
the XLA Kronecker chain (ops/wht.py:fwht) — which is itself checked against
the H[r,c] = (-1)^popcount(r & c) closed form in test_wht.py — with the
sign diagonal and block scale fused in both orders. The TPU compiled path
is exercised by bench.py / benchmarks/perf_sweep.py and gated by the bench
BER check.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldpc_sparc_tpu.ops import wht_pallas
from ldpc_sparc_tpu.ops.wht import fwht


@pytest.fixture(autouse=True)
def f32_kernel():
    """Interpret-mode equality is exact only with f32 matmuls."""
    old = wht_pallas._FWHT_PALLAS_DTYPE
    wht_pallas.set_fwht_backend(dtype="float32")
    yield
    wht_pallas.set_fwht_backend(dtype=old)


@pytest.mark.parametrize("w,E", [(1 << 10, 3), (1 << 9, 2)])
@pytest.mark.parametrize("apply_pre", [True, False])
@pytest.mark.parametrize("mode", ["ms", "2mm"])
def test_fused_kernel_matches_xla_chain(w, E, apply_pre, mode):
    rng = np.random.default_rng(w + apply_pre)
    x = jnp.asarray(rng.normal(size=(E, w)), jnp.float32)
    signs = jnp.asarray(rng.integers(0, 2, (E, w)) * 2 - 1, jnp.float32)

    old = wht_pallas._FWHT_PALLAS_MODE
    wht_pallas.set_fwht_backend(mode=mode)
    try:
        got = wht_pallas.fwht_signed(x, signs, w, apply_pre, interpret=True)
    finally:
        wht_pallas.set_fwht_backend(mode=old)
    if apply_pre:
        want = fwht(x * signs)
    else:
        want = fwht(x) * signs
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("w", [1 << 13, 1 << 15])
def test_multistage_kernel_multi_factor_widths(w):
    """Widths whose sublane count needs 1 and 2 factors (incl. a ragged
    tail factor), checked against the popcount closed form via fwht."""
    rng = np.random.default_rng(w)
    x = jnp.asarray(rng.normal(size=(2, w)), jnp.float32)
    signs = jnp.asarray(rng.integers(0, 2, (2, w)) * 2 - 1, jnp.float32)
    got = wht_pallas._fwht_signed_ms(x, signs, w, apply_pre=True,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fwht(x * signs)),
                               rtol=1e-5, atol=1e-2)


def test_sublane_factorization():
    assert wht_pallas._sublane_factors(8) == (8,)
    assert wht_pallas._sublane_factors(128) == (128,)
    assert wht_pallas._sublane_factors(256) == (128, 2)
    assert wht_pallas._sublane_factors(4096) == (128, 32)
    assert wht_pallas._sublane_factors(1) == ()


def test_srht_apply_pallas_backend_matches_xla():
    """srht_apply with the backend forced to pallas (interpret via CPU
    force_tpu_interpret_mode) equals the default XLA path for an offset-0
    full-window design block, both scatter-in and gather-out."""
    from jax.experimental.pallas import tpu as pltpu
    from ldpc_sparc_tpu.ops.transforms import srht_apply

    w, small, E = 1 << 14, 96, 2     # w >= 2^14: inside the pallas gate
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.sort(rng.choice(w, (E, small), replace=False),
                              axis=1), jnp.int32)
    signs = jnp.asarray(rng.integers(0, 2, (E, w)) * 2 - 1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, (E,)), jnp.float32)

    vals_wide = jnp.asarray(rng.normal(size=(E, w)), jnp.float32)
    vals_small = jnp.asarray(rng.normal(size=(E, small)), jnp.float32)

    kw_fwd = dict(w=w, in_dim=w, out_dim=small, idx_side_is_input=False,
                  offset=0, scale=scale)
    kw_adj = dict(w=w, in_dim=small, out_dim=w, idx_side_is_input=True,
                  offset=0, scale=scale)
    want_fwd = srht_apply(vals_wide, idx, signs, **kw_fwd)
    want_adj = srht_apply(vals_small, idx, signs, **kw_adj)

    wht_pallas.set_fwht_backend(backend="pallas")
    try:
        with pltpu.force_tpu_interpret_mode():
            got_fwd = srht_apply(vals_wide, idx, signs, **kw_fwd)
            got_adj = srht_apply(vals_small, idx, signs, **kw_adj)
    finally:
        wht_pallas.set_fwht_backend(backend="auto")
    np.testing.assert_allclose(np.asarray(got_fwd), np.asarray(want_fwd),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_adj), np.asarray(want_adj),
                               rtol=1e-5, atol=1e-3)
