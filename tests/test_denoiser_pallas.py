"""Fused Pallas denoiser step vs the XLA reference path (interpret mode).

The kernel must reproduce, bit-for-bit up to f32 reassociation, the XLA
tail of the AMP iteration it replaces (models/sparc.py): the s-update,
the per-section softmax (ops/denoiser.py:mmse_denoise with K=1), and the
per-section energy statistic. Also checks that a full amp_decode with the
backend forced to pallas (interpret) matches the XLA decode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldpc_sparc_tpu.ops import denoiser_pallas
from ldpc_sparc_tpu.ops.denoiser import mmse_denoise


@pytest.mark.parametrize("L,M", [(8, 128), (4, 256)])
def test_fused_step_matches_xla_tail(L, M):
    LM = L * M
    rng = np.random.default_rng(L * M)
    beta = jnp.asarray(rng.normal(size=LM), jnp.float32)
    azo = jnp.asarray(rng.normal(size=LM), jnp.float32)
    tau_sec = jnp.asarray(rng.uniform(0.5, 2.0, L), jnp.float32)

    s, beta_new, sec_en = denoiser_pallas.fused_denoise_update(
        beta, azo, tau_sec, M, interpret=True)

    rep = jnp.repeat(tau_sec, M)
    want_s = beta + rep * azo
    want_beta = mmse_denoise(want_s, 1.0 / rep, M, K=1)
    want_en = jnp.sum(want_beta.reshape(L, M) ** 2, axis=1)

    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(beta_new), np.asarray(want_beta),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sec_en), np.asarray(want_en),
                               rtol=1e-5, atol=1e-7)


def test_eligibility_gate():
    use = denoiser_pallas.use_fused_denoiser
    old = denoiser_pallas._DENOISER_BACKEND
    denoiser_pallas.set_denoiser_backend("pallas")
    try:
        assert use(M=512, K=1, LM=1 << 19, is_complex=False)
        assert not use(M=512, K=4, LM=1 << 19, is_complex=False)   # PSK
        assert not use(M=512, K=1, LM=1 << 19, is_complex=True)
        assert not use(M=32, K=1, LM=1 << 15, is_complex=False)    # M%128
        denoiser_pallas.set_denoiser_backend("xla")
        assert not use(M=512, K=1, LM=1 << 19, is_complex=False)
    finally:
        denoiser_pallas.set_denoiser_backend(old)


def test_amp_decode_with_fused_denoiser_matches_xla():
    """End-to-end amp_decode equality, pallas (interpret) vs XLA, at a
    small M=128 code eligible for the kernel."""
    from jax.experimental.pallas import tpu as pltpu
    from ldpc_sparc_tpu.config import SparcParams, DecodeParams
    from ldpc_sparc_tpu.ops.transforms import SparcDesign
    from ldpc_sparc_tpu.models.sparc import amp_decode, awgn_channel
    from ldpc_sparc_tpu.utils import bits as bitops

    params = SparcParams(P=15.0, R=1.0, L=32, M=128)
    decode = DecodeParams(t_max=8)
    awgn_var = 1.0
    design = SparcDesign.for_params(params, awgn_var, seed=3)
    key = jax.random.key(3)
    bits = bitops.random_bits(key, params.bit_len)
    beta0 = bitops.bits_to_msg_vector(bits, params.M)
    y = awgn_channel(design.ab(beta0), awgn_var, jax.random.fold_in(key, 1))

    res_xla = amp_decode(y, design, params, decode, awgn_var)

    old = denoiser_pallas._DENOISER_BACKEND
    denoiser_pallas.set_denoiser_backend("pallas")
    try:
        with pltpu.force_tpu_interpret_mode():
            res_pl = amp_decode(y, design, params, decode, awgn_var)
    finally:
        denoiser_pallas.set_denoiser_backend(old)

    np.testing.assert_allclose(np.asarray(res_pl.beta),
                               np.asarray(res_xla.beta), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_pl.psi),
                               np.asarray(res_xla.psi), rtol=1e-4, atol=1e-6)
    assert int(res_pl.t_final) == int(res_xla.t_final)
