"""AMP decoder tests: high-SNR exact decoding across all SPARC families,
early stopping, and statistical agreement with state evolution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldpc_sparc_tpu import SparcParams, DecodeParams, sparc_sim, sparc_se
from ldpc_sparc_tpu.models import sparc as sparc_mod


DEC = DecodeParams(t_max=25)


@pytest.mark.parametrize("params", [
    SparcParams(P=15.0, R=1.3, L=256, M=32),
    SparcParams(P=15.0, R=1.4, L=256, M=32,
                power_allocated=True, B=32, R_PA_ratio=1.0),
    SparcParams(P=15.0, R=1.4, L=256, M=32,
                spatially_coupled=True, omega=2, Lambda=8),
    SparcParams(P=15.0, R=2.6, L=256, M=8, is_complex=True,
                modulated=True, K=4),
    SparcParams(P=15.0, R=1.3, L=256, M=32, is_complex=True),
    SparcParams(P=15.0, R=1.3, L=256, M=16, modulated=True, K=2),
], ids=["plain", "pa", "sc", "mod-complex", "complex-unmod", "mod-real-k2"])
def test_high_snr_decodes_exactly(params):
    res = sparc_sim(params, DEC, awgn_var=1.0, seed=0)
    assert float(res["ber"]) == 0.0
    assert float(res["ser"]) == 0.0
    assert int(res["t_final"]) < DEC.t_max  # early stopping engaged


def test_phi_est_method_2():
    params = SparcParams(P=15.0, R=1.3, L=256, M=32)
    res = sparc_sim(params, DecodeParams(t_max=25, phi_est_method=2),
                    awgn_var=1.0, seed=0)
    assert float(res["ber"]) == 0.0


def test_amp_matches_state_evolution():
    """Empirical NMSE trajectory tracks the SE prediction (the reference's
    notebook-overlay validation, SURVEY.md section 4)."""
    params = SparcParams(P=15.0, R=1.3, L=1024, M=32)
    dec = DecodeParams(t_max=12)
    psi_se, _ = sparc_se(awgn_var=1.0, params=params, t_max=12,
                         mc_samples=4000, seed=0)
    nmses = []
    for seed in range(4):
        res = sparc_sim(params, dec, awgn_var=1.0, seed=seed)
        nmses.append(np.asarray(res["nmse"])[:, 0])
    nmse = np.mean(nmses, axis=0)
    # compare on the first few iterations (before convergence noise floor)
    se = psi_se[:, 0]
    for t in range(1, 5):
        assert abs(nmse[t] - se[t]) < 0.08, (t, nmse[t], se[t])


def test_se_expectation_f32_safe_at_low_tau():
    """K>2 SE branches must be max-shifted: the unshifted sinh/cosh/exp
    formulas (sparc_public/sparc_se.py:97-115, which ran in f64) overflow
    f32 at argument ~89 — reached at 1/tau = 200 here — NaNing high-SNR
    modulated operating points. Regression for the round-4 verdict item."""
    from ldpc_sparc_tpu.models.state_evolution import se_expectation

    rng = np.random.default_rng(0)
    mc, M = 1024, 8
    u = rng.normal(size=(mc, M)) + 1j * rng.normal(size=(mc, M))
    uj = jnp.asarray(u.astype(np.complex64))
    taus = jnp.asarray([0.005, 0.02, 0.5], jnp.float32)  # itau = 200, 50, 2
    for K in (4, 8):
        E = np.asarray(se_expectation(taus, K, uj))
        assert np.all(np.isfinite(E)), (K, E)
        # tau -> 0: the posterior concentrates on the true entry, E -> 1
        assert E[0] > 0.99, (K, E)

    # the shifted f32 rewrite must agree with the reference's unshifted
    # formula evaluated in f64 at a tau where both are finite
    tau = 0.02
    itau, rt = 1.0 / tau, np.sqrt(1.0 / tau)
    a = itau + rt * np.real(u[:, 0])
    b0 = rt * np.imag(u[:, 0])
    cr, ci = rt * np.real(u[:, 1:]), rt * np.imag(u[:, 1:])
    E64 = np.mean(np.sinh(a) / (np.cosh(a) + np.cosh(b0) +
                                (np.cosh(cr) + np.cosh(ci)).sum(axis=1)))
    E32 = float(np.asarray(se_expectation(
        jnp.asarray([tau], jnp.float32), 4, uj))[0])
    assert abs(E32 - E64) < 1e-3, (E32, E64)


def test_noise_free_channel():
    params = SparcParams(P=15.0, R=1.0, L=64, M=16)
    key = jax.random.key(0)
    bits, beta0, x, design = sparc_mod.sparc_encode(params, 0.01, seed=5, key=key)
    bits_out, res, _ = sparc_mod.sparc_decode(x, design, params,
                                              DecodeParams(t_max=8), 0.01, beta0)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(bits_out))


def test_sim_error_location_diagnostics():
    """sparc_sim returns the reference's error-location diagnostics
    (loc_of_sec_errs etc., sparc_public/sparc_sim.py:30-51): indices of
    wrongly-decoded sections, consistent with num_of_sec_errs and ser."""
    import numpy as np
    from ldpc_sparc_tpu.models.sparc import sparc_sim
    # near-threshold rate: some section errors expected
    p = SparcParams(P=15.0, R=1.8, L=64, M=16)
    r = sparc_sim(p, DecodeParams(t_max=10), awgn_var=2.0, seed=1)
    locs = r["loc_of_sec_errs"]
    assert locs.ndim == 1 and locs.size == int(r["num_of_sec_errs"])
    assert np.all((locs >= 0) & (locs < p.L))
    assert abs(float(r["ser"]) - locs.size / p.L) < 1e-6
    assert locs.size > 0  # R=1.8 is well above threshold at this SNR
    # modulated path carries the full location/value split
    pm = SparcParams(P=15.0, R=2.5, L=64, M=8, K=4, modulated=True,
                     is_complex=True)
    rm = sparc_sim(pm, DecodeParams(t_max=8), awgn_var=1.0, seed=1)
    for k in ("loc_of_sec_errs", "loc_of_loc_errs", "loc_of_val_errs"):
        assert rm[k].ndim == 1
    assert rm["loc_of_sec_errs"].size == int(rm["num_of_sec_errs"])
