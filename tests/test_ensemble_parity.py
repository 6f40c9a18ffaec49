"""Dense-Gaussian vs structured-Hadamard ensemble parity.

The reference's L3 stack uses a dense i.i.d. Gaussian design matrix
(sparc_sophie/sparc_new.py:1284-1294); our framework standardizes on the
SRHT Hadamard engine. SURVEY.md section 7 flags the equivalence as needing
an explicit statistical test: here an independent float64 NumPy AMP with a
dense Gaussian A (re-derived from the AMP equations of
sparc_sophie/sparc_new.py:885-912, not a port) is compared against the JAX
decoder with the Hadamard design at matched configs. The measured result
(240 trials/config): the two ensembles agree to within a real,
reproducible 1-2% absolute SER offset at near-threshold operating points
(finite-L universality corrections between iid and row-orthogonal
ensembles; sign varies by config), gated at 3% absolute. The tight
structured-vs-structured parity claim at flagship scale is
tests/test_oracle_parity.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldpc_sparc_tpu.config import SparcParams, DecodeParams


def numpy_gaussian_amp_trial(L, M, P, R, awgn_var, t_max, rng):
    """One dense-Gaussian SPARC trial with scalar-tau AMP, float64 numpy."""
    logM = int(np.log2(M))
    n = int(L * logM / R)
    c = np.sqrt(n * P / L)

    idx = rng.integers(0, M, L)
    beta0 = np.zeros(L * M)
    beta0[np.arange(L) * M + idx] = c

    A = rng.normal(0.0, 1.0 / np.sqrt(n), (n, L * M))
    y = A @ beta0 + rng.normal(0.0, np.sqrt(awgn_var), n)

    beta = np.zeros(L * M)
    z = y.copy()
    s = None
    for t in range(t_max):
        if t > 0:
            z = y - A @ beta + (z / tau2) * (P - beta @ beta / n)
        s = beta + A.T @ z
        tau2 = z @ z / n
        x = c * s / tau2
        x = x.reshape(L, M)
        x -= x.max(axis=1, keepdims=True)
        e = np.exp(x)
        beta = (c * e / e.sum(axis=1, keepdims=True)).reshape(L * M)
    idx_hat = s.reshape(L, M).argmax(axis=1)
    sec_errs = np.count_nonzero(idx_hat != idx)
    return sec_errs


@pytest.mark.slow
@pytest.mark.parametrize("L,M,P,R,awgn_var", [
    # M=2 (logM=1): the ensemble the reference's working concat config
    # actually ran (sparc_new.py:1284-1294 with logM=1,
    # performance_plots_general.py:26-47)
    (192, 2, 15.0, 0.8, 4.0),
    # mid-M point (the original round-2 gate)
    (96, 16, 15.0, 1.7, 1.0),
    # high-M point toward the M=512 flagship family (L=256: at
    # L=64 the iid-vs-SRHT finite-size deviation is ~6% absolute; by
    # L=256 it is ~2% — the gate bounds the large-L regime)
    (256, 64, 15.0, 1.4, 1.0),
])
def test_gaussian_vs_hadamard_ser_parity(L, M, P, R, awgn_var):
    # operating points chosen so both ensembles show a nonzero,
    # non-saturated error rate (SER roughly 5-30%)
    t_max = 12
    trials = 240  # 10x the round-2 gate: the JAX side is ONE vmapped
    # device program (sparc_mc_counts), so this costs the same wall-clock
    # as the old 24-sequential-sims loop; the tightened absolute floor
    # below (3%, was 4%) plus the resolved ensemble-deviation statement
    # in the module docstring are what the extra trials buy

    rng = np.random.default_rng(0)
    gauss_errs = sum(
        numpy_gaussian_amp_trial(L, M, P, R, awgn_var, t_max, rng)
        for _ in range(trials))

    from ldpc_sparc_tpu.parallel.montecarlo import sparc_mc_counts
    params = SparcParams(P=P, R=R, L=L, M=M)
    dec = DecodeParams(t_max=t_max)
    c = sparc_mc_counts(params, dec, awgn_var, seed=0, n_trials=trials)
    had_errs = c["sec_errs"]

    n_secs = trials * L
    p_g = gauss_errs / n_secs
    p_h = had_errs / n_secs
    # At 240 trials the Monte-Carlo noise (4 binomial sigma ~ 0.6-1.3%)
    # is small enough to RESOLVE the true iid-Gaussian-vs-SRHT finite-size
    # deviation: measured at these near-threshold points it is a real,
    # reproducible 1-2% absolute offset whose sign varies by config
    # (had-worse at M=2, had-better at M=64; AMP universality between iid
    # and row-orthogonal ensembles holds only asymptotically in L). The
    # gate therefore bounds the ensemble deviation at 3% absolute —
    # strictly tighter than the old 24-trial 4% floor — while the
    # *tight* parity claim (structured-vs-structured, <1 sigma at
    # L=1024/M=512) lives in tests/test_oracle_parity.py.
    sigma = np.sqrt(p_g * (1 - p_g) / n_secs + p_h * (1 - p_h) / n_secs)
    assert abs(p_g - p_h) < max(4 * sigma, 0.03), (p_g, p_h, sigma)
    assert p_g > 0 and p_h > 0, "operating point must exercise errors"
