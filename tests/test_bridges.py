"""AMP<->BP bridge tests.

Replicates the reference's exact-value unit tests
(sparc_sophie/testing/test_S_k_mapping.py, test_beta_estimate_to_bp_probs.py,
test_differentiated_eta.py) and validates the einsum re-derivation of the
Onsager derivative against a literal port of the reference's quadruple loop —
the highest-risk math in the concatenated stack (SURVEY.md section 7,
hard parts)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ldpc_sparc_tpu.ops.bridges import (
    s_k_mapping, section_probs_to_bit_probs, bit_probs_to_section_probs,
    combine_posteriors, integrated_onsager_derivative)


def test_s_k_mapping_reference_values():
    # sparc_sophie/testing/test_S_k_mapping.py:31-40
    assert s_k_mapping(4) == [[0, 1], [0, 2]]
    assert s_k_mapping(8) == [[0, 1, 2, 3], [0, 1, 4, 5], [0, 2, 4, 6]]
    assert s_k_mapping(16) == [[0, 1, 2, 3, 4, 5, 6, 7],
                               [0, 1, 2, 3, 8, 9, 10, 11],
                               [0, 1, 4, 5, 8, 9, 12, 13],
                               [0, 2, 4, 6, 8, 10, 12, 14]]


def test_section_to_bit_probs_reference_values():
    # sparc_sophie/testing/test_beta_estimate_to_bp_probs.py:25-52
    beta = jnp.asarray([1, 0, 0, 0, 0, 0, 1, 0, 1, 0, 0, 0], jnp.float32)
    out = np.asarray(section_probs_to_bit_probs(beta, 4))
    np.testing.assert_allclose(out, [1, 1, 0, 1, 1, 1])

    beta = jnp.asarray([.7, .1, .1, .1, .1, .1, .7, .1, .7, .1, .1, .1],
                       jnp.float32)
    hard = np.where(np.asarray(section_probs_to_bit_probs(beta, 4)) < .5, 1, 0)
    np.testing.assert_array_equal(hard, [0, 0, 1, 0, 0, 0])

    beta = jnp.asarray([.5, .2, .1, .1, .1, .1, .7, .1, .2, .4, .2, .2],
                       jnp.float32)
    hard = np.where(np.asarray(section_probs_to_bit_probs(beta, 4)) < .5, 1, 0)
    np.testing.assert_array_equal(hard, [0, 0, 1, 0, 0, 1])


def _ref_bp_to_beta(ldpc_probs, L, M):
    """Literal port of bp_output_to_beta_estimate (sparc_new.py:1260-1279)."""
    logM = int(np.log2(M))
    lp = np.asarray(ldpc_probs, np.float64).reshape(L, logM)
    amp = np.ones((L, M))
    for l in range(L):
        for i in range(M):
            bn = format(i, f"0{logM}b")
            for j in range(logM):
                amp[l][i] *= lp[l][j] if bn[j] == "0" else (1 - lp[l][j])
    return amp.reshape(L * M)


@pytest.mark.parametrize("M", [4, 8, 16])
def test_bit_to_section_probs_vs_loop(M):
    rng = np.random.default_rng(0)
    L = 6
    logM = int(np.log2(M))
    p0 = rng.uniform(0.05, 0.95, L * logM).astype(np.float32)
    got = np.asarray(bit_probs_to_section_probs(jnp.asarray(p0), M))
    want = _ref_bp_to_beta(p0, L, M)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def _ref_differentiated_eta(beta, vk, vk_0, alpha, tau_sqr, L, M, n, P_l):
    """Literal port of differentiated_eta_calc + sub_term
    (sparc_new.py:824-841, 871-883), float64."""
    logM = int(np.log2(M))
    S_k = s_k_mapping(M)
    vk_s = np.asarray(vk, np.float64).reshape(L, logM)
    a_s = np.asarray(alpha, np.float64).reshape(L, M)
    vk0_s = np.asarray(vk_0, np.float64).reshape(L, logM)
    c = np.sqrt(n * P_l)

    def sub_term(l, k, i):
        s = 0.0
        for q in S_k[k]:
            if q == i:
                s += a_s[l][q] * (c / tau_sqr) * (1 - a_s[l][q])
            else:
                s += a_s[l][q] * (c / tau_sqr) * (-a_s[l][i])
        val = np.clip(vk0_s[l][k], 1e-6, 1 - 1e-6)
        return (1 / (val * (1 - val))) * s

    main = np.zeros((L, M))
    for l in range(L):
        for i in range(M):
            bn = format(i, f"0{logM}b")
            for k in range(logM):
                if bn[k] == "1":
                    main[l][i] -= vk_s[l][k] * sub_term(l, k, i)
                else:
                    main[l][i] += (1 - vk_s[l][k]) * sub_term(l, k, i)
    return np.asarray(beta, np.float64) * main.reshape(L * M)


@pytest.mark.parametrize("M", [4, 8])
def test_onsager_derivative_vs_reference_loop(M):
    rng = np.random.default_rng(1)
    L, n, P_l = 5, 40, 0.5
    logM = int(np.log2(M))
    c = np.sqrt(n * P_l)
    tau_sqr = 0.3
    # alpha: valid section posteriors; vk/vk0: bit probabilities
    alpha = rng.dirichlet(np.ones(M), size=L).reshape(-1).astype(np.float32)
    vk = rng.uniform(0.05, 0.95, L * logM).astype(np.float32)
    vk0 = rng.uniform(0.05, 0.95, L * logM).astype(np.float32)
    beta_probs = rng.dirichlet(np.ones(M), size=L).reshape(-1).astype(np.float32)

    got = c * np.asarray(integrated_onsager_derivative(
        jnp.asarray(alpha), jnp.asarray(vk), jnp.asarray(vk0),
        jnp.asarray(beta_probs), jnp.asarray(tau_sqr, jnp.float32), M,
        jnp.asarray(c, jnp.float32)))
    # reference takes amplitude-carrying beta = c * beta_probs
    want = _ref_differentiated_eta(c * beta_probs, vk, vk0, alpha,
                                   tau_sqr, L, M, n, P_l)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_sum_term_reference_value():
    """Hand-computed sum_term (testing/test_differentiated_eta.py:50-57).

    NOTE: the reference's testing file exercises an *older* sub_term (with
    -alpha[q]; expected 1.6). The shipped decoder uses -alpha[i]
    (sparc_new.py:878, 'Changed from q to i here'), for which the same
    inputs give 1.68 - 0.56 = 1.12. We implement the shipped form.
    """
    n, P_l, tau_sqr = 2, 2.0, 0.25
    alpha = np.array([[0.7, 0.1, 0.1, 0.1]])
    S_0 = s_k_mapping(4)[0]
    c = np.sqrt(n * P_l)
    s = 0.0
    for q in S_0:
        if q == 0:
            s += alpha[0][q] * (c / tau_sqr) * (1 - alpha[0][q])
        else:
            s += alpha[0][q] * (c / tau_sqr) * (-alpha[0][0])
    np.testing.assert_allclose(s, 1.12)  # shipped form (-alpha[i]) value


def test_combine_posteriors_normalizes():
    rng = np.random.default_rng(2)
    M, L = 8, 4
    a = rng.dirichlet(np.ones(M), size=L).reshape(-1).astype(np.float32)
    g = rng.dirichlet(np.ones(M), size=L).reshape(-1).astype(np.float32)
    out = np.asarray(combine_posteriors(jnp.asarray(a), jnp.asarray(g), M))
    sums = out.reshape(L, M).sum(axis=1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)
    want = (a * g).reshape(L, M)
    want /= want.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(out, want.reshape(-1), rtol=1e-5)
