"""Config / base-matrix / concatenation-bookkeeping tests."""

import numpy as np
import pytest

from ldpc_sparc_tpu.config import (SparcParams, DecodeParams, LdpcParams,
                                   create_base_matrix, pa_iterative,
                                   sc_base_matrix, param_calc)


def test_sparc_params_validation():
    with pytest.raises(AssertionError):
        SparcParams(P=15.0, R=1.0, L=10, M=33)  # M not power of 2
    with pytest.raises(AssertionError):
        SparcParams(P=15.0, R=1.0, L=10, M=32,
                    spatially_coupled=True, omega=4, Lambda=5)  # < 2w-1
    with pytest.raises(AssertionError):
        SparcParams(P=15.0, R=1.0, L=10, M=32, modulated=True, K=3)


def test_derived_lengths():
    p = SparcParams(P=15.0, R=1.5, L=1024, M=512)
    assert p.logM == 9
    assert p.bit_len == 1024 * 9
    assert p.n == int(round(1024 * 9 / 1.5))
    # SC rounding to a multiple of Lr (sparc_public/sparc.py:40-43)
    p2 = SparcParams(P=15.0, R=1.4, L=1024, M=32,
                     spatially_coupled=True, omega=3, Lambda=8)
    Lr = 8 + 3 - 1
    assert p2.n % Lr == 0


def test_base_matrix_shapes_and_mean():
    awgn_var = 1.0
    p0 = SparcParams(P=15.0, R=1.0, L=32, M=4)
    W0 = create_base_matrix(p0, awgn_var)
    assert W0.shape == (1, 1) and W0[0, 0] == 15.0

    p1 = SparcParams(P=15.0, R=1.4, L=32, M=4,
                     power_allocated=True, B=8, R_PA_ratio=1.0)
    W1 = create_base_matrix(p1, awgn_var)
    assert W1.shape == (1, 8)
    np.testing.assert_allclose(W1.mean(), 15.0)
    assert np.all(np.diff(W1[0]) <= 1e-9)  # non-increasing allocation

    p2 = SparcParams(P=15.0, R=1.4, L=32, M=4,
                     spatially_coupled=True, omega=2, Lambda=4)
    W2 = create_base_matrix(p2, awgn_var)
    assert W2.shape == (5, 4)
    np.testing.assert_allclose(W2.mean(), 15.0)
    # band structure: column c occupies rows c..c+omega-1
    for c in range(4):
        nz = np.flatnonzero(W2[:, c])
        np.testing.assert_array_equal(nz, np.arange(c, c + 2))


def test_param_calc():
    # fully-protected config of ldpc_sparc/performance_plots_general.py:35-47:
    # 802.16 r=1/2 z=150 -> K = 12*150 = 1800, mults=4, logM=1, R_sparc=1
    ldpc = LdpcParams(standard="802.16", rate="1/2", z=150)
    ldpc_K = 12 * 150
    rate, L_sparc, L_sparc_ldpc, lengths = param_calc(
        mults=4, logM=1, ldpc=ldpc, int_rate=0.5, R_sparc_ldpc=1.0,
        ldpc_K=ldpc_K)
    assert lengths.k_ldpc == 7200
    assert L_sparc == 7200
    assert L_sparc_ldpc == 14400
    np.testing.assert_allclose(rate, 0.5)


def test_param_calc_semi_protected():
    # semi-protected config of performance_plots_general.py:50-65:
    # 802.11n r=5/6 z=81 -> K = 20*81 = 1620, mults=3, M=64, 100% protected
    from ldpc_sparc_tpu.config import param_calc_semi_protected
    ldpc = LdpcParams(standard="802.11n", rate="5/6", z=81)
    ldpc_K = 20 * 81
    L_sparc, R_sl, L_sl, lengths, rate = param_calc_semi_protected(
        R=0.8, mults=3, percent_protected=1.0, M=64, ldpc=ldpc,
        int_rate=5 / 6, ldpc_K=ldpc_K)
    assert lengths.k_ldpc == 4860
    assert lengths.L_unprotected == 0
    n_ldpc = int(4860 / (5 / 6))
    assert L_sl == n_ldpc // 6
    assert L_sparc == 4860 // 6
    np.testing.assert_allclose(rate, 4860 / int(4860 / 0.8))
