"""Flagship-scale independent-oracle parity: artifact gate + oracle unit test.

SURVEY.md section 4 test-plan item (d) at the north-star scale: the
committed artifact docs/artifacts/oracle_parity.json records matched
operating points of the flagship config (L=1024, M=512, R=1.0) measured by
(a) the JAX/TPU framework (SRHT Hadamard design, f32) and (b) an
independent NumPy float64 subsampled-DCT AMP re-derived from the
reference's engine (sparc_public/sparc.py:649-701, 883-999). The gate
checks frame-level 4-sigma agreement of SER and BER at every point.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

ART = Path(__file__).resolve().parent.parent / "docs" / "artifacts"
PARITY = ART / "oracle_parity.json"

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))


def test_numpy_oracle_is_a_working_decoder():
    """The oracle itself must decode: exact at high SNR, failing above
    threshold — otherwise agreement with it proves nothing."""
    from oracle_parity import numpy_dct_amp_trial
    rng = np.random.default_rng(3)
    sec, bits, t_final = numpy_dct_amp_trial(256, 32, 15.0, 1.3, 1.0, 25, rng)
    assert sec == 0 and bits == 0
    assert t_final < 24  # early stopping engaged
    # far above threshold (R > C): decoding must fail badly
    sec, _, _ = numpy_dct_amp_trial(256, 32, 15.0, 2.5, 4.0, 15, rng)
    assert sec > 0.3 * 256


@pytest.mark.skipif(not PARITY.exists(), reason="parity artifact not present")
def test_flagship_oracle_parity_artifact():
    doc = json.loads(PARITY.read_text())
    cfg = doc["config"]
    # the north-star config, full measurement depth (not a --quick run)
    assert (cfg["L"], cfg["M"], cfg["R"]) == (1024, 512, 1.0)
    assert not doc.get("quick", False)
    points = doc["points"]
    assert len(points) >= 3
    nonzero_both = 0
    for p in points:
        j, n = p["jax"], p["numpy"]
        assert j["trials"] >= 500, "JAX side must be >=500 trials/point"
        assert n["trials"] >= 100, "oracle side must be CI-bearing"
        # frame-level Welch 4-sigma bound on SER (sections within a frame
        # are correlated; frames are the independent unit), with a small
        # absolute floor for points near the error floor
        sig_ser = np.sqrt(j["frame_ser_std"] ** 2 / j["trials"] +
                          n["frame_ser_std"] ** 2 / n["trials"])
        assert abs(j["ser"] - n["ser"]) <= max(4 * sig_ser, 2e-3), p
        sig_ber = np.sqrt(j["frame_ber_std"] ** 2 / j["trials"] +
                          n["frame_ber_std"] ** 2 / n["trials"])
        assert abs(j["ber"] - n["ber"]) <= max(4 * sig_ber, 2e-3), p
        if j["ser"] > 0 and n["ser"] > 0:
            nonzero_both += 1
    # the sweep must exercise real errors on both engines (not vacuous
    # 0-vs-0 agreement) AND reach a deep sub-1% operating point
    assert nonzero_both >= 2
    assert min(p["jax"]["ser"] for p in points) < 0.01
    assert max(p["jax"]["ser"] for p in points) > 0.05


SC_PARITY = ART / "oracle_parity_sc.json"


def test_numpy_sc_oracle_is_a_working_decoder():
    """The spatially-coupled oracle decodes: exact at high SNR (the demo
    operating point), failing below the finite-length threshold."""
    from oracle_parity import numpy_sc_amp_trial
    rng = np.random.default_rng(1)
    sec, bits, t_final = numpy_sc_amp_trial(256, 32, 15.0, 1.4, 2, 8,
                                            1.0, 30, rng)
    assert sec == 0 and bits == 0
    # below the finite-length threshold the wave stalls
    sec, _, _ = numpy_sc_amp_trial(256, 32, 15.0, 1.4, 2, 8, 15.0 / 6.0,
                                   30, rng)
    assert sec > 0.2 * 256


@pytest.mark.skipif(not SC_PARITY.exists(),
                    reason="SC parity artifact not present")
def test_sc_oracle_parity_artifact():
    """Same gate as the flagship artifact, for the spatially-coupled
    family (demo cell 10 config, the reference's most complex engine:
    blockwise 2-D-W transforms + per-block phi/tau AMP)."""
    doc = json.loads(SC_PARITY.read_text())
    cfg = doc["config"]
    assert cfg.get("spatially_coupled")
    assert (cfg["L"], cfg["M"], cfg["omega"], cfg["Lambda"]) == \
        (1024, 32, 2, 8)
    assert not doc.get("quick", False)
    points = doc["points"]
    assert len(points) >= 3
    nonzero_both = 0
    for p in points:
        j, n = p["jax"], p["numpy"]
        assert j["trials"] >= 500
        assert n["trials"] >= 100
        sig_ser = np.sqrt(j["frame_ser_std"] ** 2 / j["trials"] +
                          n["frame_ser_std"] ** 2 / n["trials"])
        assert abs(j["ser"] - n["ser"]) <= max(4 * sig_ser, 2e-3), p
        sig_ber = np.sqrt(j["frame_ber_std"] ** 2 / j["trials"] +
                          n["frame_ber_std"] ** 2 / n["trials"])
        assert abs(j["ber"] - n["ber"]) <= max(4 * sig_ber, 2e-3), p
        if j["ser"] > 0 and n["ser"] > 0:
            nonzero_both += 1
    assert nonzero_both >= 2
    assert min(p["jax"]["ser"] for p in points) < 0.01
    assert max(p["jax"]["ser"] for p in points) > 0.05
