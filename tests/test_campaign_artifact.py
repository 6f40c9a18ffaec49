"""Consistency gate for the committed on-chip campaign artifact.

docs/artifacts/campaign_tpu.json claims the TPU-measured waterfalls
overlay the reference's 2018 campaign data (ldpc_jossy/data/results.csv).
This test makes that claim checkable without hardware: at every matched
SNR operating point (ours within 0.1 dB of a reference point, BER high
enough that both measurements have real error counts), the two BERs must
agree within combined binomial confidence.

Runs from the committed artifact alone — a regenerated artifact that
drifted from the reference data fails here.
"""

import json
import math
import os
from pathlib import Path

import pytest

ART = Path(__file__).resolve().parent.parent / "docs" / "artifacts" / \
    "campaign_tpu.json"


@pytest.mark.skipif(not ART.exists(), reason="campaign artifact not present")
def test_campaign_artifact_matches_reference_data():
    doc = json.loads(ART.read_text())
    # the reference's signature dataset is ALL 36 grid configs
    # (ldpc_awgn.py:6-43); the committed artifact must cover (nearly) all
    # of them, not a sample
    assert len(doc["configs"]) >= 30, len(doc["configs"])
    assert len({c["sim_id"] for c in doc["configs"]}) == len(doc["configs"])
    compared = 0
    for cfg in doc["configs"]:
        ref = cfg["reference_points"]
        ours = cfg["points"]
        assert ref, f"no reference points stored for sim {cfg['sim_id']}"
        N = cfg["z"] * 24  # codeword length (protograph is 24 cols wide)
        num, den = cfg["rate"].split("/")
        K = N * int(num) // int(den)
        for rp in ref:
            if rp["ber"] < 3e-5:   # deep tail: single-digit error counts
                continue
            close = min(ours, key=lambda o: abs(o["snr"] - rp["snr"]))
            if abs(close["snr"] - rp["snr"]) > 0.1:
                continue
            ours_bits = close["nblocks"] * K
            ref_bits = rp["nblocks"] * K
            # binomial sigma on both sides; bit errors within a block are
            # correlated (burst factor), same bound as
            # tests/test_waterfall_parity.py
            burst = 8.0
            sig = math.sqrt(burst * (
                close["ber"] * (1 - close["ber"]) / ours_bits +
                rp["ber"] * (1 - rp["ber"]) / ref_bits))
            assert abs(close["ber"] - rp["ber"]) < max(5 * sig, 0.02), \
                (cfg["standard"], cfg["rate"], cfg["z"], rp["snr"],
                 close["ber"], rp["ber"])
            compared += 1
    # the artifact must actually overlap the reference trajectories at
    # reference depth (a 36-config artifact matches 300+ points; 150 is
    # a conservative floor that still forbids thin overlap)
    assert compared >= 150, compared
