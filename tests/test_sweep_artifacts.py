"""Consistency gates for the committed concatenated-sweep artifacts.

Like tests/test_campaign_artifact.py, these run from the committed
artifacts alone (no hardware): they pin the *shape* of the reproduction
surface the round-3 verdict asked for —

  * concat_sweep.jsonl measures ALL SEVEN non-trivial decoder families at
    the reference's z=150 working config, including the posterior-combining
    and rerun decoders the reference experimented with
    (sparc_new.py:84-113, 411-439, 675-705).
  * concat_sweep_semi.jsonl contains a reference-scale config with a REAL
    unprotected prefix (percent_protected < 1 => lengths.L_unprotected > 0,
    param_calc.py:31-58), not just the percent=1.0 family.
"""

import json
from pathlib import Path

import pytest

ART_DIR = Path(__file__).resolve().parent.parent / "docs" / "artifacts"
SWEEP = ART_DIR / "concat_sweep.jsonl"
SEMI = ART_DIR / "concat_sweep_semi.jsonl"


def _rows(path):
    return [json.loads(line) for line in path.read_text().splitlines()
            if line.strip()]


@pytest.mark.skipif(not SWEEP.exists(), reason="sweep artifact not present")
def test_concat_sweep_covers_all_decoder_families():
    rows = _rows(SWEEP)
    # the store may hold several protocol generations (it is a resumable
    # cache); gate the latest meta-described config, falling back to all
    # rows for artifacts predating meta records
    metas = [r for r in rows if "config" in r]
    if metas:
        cfg = metas[-1]["key"].split(":")[1]
        rows = [r for r in rows if f":{cfg}:" in r.get("key", "")]
    decoders = {r["decoder"] for r in rows if "decoder" in r}
    expected = {"amp_only", "sequential", "sequential_rerun", "naive",
                "naive_posteriors", "integrated", "integrated_posteriors"}
    assert expected <= decoders, expected - decoders
    # each series spans the full SNR sweep with real trial counts
    for d in expected:
        series = [r for r in rows if r.get("decoder") == d]
        assert len(series) >= 8, (d, len(series))
        assert all(r["frames"] >= 3 for r in series), d
    # qualitative finding of the reference's working config
    # (performance_plots notes): the interleaved/integrated decoders reach
    # BER 0 at an SNR where sequential AMP-then-BP still fails
    def ber_at(dec, snr):
        cands = [r for r in rows if r.get("decoder") == dec]
        return min(cands, key=lambda r: abs(_snr(r) - snr))["ber"]

    def _snr(r):
        return r.get("snr", r.get("snr_db"))

    assert ber_at("naive", 4.3) == 0.0
    assert ber_at("integrated", 4.3) == 0.0
    assert ber_at("sequential", 4.3) > 0.0


@pytest.mark.skipif(not SEMI.exists(), reason="semi artifact not present")
def test_semi_protected_artifact_has_real_prefix():
    rows = _rows(SEMI)
    metas = [r["config"] for r in rows if "config" in r]
    prefixed = [m for m in metas if m.get("semi_protected")
                and m["lengths"]["L_unprotected"] > 0]
    assert prefixed, "no committed config with a real unprotected prefix"
    m = prefixed[0]
    # reference-scale (z >= 81) and a real split
    assert m["z"] >= 81, m
    assert m["percent_protected"] < 1.0, m


FLAGSHIP = ART_DIR / "flagship_sweep.json"


@pytest.mark.skipif(not FLAGSHIP.exists(),
                    reason="flagship artifact not present")
def test_flagship_waterfall_matches_se_threshold():
    """The committed flagship-config waterfall (L=1024, M=512, R=1.0)
    collapses at the state-evolution fixed point's predicted threshold:
    SER drops by >10x across the SE threshold snr, and the below-threshold
    side decodes to SER < 2%."""
    doc = json.loads(FLAGSHIP.read_text())
    thr = doc["se_threshold_snr"]
    assert thr is not None
    rows = sorted(doc["rows"], key=lambda r: r["snr"])
    below = [r for r in rows if r["snr"] < thr]     # above-threshold noise
    decoded = [r for r in rows if r["snr"] >= thr]  # SE predicts decode
    assert below and decoded
    assert min(r["ser"] for r in below) > 10 * decoded[0]["ser"]
    assert decoded[0]["ser"] < 0.02
    # SE agrees with itself: psi_final small exactly where decode works
    assert decoded[0]["se_psi_final"] < 0.01
    assert below[-1]["se_psi_final"] > 0.1
