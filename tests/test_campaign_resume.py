"""Resumable LDPC campaign (VERDICT r2 item 5) + BP backend dispatch.

The reference's append-only results.txt loses at most one point on a crash
(ldpc_awgn.py:109-114); SURVEY section 5 asks for resume per (config, SNR,
seed-block) cell. These tests prove the stronger contract: a campaign
interrupted after k points and resumed produces the IDENTICAL record set an
uninterrupted run produces — same keys, same adaptive-SNR trajectory — and
a CLI re-run into the same --out dir duplicates nothing.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from ldpc_sparc_tpu.config import LdpcParams
from ldpc_sparc_tpu.parallel.montecarlo import ldpc_waterfall_campaign


TINY = dict(seed=0, n_measurements=4, min_errors=2, max_blocks=32,
            batch=8, dectype="sumprod2", max_iters=10)


def test_campaign_resume_exact():
    params = LdpcParams(standard="802.16", rate="1/2", z=3, ptype="A")
    full = ldpc_waterfall_campaign(params, **TINY)
    assert len(full) == 4

    # interrupted after 2 points, capturing the per-point resume state
    states = []
    part1 = ldpc_waterfall_campaign(
        params, **{**TINY, "n_measurements": 2},
        on_point=lambda rec, st: states.append(st))
    last = states[-1]
    part2 = ldpc_waterfall_campaign(
        params, **TINY, start_point=last["point"] + 1,
        start_snr=last["next_snr"], start_ctr=last["ctr"])
    assert part1 + part2 == full


def test_campaign_cli_rerun_no_duplicates(tmp_path):
    from ldpc_sparc_tpu import cli
    argv = ["ldpc-campaign", "--standard", "802.16", "--rate", "1/2",
            "--z", "3", "--points", "3", "--min-errors", "2",
            "--max-blocks", "32", "--batch", "8", "--max-iters", "10",
            "--out", str(tmp_path), "--platform", "cpu"]
    cli.main(argv)
    txt1 = (tmp_path / "results.txt").read_text()
    assert len(txt1.strip().splitlines()) == 3
    # re-run: everything already measured -> identical file, no duplicates
    cli.main(argv)
    assert (tmp_path / "results.txt").read_text() == txt1
    # the store holds exactly the 3 point cells
    lines = (tmp_path / "ldpc_campaign.jsonl").read_text().strip().splitlines()
    assert len(lines) == 3


def test_bp_backend_dispatch_matches():
    import jax.numpy as jnp
    from ldpc_sparc_tpu.models.ldpc import get_code
    from ldpc_sparc_tpu.ops.bp import bp_decode, default_bp_backend

    assert default_bp_backend() in ("xla", "pallas")  # cpu tests -> xla
    code = get_code("802.16", "1/2", 3)
    rng = np.random.default_rng(1)
    x = np.asarray(code.encode(jnp.zeros(code.K, jnp.int32)))
    llr = jnp.asarray(2.0 * ((1.0 - 2.0 * x) +
                             0.6 * rng.normal(size=code.N)), jnp.float32)
    r_xla = bp_decode(llr[None, :], code.graph, 30, backend="xla")
    r_pal = bp_decode(llr[None, :], code.graph, 30,
                      backend="pallas_interpret")
    assert (np.asarray(r_xla.app < 0) == np.asarray(r_pal.app < 0)).all()
    assert (np.asarray(r_xla.iterations) == np.asarray(r_pal.iterations)).all()
