"""Mesh-parallel tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldpc_sparc_tpu.config import SparcParams, DecodeParams, LdpcParams
from ldpc_sparc_tpu.parallel.mesh import make_mesh
from ldpc_sparc_tpu.parallel.montecarlo import (sparc_mc_counts,
                                                sparc_ber_sweep,
                                                _ldpc_block_counts,
                                                ldpc_waterfall_campaign)
from ldpc_sparc_tpu.parallel.sharded import make_sharded_sim_step


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_sparc_mc_dp_high_snr_zero_errors():
    mesh = make_mesh(sec=1)
    p = SparcParams(P=15.0, R=1.3, L=128, M=32)
    # awgn_var=0.5: comfortably below threshold for every design draw
    # (at 1.0 a rare design/noise pairing can drop a frame at L=128)
    c = sparc_mc_counts(p, DecodeParams(t_max=15), 0.5, seed=0,
                        n_trials=16, mesh=mesh)
    assert c["bit_errs"] == 0
    assert c["frame_errs"] == 0
    assert c["frames"] == 16
    assert 0 < c["iters"] < 15 * 16  # early stopping engaged


def test_sparc_mc_partition_invariance():
    """The psum-reduced counters are EXACTLY independent of the mesh shape:
    trial keys and designs derive from the global trial index only."""
    p = SparcParams(P=15.0, R=1.6, L=64, M=16)
    dec = DecodeParams(t_max=10)
    c8 = sparc_mc_counts(p, dec, 2.0, seed=3, n_trials=16,
                         mesh=make_mesh(sec=1))
    c2 = sparc_mc_counts(p, dec, 2.0, seed=3, n_trials=16,
                         mesh=jax.make_mesh((2, 1), ("dp", "sec"),
                                            devices=jax.devices()[:2]))
    c1 = sparc_mc_counts(p, dec, 2.0, seed=3, n_trials=16,
                         mesh=jax.make_mesh((1, 1), ("dp", "sec"),
                                            devices=jax.devices()[:1]))
    assert c8 == c2 == c1, (c8, c2, c1)
    assert c1["frames"] == 16
    # R=1.6 is near threshold: some errors expected, none pathological
    assert 0 < c1["bit_errs"] <= c1["bits"]


def test_sparc_mc_padding_non_divisible():
    """n_trials that doesn't divide the dp axis pads internally; counters
    equal the 1-device run (the single trial->randomness contract)."""
    p = SparcParams(P=15.0, R=1.6, L=64, M=16)
    dec = DecodeParams(t_max=10)
    kw = dict(awgn_var=2.0, seed=3, n_trials=6)
    c8 = sparc_mc_counts(p, dec, mesh=make_mesh(sec=1), **kw)
    c1 = sparc_mc_counts(p, dec,
                         mesh=jax.make_mesh((1, 1), ("dp", "sec"),
                                            devices=jax.devices()[:1]), **kw)
    assert c8 == c1, (c8, c1)
    assert c1["frames"] == 6


def test_sparc_mc_pow2_flagship_shape():
    """Power-of-two larger block side (the offset=0 full-window SRHT layout)
    runs through the DP harness — the round-1 regression reproducer."""
    p = SparcParams(P=15.0, R=1.3, L=128, M=32)
    c = sparc_mc_counts(p, DecodeParams(t_max=10), 1.0, seed=0,
                        n_trials=8, mesh=make_mesh(sec=1))
    assert c["frames"] == 8 and c["bit_errs"] == 0


def test_concat_mc_partition_invariance_and_padding():
    """The batched concatenated-decoder Monte-Carlo returns per-trial error
    counts that are bit-identical on any mesh shape, including a trial
    count that does not divide the dp axis (internal padding)."""
    from ldpc_sparc_tpu.config import param_calc
    from ldpc_sparc_tpu.models.ldpc import get_code
    from ldpc_sparc_tpu.parallel.montecarlo import (concat_mc_trial_errors,
                                                    concat_ber_point)
    ldpc = LdpcParams(standard="802.16", rate="1/2", z=12)
    code = get_code("802.16", "1/2", 12)
    rate, L_sparc, L_sparc_ldpc, lengths = param_calc(
        mults=2, logM=2, ldpc=ldpc, int_rate=0.5, R_sparc_ldpc=1.0,
        ldpc_K=code.K)
    sp = SparcParams(P=19.44, R=1.0, L=L_sparc_ldpc, M=4)
    dec = DecodeParams(t_max=8)
    kw = dict(awgn_var=19.44 / 6.0, seed=2, n_trials=6, decoder="naive")
    e8 = concat_mc_trial_errors(sp, ldpc, lengths, True, dec,
                                mesh=make_mesh(sec=1), **kw)
    e1 = concat_mc_trial_errors(
        sp, ldpc, lengths, True, dec,
        mesh=jax.make_mesh((1, 1), ("dp", "sec"),
                           devices=jax.devices()[:1]), **kw)
    assert e8.shape == e1.shape == (6,)
    np.testing.assert_array_equal(e8, e1)
    # aggregation: point dict consistent with the raw counts
    pt = concat_ber_point(sp, ldpc, lengths, True, dec, 19.44 / 6.0, 2,
                          n_trials=6, decoder="naive",
                          mesh=make_mesh(sec=1))
    assert pt["bit_errs"] == int(np.sum(e8))
    assert pt["frames"] == 6
    assert pt["ber_min"] <= pt["ber"] <= pt["ber_max"]
    # high SNR: everything decodes
    assert pt["bit_errs"] == 0


def test_sharded_design_matches_unsharded():
    """ShardedDesign is a column-major VIEW of the one SparcDesign engine:
    same seed => identical operator, including the pow-2 offset-0 layout
    (VERDICT r2 weak 3: the old fork doubled the FWHT width here)."""
    from ldpc_sparc_tpu.parallel.sharded import ShardedDesign
    from ldpc_sparc_tpu.ops.transforms import SparcDesign
    from ldpc_sparc_tpu.config import create_base_matrix

    # flagship-style: pow-2 larger side -> full-window offset-0, w == L*M/Lc
    p = SparcParams(P=15.0, R=1.0, L=64, M=16)
    sd = ShardedDesign(p, 1.0, seed=7)
    ud = SparcDesign.for_params(p, 1.0, seed=7)
    assert sd.design.offset == ud.offset == 0
    assert sd.w == ud.w == max(sd.Mr, sd.Mc)  # narrow transform, not 2x
    # block-for-block: undo the column-major permutation and compare leaves
    order = np.lexsort((np.asarray(ud.rows), np.asarray(ud.cols)))
    np.testing.assert_array_equal(np.asarray(sd.idx),
                                  np.asarray(ud.idx)[order])
    np.testing.assert_array_equal(np.asarray(sd.signs),
                                  np.asarray(ud.signs)[order])
    np.testing.assert_array_equal(np.asarray(sd.rows),
                                  np.asarray(ud.rows)[order])
    np.testing.assert_array_equal(np.asarray(sd.cols),
                                  np.asarray(ud.cols)[order])

    # SC config: operators agree as matrices (dense materialization)
    psc = SparcParams(P=15.0, R=1.4, L=32, M=8,
                      spatially_coupled=True, omega=2, Lambda=8)
    sdc = ShardedDesign(psc, 1.0, seed=3)
    udc = SparcDesign.for_params(psc, 1.0, seed=3)
    re_sorted = SparcDesign(
        sdc.idx, sdc.signs, sdc.scale,
        tuple(int(r) for r in np.asarray(sdc.rows)),
        tuple(int(c) for c in np.asarray(sdc.cols)),
        udc.Lr, udc.Lc, udc.Mr, udc.Mc, udc.w, udc.n, udc.LM, udc.offset)
    np.testing.assert_array_equal(re_sorted.dense(), udc.dense())


def test_sharded_tall_blocks():
    """Mr > Mc (low-rate plain SPARC) runs through the sharded path — the
    old fork asserted Mr <= Mc and refused these."""
    p = SparcParams(P=12.0, R=0.3, L=32, M=8)
    mesh = jax.make_mesh((2, 1), ("dp", "sec"), devices=jax.devices()[:2])
    run, _ = make_sharded_sim_step(p, DecodeParams(t_max=8), 1.0, mesh, seed=0)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(2), i))(
        jnp.arange(4))
    out = run(keys)
    assert out["bit_errs"] == 0  # R=0.3 at P=12 is far below threshold
    assert out["frame_errs"] == 0


def test_sharded_modulated_complex():
    """K=4 PSK (complex design/AMP) through the section-sharded step, with
    sec-axis partition invariance."""
    sp = SparcParams(P=15.0, R=1.0, L=64, M=16, modulated=True, K=4,
                     is_complex=True, spatially_coupled=True, omega=2,
                     Lambda=8)
    dec = DecodeParams(t_max=8)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(4), i))(
        jnp.arange(4))
    outs = []
    for dp, sec in [(1, 4), (2, 1)]:
        mesh = make_mesh(dp=dp, sec=sec)
        run, _ = make_sharded_sim_step(sp, dec, 1.0, mesh, seed=1)
        outs.append(run(keys))
    assert outs[0] == outs[1], outs
    assert outs[0]["frame_errs"] <= 1  # comfortably below threshold


def test_sharded_sc_sim_matches_unsharded_statistics():
    """Section-sharded AMP reproduces the unsharded decoder's error
    statistics for the same SC config (TP correctness check)."""
    from ldpc_sparc_tpu.models.sparc import sparc_sim
    sp = SparcParams(P=15.0, R=1.4, L=128, M=16,
                     spatially_coupled=True, omega=2, Lambda=8)
    dec = DecodeParams(t_max=12)

    mesh = make_mesh(dp=2, sec=4)
    run, _ = make_sharded_sim_step(sp, dec, 1.0, mesh, seed=0)
    n_trials = 8
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(0), i))(
        jnp.arange(n_trials))
    out = run(keys)
    ser_sharded = out["sec_errs"] / (n_trials * sp.L)

    sers = [float(sparc_sim(sp, dec, 1.0, seed=s)["ser"]) for s in range(8)]
    ser_ref = np.mean(sers)
    # both around 5-15% for this config; agree within MC noise
    assert abs(ser_sharded - ser_ref) < 0.08, (ser_sharded, ser_ref)
    # t_final identical across shards and sensible
    assert 0 < out["iter_sum"] <= n_trials * dec.t_max


def test_sharded_sec_axis_partition_invariance():
    """Same trials on (1,4) and (4,1) meshes give identical counters —
    collectives exactly reconstruct the unsharded computation."""
    sp = SparcParams(P=15.0, R=1.4, L=64, M=16,
                     spatially_coupled=True, omega=2, Lambda=8)
    dec = DecodeParams(t_max=8)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(1), i))(
        jnp.arange(4))
    outs = []
    for dp, sec in [(1, 4), (4, 1), (2, 2)]:
        mesh = make_mesh(dp=dp, sec=sec)
        run, _ = make_sharded_sim_step(sp, dec, 1.0, mesh, seed=5)
        outs.append(run(keys))
    for k in outs[0]:
        assert outs[0][k] == outs[1][k] == outs[2][k], (k, outs)


def test_ldpc_block_counts_sharded():
    from ldpc_sparc_tpu.models.ldpc import get_code
    code = get_code("802.11n", "1/2", 27)
    mesh = make_mesh(sec=1)
    root = jax.random.key(0)
    be, bl, it = _ldpc_block_counts(code, 3.0, root, 0, 16, 60, "sumprod2",
                                    mesh)
    be1, bl1, it1 = _ldpc_block_counts(code, 3.0, root, 0, 16, 60,
                                       "sumprod2", None)
    assert (be, bl, it) == (be1, bl1, it1)  # sharding-invariant
    assert bl <= 2  # 3 dB is beyond the waterfall for rate 1/2


def test_waterfall_campaign_small():
    recs = ldpc_waterfall_campaign(
        LdpcParams(standard="802.11n", rate="1/2", z=27), seed=0,
        n_measurements=2, min_errors=4, max_blocks=64, batch=16,
        max_iters=30, mesh=make_mesh(sec=1))
    assert len(recs) == 2
    std, rate, z, ptype, snr0, nblocks, nblk, nbits, nbit, nit = recs[0]
    assert std == "802.11n" and nblocks >= 16 and nbits == nblocks * 324
    assert ptype == "A"
    assert recs[1][4] > recs[0][4]  # adaptive SNR stepping increases SNR


def test_waterfall_campaign_pipeline_identical():
    """The double-buffered single-chip campaign loop (mesh=None) produces
    BIT-IDENTICAL records to the serial mesh path: the speculative batch
    is discarded and its key window rewound at every point boundary."""
    kw = dict(seed=0, n_measurements=3, min_errors=4, max_blocks=64,
              batch=16, max_iters=30)
    params = LdpcParams(standard="802.11n", rate="1/2", z=27)
    piped = ldpc_waterfall_campaign(params, mesh=None, **kw)
    serial = ldpc_waterfall_campaign(params, mesh=make_mesh(sec=1), **kw)
    assert piped == serial


def test_multiprocess_distributed_smoke():
    """Launch the 2-process jax.distributed Monte-Carlo example — the same
    code path a multi-host pod uses (psum across the process boundary)."""
    import subprocess, sys
    from pathlib import Path
    script = Path(__file__).resolve().parent.parent / "examples" / "multihost_mc.py"
    out = subprocess.run([sys.executable, str(script), "--nprocs", "2",
                          "--port", "19541"],
                         capture_output=True, text=True, timeout=400)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "multi-process run OK" in out.stdout


def test_sparc_mc_program_cache_across_snr_and_families():
    """One compiled program serves every SNR point of a config (awgn_var,
    W, and the design scale are traced arguments): results at a given
    point must not depend on which points ran before, including for PA
    configs whose W and scale change with awgn_var through the host-side
    allocation fixed point."""
    from ldpc_sparc_tpu.parallel.montecarlo import _SPARC_MC_CACHE
    dec = DecodeParams(t_max=10)
    pa = SparcParams(P=15.0, R=1.4, L=64, M=16, power_allocated=True,
                     B=16, R_PA_ratio=0.9)
    sc = SparcParams(P=15.0, R=1.4, L=64, M=16,
                     spatially_coupled=True, omega=2, Lambda=8)
    for p in (pa, sc):
        # fresh-config reference values (first call compiles)
        a = sparc_mc_counts(p, dec, 1.0, seed=5, n_trials=8)
        size_before = len(_SPARC_MC_CACHE)
        # different SNR through the SAME cached program
        b = sparc_mc_counts(p, dec, 4.0, seed=5, n_trials=8)
        assert len(_SPARC_MC_CACHE) == size_before, "new program compiled"
        # returning to the first SNR reproduces the first result exactly
        a2 = sparc_mc_counts(p, dec, 1.0, seed=5, n_trials=8)
        assert a == a2, (a, a2)
        # the two SNRs measure genuinely different operating points
        assert b["bit_errs"] > a["bit_errs"], (a, b)


def test_sparc_mc_dft_engine():
    """The Monte-Carlo harness runs the DFT design engine (the
    reference's exact complex ensemble) through the same generic
    stacked-leaves program: high-SNR decodes cleanly and the counters
    are partition-invariant like the SRHT path."""
    p = SparcParams(P=15.0, R=2.6, L=256, M=8, modulated=True, K=4,
                    is_complex=True)
    dec = DecodeParams(t_max=14)
    c8 = sparc_mc_counts(p, dec, 1.0, seed=4, n_trials=8,
                         mesh=make_mesh(sec=1), engine="dft")
    assert c8["bit_errs"] == 0 and c8["frames"] == 8
    assert "loc_errs" in c8
    c1 = sparc_mc_counts(p, dec, 1.0, seed=4, n_trials=8,
                         mesh=jax.make_mesh((1, 1), ("dp", "sec"),
                                            devices=jax.devices()[:1]),
                         engine="dft")
    assert c8 == c1, (c8, c1)
    # the two ensembles are different programs AND different randomness:
    # near threshold they measure different (but nonzero) counts
    noisy = dict(awgn_var=15.0 / 6.5, seed=4, n_trials=8)
    cd = sparc_mc_counts(p, dec, mesh=make_mesh(sec=1), engine="dft",
                         **noisy)
    cs = sparc_mc_counts(p, dec, mesh=make_mesh(sec=1), engine="srht",
                         **noisy)
    assert cd["bit_errs"] > 0 and cs["bit_errs"] > 0
