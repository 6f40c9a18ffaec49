"""Headline benchmark: SPARC AMP decode throughput on one TPU chip.

Config: plain SPARC, L=1024 sections, M=512, R=1.0 — BASELINE.json config 1
("plain SPARC AMP decode: L=1024, M=512, R=1.0").

Metric: AMP iterations/second (one iteration = forward A.beta + adjoint
A^T.z through the Hadamard design + the full MMSE denoiser + statistics),
measured over a vmapped batch of codewords with a fixed-length scan (every
iteration does identical work, so iterations = batch * (t_max-1) * reps).

Baseline: the reference's closest stored datapoint is the SC decode-wave
notebook — 17.4-24.8 s/run at 33-36 AMP iterations for L=2048/M=512
(sparc_public/sparc_demo_sc_decode_wave.ipynb; ~0.55 s/iteration). Scaled to
this benchmark's half-size code (L=1024/M=512), the reference CPU does
~0.275 s/iteration => 3.64 iterations/s. BASELINE.md table row 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


BASELINE_ITERS_PER_S = 3.64  # reference CPU, scaled (see module docstring)


def main():
    import os
    import jax
    # persistent compilation cache: repeat bench runs skip the slow
    # first-time XLA compiles
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache", jax.default_backend())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from ldpc_sparc_tpu.config import SparcParams, DecodeParams
    from ldpc_sparc_tpu.ops.transforms import SparcDesign
    from ldpc_sparc_tpu.models.sparc import amp_decode, awgn_channel
    from ldpc_sparc_tpu.utils import bits as bitops

    params = SparcParams(P=15.0, R=1.0, L=1024, M=512)
    decode = DecodeParams(t_max=25)
    awgn_var = 1.0
    # batch 256 is the measured optimum of the (batch, factorization)
    # sweep — docs/ROOFLINE.md section 1; the FWHT factorization default
    # is width-aware (mlf 5 at this w=2^19; ROOFLINE section 8)
    batch = 256
    design = SparcDesign.for_params(params, awgn_var, seed=0)

    key = jax.random.key(0)
    bits = jax.vmap(lambda k: bitops.random_bits(k, params.bit_len))(
        jax.random.split(key, batch))
    beta0 = jax.vmap(lambda b: bitops.bits_to_msg_vector(b, params.M))(bits)
    x = design.ab(beta0)
    y = awgn_channel(x, awgn_var, jax.random.fold_in(key, 7))

    @jax.jit
    def decode_batch(y):
        res = jax.vmap(
            lambda yy: amp_decode(yy, design, params, decode, awgn_var))(y)
        return res.beta, res.t_final

    # warmup / compile
    beta, t_final = decode_batch(y)
    beta.block_until_ready()

    # correctness gate: the benchmark decode must actually succeed
    bits_out = jax.vmap(
        lambda b: bitops.msg_vector_to_bits(b, params.M))(beta)
    ber = float(jnp.mean(bits.astype(jnp.int32) != bits_out.astype(jnp.int32)))

    # several short timing windows, best-of: per-dispatch tunnel latency is
    # noisy, throughput is the stable quantity
    reps, windows = 5, 4
    best_dt = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            beta, _ = decode_batch(y)
        beta.block_until_ready()
        best_dt = min(best_dt, time.perf_counter() - t0)
    dt = best_dt

    iters = batch * (decode.t_max - 1) * reps
    iters_per_s = iters / dt
    info_bits_per_s = batch * reps * params.bit_len / dt

    # secondary metric: LDPC BP decode (reference: 138 ms/block avg,
    # 802.11n r=1/2 z=27 sumprod2 near the waterfall,
    # ldpc_jossy/data/1809301420_profile.txt)
    from ldpc_sparc_tpu.models.ldpc import get_code
    code = get_code("802.11n", "1/2", 27)
    bp_batch = 256
    kb = jax.random.split(jax.random.fold_in(key, 99), bp_batch)
    us = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5, (code.K,))
                  .astype(jnp.int32))(kb)
    xs = code.encode(us)
    sigma2 = 1.0 / 10 ** (2.0 / 10)
    ys = (1.0 - 2.0 * xs) + jnp.sqrt(sigma2) * jax.vmap(
        lambda k: jax.random.normal(k, (code.N,)))(kb)
    llr = (2.0 / sigma2 * ys).astype(jnp.float32)
    res_bp = code.decode(llr, 50, "sumprod2")
    jax.block_until_ready(res_bp.app)
    bp_reps = 5
    bp_dt = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(bp_reps):
            res_bp = code.decode(llr, 50, "sumprod2")
        jax.block_until_ready(res_bp.app)
        bp_dt = min(bp_dt, (time.perf_counter() - t0) / bp_reps)
    bp_errs = int(jnp.sum((res_bp.app < 0).astype(jnp.int32) != xs))

    # tertiary metric: end-to-end waterfall-campaign throughput (the
    # reference's headline workload; 2018 profile: 7.2 blocks/s/core).
    # A 16-point segment of one grid config through the double-buffered
    # loop (encode+BPSK+AWGN+LLR+BP, full adaptive protocol).
    from ldpc_sparc_tpu.config import LdpcParams
    from ldpc_sparc_tpu.parallel.montecarlo import ldpc_waterfall_campaign
    cparams = LdpcParams(standard="802.16", rate="1/2", z=27, ptype="A")
    ldpc_waterfall_campaign(cparams, seed=7, n_measurements=2, batch=512,
                            dectype="sumprod2", max_iters=200)  # warm
    t0 = time.perf_counter()
    crecs = ldpc_waterfall_campaign(cparams, seed=7, n_measurements=16,
                                    batch=512, dectype="sumprod2",
                                    max_iters=200)
    c_dt = time.perf_counter() - t0
    c_blocks = sum(r[5] for r in crecs)

    # quaternary metric: the reference's z=150 working concat config
    # (802.16 r=1/2, mults=4, L=14400, integrated decoder, t_max=25),
    # one full 20-trial sweep point through the packed batch decoder
    # (models/concat.py decode_batch; docs/ROOFLINE.md section 7).
    from ldpc_sparc_tpu.config import param_calc
    from ldpc_sparc_tpu.models.ldpc import get_code as _get_code
    from ldpc_sparc_tpu.parallel.montecarlo import concat_mc_trial_errors
    cl = LdpcParams(standard="802.16", rate="1/2", z=150, ptype="A")
    ccode = _get_code("802.16", "1/2", 150)
    _, _, L_ldpc, lengths = param_calc(4, 1, cl, cl.rate_float, 1.0, ccode.K)
    csp = SparcParams(P=19.44, R=1.0, L=L_ldpc, M=2)
    cdec = DecodeParams(t_max=25)
    cvar = csp.P / 3.8
    concat_mc_trial_errors(csp, cl, lengths, True, cdec, cvar, (3, 0), 20,
                           "integrated")  # warm + compile
    cc_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        concat_mc_trial_errors(csp, cl, lengths, True, cdec, cvar, (3, 0),
                               20, "integrated")
        cc_dt = min(cc_dt, time.perf_counter() - t0)

    result = {
        "metric": "sparc_amp_iterations_per_s",
        "value": round(iters_per_s, 2),
        "unit": "AMP iterations/s/chip (L=1024, M=512, R=1.0)",
        "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 2),
        "extra": {
            "decoded_info_bits_per_s": round(info_bits_per_s, 1),
            "bench_ber": ber,
            "batch": batch,
            "t_max": decode.t_max,
            "platform": jax.devices()[0].platform,
            "ldpc_bp_ms_per_block": round(bp_dt / bp_batch * 1e3, 4),
            "ldpc_bp_vs_baseline": round(138.0 / (bp_dt / bp_batch * 1e3), 1),
            "ldpc_bp_bit_errs": bp_errs,
            "campaign_blocks_per_s": round(c_blocks / c_dt, 1),
            "campaign_vs_baseline": round(c_blocks / c_dt / 7.2, 1),
            "concat_z150_integrated_point_s": round(cc_dt, 3),
            "concat_z150_trials_per_s": round(20 / cc_dt, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
