"""Decompose the z=150 concatenated sweep point into AMP / BP / overhead.

The round-4 roofline recorded that the integrated decoder's z=150 point
(the reference's working config, performance_plots_general.py:35-47)
costs ~13.6 s at runs=5 and routes its small per-trial BP batches to the
XLA scan kernel — but not WHERE the time goes. This benchmark measures,
all on-chip and all warm:

  * full integrated + naive + sequential + amp_only points at runs=5/20
    (concat_mc_trial_errors, the sweep's own entry point);
  * amp_only is the AMP-transform share (25 iterations of SRHT ab/az +
    MMSE, no BP);
  * an ideally-packed BP-only program with the SAME total BP work as the
    integrated decoder ((t_max-1) x 6-iteration passes + one 200-iteration
    pass over runs*mults lane-packed blocks) — the lower bound for the
    BP share if cross-trial lane packing were perfect;
  * the integrated-minus-amp_only difference = actual BP + bridge cost
    inside the vmapped trial, whose gap to the ideal-packed bound is the
    packing/dispatch overhead the round-4 verdict asked to quantify.

Writes docs/artifacts/concat_profile.json; interpreted in
docs/ROOFLINE.md (concat section).

Usage: python benchmarks/concat_profile.py [--platform cpu] [--snr 3.8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "artifacts")


def timeit(fn, reps=3):
    import jax
    jax.block_until_ready(fn())  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--snr", type=float, default=3.8)
    ap.add_argument("--t-max", type=int, default=25)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from ldpc_sparc_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from ldpc_sparc_tpu.config import (SparcParams, LdpcParams, DecodeParams,
                                       param_calc)
    from ldpc_sparc_tpu.models.ldpc import get_code
    from ldpc_sparc_tpu.parallel.montecarlo import concat_mc_trial_errors
    from ldpc_sparc_tpu.ops.bp import bp_decode

    # the z=150 working config (concat-sweep CLI defaults)
    ldpc = LdpcParams(standard="802.16", rate="1/2", z=150, ptype="A")
    code = get_code("802.16", "1/2", 150)
    rate, L_sparc, L_sparc_ldpc, lengths = param_calc(
        4, 1, ldpc, ldpc.rate_float, 1.0, code.K)
    sp = SparcParams(P=19.44, R=1.0, L=L_sparc_ldpc, M=2)
    dec = DecodeParams(t_max=args.t_max)
    awgn_var = sp.P / args.snr
    mults = lengths.mults

    results = {"config": {"standard": "802.16", "rate": "1/2", "z": 150,
                          "P": sp.P, "L": sp.L, "M": sp.M, "mults": mults,
                          "t_max": dec.t_max, "snr": args.snr},
               "points": {}}

    for runs in (5, 20):
        row = {}
        for decname in ("amp_only", "naive", "integrated", "sequential"):
            dt = timeit(lambda d=decname: concat_mc_trial_errors(
                sp, ldpc, lengths, decname != "amp_only", dec, awgn_var,
                (3, 0), runs, d))
            row[decname + "_s"] = round(dt, 3)
            print(json.dumps({"runs": runs, "decoder": decname,
                              "wall_s": round(dt, 3)}), flush=True)

        # ideally lane-packed BP-only program with the integrated
        # decoder's total BP workload
        nlanes = runs * mults
        key = jax.random.key(0)
        llr = 2.0 * jax.random.normal(key, (nlanes, code.N), jnp.float32)

        @jax.jit
        def bp_workload(llr):
            def body(carry, _):
                r = bp_decode(carry, code.graph, max_iters=6,
                              method="sumprod")
                return r.app * 0.5, None  # feed posteriors back (shape-alike)
            x, _ = jax.lax.scan(body, llr, None, length=dec.t_max - 1)
            return bp_decode(x, code.graph, max_iters=200,
                             method="sumprod").app

        dt_bp = timeit(lambda: bp_workload(llr))
        row["bp_ideal_packed_s"] = round(dt_bp, 3)

        # the same BP workload under the SWEEP'S OWN structure — vmapped
        # over trials with mults blocks per trial (what ConcatCodec.ldpc_bp
        # sees) — isolates vmap-structure cost from bridge/denoiser cost
        llr_t = llr.reshape(runs, mults, code.N)

        @jax.jit
        def bp_vmapped(llr_t):
            def per_trial(l):
                def body(carry, _):
                    r = bp_decode(carry, code.graph, max_iters=6,
                                  method="sumprod")
                    return r.app * 0.5, None
                x, _ = jax.lax.scan(body, l, None, length=dec.t_max - 1)
                return bp_decode(x, code.graph, max_iters=200,
                                 method="sumprod").app
            return jax.vmap(per_trial)(llr_t)

        dt_bpv = timeit(lambda: bp_vmapped(llr_t))
        row["bp_vmapped_s"] = round(dt_bpv, 3)

        # the full eta side-chain (bridge -> LLR -> BP -> bridge) in the
        # sweep's structure: what remains of (integrated - amp_only) after
        # this is the denoiser + Onsager-derivative residual
        from ldpc_sparc_tpu.ops.bridges import (section_probs_to_bit_probs,
                                                bit_probs_to_section_probs)
        from ldpc_sparc_tpu.models.concat import ConcatCodec
        codec = ConcatCodec(sp, ldpc, lengths, True)
        LM = sp.L * sp.M
        probs0 = jnp.full((runs, LM), 1.0 / sp.M, jnp.float32)

        @jax.jit
        def eta_chain(probs):
            def per_trial(pr):
                def body(carry, _):
                    bp0 = section_probs_to_bit_probs(carry, sp.M)
                    post = codec.ldpc_bp(bp0, 6, hard=False)
                    return bit_probs_to_section_probs(post, sp.M), None
                x, _ = jax.lax.scan(body, pr, None, length=dec.t_max - 1)
                bp0 = section_probs_to_bit_probs(x, sp.M)
                return codec.ldpc_bp(bp0, 200, hard=True)
            return jax.vmap(per_trial)(probs)

        dt_eta = timeit(lambda: eta_chain(probs0))
        row["eta_chain_s"] = round(dt_eta, 3)
        row["bp_actual_s"] = round(row["integrated_s"] - row["amp_only_s"], 3)
        row["amp_share"] = round(row["amp_only_s"] / row["integrated_s"], 3)
        row["bp_share"] = round(row["bp_actual_s"] / row["integrated_s"], 3)
        row["packing_overhead_x"] = round(
            row["bp_actual_s"] / dt_bp, 2) if dt_bp > 0 else None
        results["points"][f"runs={runs}"] = row
        print(json.dumps({f"runs={runs}": row}), flush=True)

    results["platform"] = jax.devices()[0].platform
    with open(os.path.join(ART, "concat_profile.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"artifact": "concat_profile.json"}))


if __name__ == "__main__":
    main()
