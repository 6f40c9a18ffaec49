"""On-hardware packed-vs-per-trial decode equivalence at production size.

tests/test_concat.py gates decode_batch == vmap(decode) bitwise on the
CPU mesh, but at small lane counts BOTH paths route BP to the XLA scan
kernel. At production packing (batch*mults >= 64 lanes) the packed path
routes to the PALLAS kernel while the per-trial path stays on XLA — the
one regime the CPU gate cannot exercise (the round-5 review's finding).
The two kernels are gated decision-exact per BP call
(tests/test_bp_pallas.py + docs/artifacts/bp_pallas_tpu_check.json), but
soft APPs are only allclose (~1e-4), and the interleaved/integrated
decoders feed soft BP outputs back through ~24 AMP iterations.

This check measures the end-to-end consequence on the real TPU at the
z=150 working config: per-trial user-bit error counts from
concat_mc_trial_errors (packed, Pallas-eligible) vs a direct
vmap(codec.decode) (per-trial XLA routing) at matched seeds/designs.

Writes docs/artifacts/packed_equivalence_tpu.json recording, per decoder,
the per-trial counts from both paths and whether they are identical.

Usage: python benchmarks/packed_equivalence_check.py [--runs 20]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "artifacts")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--snr", type=float, default=3.8)
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
    from ldpc_sparc_tpu.models.concat import ConcatCodec
    from ldpc_sparc_tpu.models.sparc import awgn_channel
    from ldpc_sparc_tpu.parallel.montecarlo import concat_mc_trial_errors
    from ldpc_sparc_tpu.utils import rng as rngmod

    ldpc = LdpcParams(standard="802.16", rate="1/2", z=150, ptype="A")
    code = get_code("802.16", "1/2", 150)
    _, _, L_ldpc, lengths = param_calc(4, 1, ldpc, ldpc.rate_float, 1.0,
                                       code.K)
    sp = SparcParams(P=19.44, R=1.0, L=L_ldpc, M=2)
    dec = DecodeParams(t_max=25)
    awgn_var = sp.P / args.snr
    runs = args.runs
    seed = (3, 0)
    n_designs = min(8, runs)

    codec = ConcatCodec(sp, ldpc, lengths, True)
    designs = [codec.build_design((seed, d)) for d in range(n_designs)]
    designs = designs[0].with_leaves(
        jnp.stack([d.idx for d in designs]),
        jnp.stack([d.signs for d in designs]))
    root = rngmod.root_key(seed)
    keys = jax.vmap(lambda i: jax.random.fold_in(root, i))(jnp.arange(runs))
    didx = jnp.arange(runs, dtype=jnp.int32) % n_designs

    rows = []
    for decoder in ("sequential", "naive", "integrated"):
        packed = concat_mc_trial_errors(sp, ldpc, lengths, True, dec,
                                        awgn_var, seed, runs, decoder)

        @jax.jit
        def per_trial(keys, didx, idx, signs, dn=decoder):
            def one(key, di):
                d = designs.with_leaves(idx[di], signs[di])
                user_bits, _, beta0 = codec.encode_message(key)
                x = d.ab(beta0 / codec.c_amp)
                y = awgn_channel(x, awgn_var,
                                 rngmod.derive(key, rngmod.CHANNEL))
                out = codec.decode(y, d, dec, dn)
                return jnp.sum(user_bits != out)
            return jax.vmap(one)(keys, didx)

        vmapped = np.asarray(per_trial(keys, didx, designs.idx,
                                       designs.signs))
        identical = bool(np.array_equal(packed, vmapped))
        max_delta = int(np.max(np.abs(packed.astype(np.int64) -
                                      vmapped.astype(np.int64))))
        rows.append({"decoder": decoder,
                     "packed": packed.tolist(),
                     "per_trial_xla": vmapped.tolist(),
                     "identical": identical,
                     "max_per_trial_delta_bits": max_delta,
                     "user_bits_per_trial": codec.user_bits_len})
        print(json.dumps({"decoder": decoder, "identical": identical,
                          "max_delta_bits": max_delta}), flush=True)

    out = {"platform": jax.devices()[0].platform,
           "config": {"z": 150, "runs": runs, "snr": args.snr,
                      "t_max": dec.t_max,
                      "packed_bp_lanes": runs * lengths.mults},
           "rows": rows}
    with open(os.path.join(ART, "packed_equivalence_tpu.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"artifact": "packed_equivalence_tpu.json"}))


if __name__ == "__main__":
    main()
