"""Per-AMP-iteration BER probes for the interleaved/integrated decoders.

Script reproduction of the reference's instrumentation workflow: the ~8
hand-copied `*_test` decoder variants emit the user-bit BER before and
after the inner BP pass at every AMP iteration
(sparc_sophie/sparc_new.py:314-409, 573-641; per-BP-iteration probes
:1195-1232), which the project notes use to debug the Onsager term and BP
schedule (performance_plots_notes.txt:40-81). Here one implementation —
ConcatCodec.decode_instrumented — produces the same probes as a single
jitted scan, and this script commits the resulting figure at the
reference's working z=150 config.

Usage: python examples/concat_probes.py [--platform cpu] [--small]
       [--seeds 3] [--snr 3.14] [--out ...png] [--json ...json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--small", action="store_true",
                    help="tiny z=12 config for CPU smoke runs")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--snr", type=float, default=3.14,
                    help="linear snr (awgn_var = P/snr), mid-waterfall")
    ap.add_argument("--out", default="concat_probes.png")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ldpc_sparc_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from ldpc_sparc_tpu.config import (SparcParams, LdpcParams, DecodeParams,
                                       param_calc)
    from ldpc_sparc_tpu.models.ldpc import get_code
    from ldpc_sparc_tpu.models.concat import ConcatCodec
    from ldpc_sparc_tpu.models.sparc import awgn_channel
    from ldpc_sparc_tpu.utils import rng as rngmod

    if args.small:
        ldpc = LdpcParams(standard="802.16", rate="1/2", z=12)
        mults, t_max = 2, 8
    else:
        # the reference's working config (performance_plots_general.py:35-47)
        ldpc = LdpcParams(standard="802.16", rate="1/2", z=150)
        mults, t_max = 4, 25
    code = get_code(ldpc.standard, ldpc.rate, ldpc.z)
    rate, L_sparc, L_sparc_ldpc, lengths = param_calc(
        mults=mults, logM=1, ldpc=ldpc, int_rate=ldpc.rate_float,
        R_sparc_ldpc=1.0, ldpc_K=code.K)
    sp = SparcParams(P=19.44, R=1.0, L=L_sparc_ldpc, M=2)
    dec = DecodeParams(t_max=t_max)
    codec = ConcatCodec(sp, ldpc, lengths, ldpc_protected=True)
    awgn_var = sp.P / args.snr

    probes = {}
    walls = {}
    for decoder in ("naive", "integrated"):
        pre = np.zeros(t_max)
        post = np.zeros(t_max)
        t0 = time.perf_counter()
        for seed in range(args.seeds):
            key = rngmod.root_key(seed)
            design = codec.build_design(seed)

            @jax.jit
            def trial(key):
                user_bits, _, beta0 = codec.encode_message(key)
                x = design.ab(beta0 / codec.c_amp)
                y = awgn_channel(x, jnp.float32(awgn_var),
                                 rngmod.derive(key, rngmod.CHANNEL))
                out = codec.decode_instrumented(y, design, dec, decoder)
                return user_bits, out

            user_bits, out = trial(key)
            ub = np.asarray(user_bits)
            pre += np.mean(np.asarray(out["pre_bp"]) != ub[None, :], axis=1)
            post += np.mean(np.asarray(out["post_bp"]) != ub[None, :], axis=1)
        walls[decoder] = round(time.perf_counter() - t0, 2)
        probes[decoder] = {"pre_bp": (pre / args.seeds).tolist(),
                           "post_bp": (post / args.seeds).tolist()}
        print(f"{decoder}: final post-BP BER "
              f"{probes[decoder]['post_bp'][-1]:.4g} "
              f"({walls[decoder]} s for {args.seeds} seeds)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"platform": jax.devices()[0].platform,
                       "config": {"standard": ldpc.standard,
                                  "rate": ldpc.rate, "z": ldpc.z,
                                  "mults": mults, "logM": 1,
                                  "snr": args.snr, "t_max": t_max,
                                  "seeds": args.seeds},
                       "wall_s": walls, "probes": probes}, f, indent=1)
        print(f"wrote {args.json}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 2, figsize=(11, 4), sharey=True)
    floor = 1e-5
    for ax, decoder in zip(axes, probes):
        p = probes[decoder]
        ax.semilogy(np.array(p["pre_bp"]) + floor, "o-",
                    label="pre-BP (after MMSE)")
        ax.semilogy(np.array(p["post_bp"]) + floor, "s-",
                    label="post-BP (after inner BP)")
        ax.set_title(f"{decoder} decoder")
        ax.set_xlabel("AMP iteration")
        ax.grid(True, which="both", alpha=0.3)
        ax.legend()
    axes[0].set_ylabel(f"user-bit BER + {floor:g}")
    fig.suptitle(f"Per-iteration BER probes, {ldpc.standard} {ldpc.rate} "
                 f"z={ldpc.z}, snr={args.snr}")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
