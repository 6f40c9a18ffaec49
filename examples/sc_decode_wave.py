"""Spatially-coupled decoding wave demo.

Script reproduction of sparc_public/sparc_demo_sc_decode_wave.ipynb
(Fig. 3 of Rush, Hsieh, Venkataramanan 2021): for a large SC SPARC the
per-column-block NMSE psi_c collapses first at the coupling boundaries and
the reliability wave propagates inward with iterations.

The notebook's stored output (17.4-24.8 s/run at L=2048, M=512, omega=6,
Lambda=32, t_max=40) is the reference-CPU datapoint behind bench.py's
baseline. This script prints the same per-run wall-clock.

Usage:  python examples/sc_decode_wave.py [--platform cpu] [--small]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--small", action="store_true",
                    help="reduced size for CPU smoke runs")
    ap.add_argument("--out", default="sc_decode_wave.png")
    ap.add_argument("--json", default=None,
                    help="also write the run wall-clock to this path")
    ap.add_argument("--reps", type=int, default=1,
                    help="timed repetitions after the compile run")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ldpc_sparc_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from ldpc_sparc_tpu import SparcParams, DecodeParams
    from ldpc_sparc_tpu.models.sparc import sparc_sim

    if args.small:
        p = SparcParams(P=15.0, R=1.4, L=256, M=32,
                        spatially_coupled=True, omega=3, Lambda=8)
        t_max = 20
    else:
        p = SparcParams(P=15.0, R=1.5, L=2048, M=512,
                        spatially_coupled=True, omega=6, Lambda=32)
        t_max = 40
    dec = DecodeParams(t_max=t_max)
    awgn_var = 1.0

    def run(seed):
        # one jitted device program per trial (fresh design draw per run,
        # like the notebook's fresh A): encode -> AWGN -> AMP decode
        r = sparc_sim(p, dec, awgn_var, seed=seed)
        jax.block_until_ready(r["nmse"])
        return r

    t0 = time.perf_counter()
    res = run(0)
    dt = time.perf_counter() - t0
    steady = []
    for s in range(args.reps):
        t0 = time.perf_counter()
        res = run(s + 1)
        steady.append(time.perf_counter() - t0)
    nmse = np.asarray(res["nmse"])  # (t_max, Lc)
    t_final = int(res["t_final"])
    print(f"decode: {dt:.2f} s first run (incl. compile)"
          + (f", {min(steady):.3f} s steady" if steady else "")
          + f", {t_final} iterations "
          f"(reference CPU: 17.4-24.8 s at 33-36 iterations)")

    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({"platform": jax.devices()[0].platform,
                       "config": {"L": p.L, "M": p.M, "omega": p.omega,
                                  "Lambda": p.Lambda, "R": p.R,
                                  "t_max": t_max},
                       "wall_s_first_run": round(dt, 3),
                       "wall_s_steady": [round(t, 4) for t in steady],
                       "iterations": t_final,
                       "reference_cpu_s": [17.4, 24.8]}, f, indent=1)
        print(f"wrote {args.json}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4))
        for t in range(0, nmse.shape[0], max(1, nmse.shape[0] // 10)):
            ax.plot(nmse[t], label=f"t={t}")
        ax.set_xlabel("column block c")
        ax.set_ylabel("NMSE psi_c")
        ax.set_title("SC SPARC decoding wave")
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
