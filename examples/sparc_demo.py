"""SPARC demo: the four code families with SE overlays.

Script reproduction of sparc_public/sparc_demo.ipynb (regular /
power-allocated / spatially-coupled / modulated-complex SPARC runs with
state-evolution overlay plots, whose stored outputs are the round-trip
baselines in BASELINE.md).

Usage:  python examples/sparc_demo.py [--platform cpu] [--runs 5]
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
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default="sparc_demo.png")
    ap.add_argument("--json", default=None,
                    help="also write per-run wall-clocks/BERs to this path")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ldpc_sparc_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from ldpc_sparc_tpu import SparcParams, DecodeParams, sparc_sim, sparc_se

    configs = {
        "regular (L=1024,M=32,R=1.3)":
            SparcParams(P=15.0, R=1.3, L=1024, M=32),
        "power-allocated (B=32,R=1.4)":
            SparcParams(P=15.0, R=1.4, L=1024, M=32,
                        power_allocated=True, B=32, R_PA_ratio=1.0),
        "spatially-coupled (w=2,La=8,R=1.4)":
            SparcParams(P=15.0, R=1.4, L=1024, M=32,
                        spatially_coupled=True, omega=2, Lambda=8),
        "modulated complex (M=8,K=4,R=2.6)":
            SparcParams(P=15.0, R=2.6, L=2048, M=8, is_complex=True,
                        modulated=True, K=4),
    }
    dec = DecodeParams(t_max=25)
    awgn_var = 1.0

    all_traj = {}
    stats = {}
    for name, p in configs.items():
        trajs, times, bers, tf = [], [], [], []
        for seed in range(args.runs):
            t0 = time.perf_counter()
            r = sparc_sim(p, dec, awgn_var, seed=seed)
            jax.block_until_ready(r["nmse"])
            times.append(time.perf_counter() - t0)
            trajs.append(np.asarray(r["nmse"]).mean(axis=-1))
            bers.append(float(r["ber"]))
            tf.append(int(r["t_final"]))
            print(f"{name}: run {seed}: ber={float(r['ber']):.4g} "
                  f"t_final={int(r['t_final'])} {times[-1]:.3f}s")
        psi_se, _ = sparc_se(awgn_var, p, dec.t_max, 4000, seed=0)
        all_traj[name] = (np.mean(trajs, axis=0), psi_se.mean(axis=-1))
        stats[name] = {"wall_s_per_run": [round(t, 4) for t in times],
                       "ber": bers, "t_final": tf}

    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({"platform": jax.devices()[0].platform,
                       "runs_per_config": args.runs,
                       "note": "first run per config includes compile; "
                               "reference-CPU ranges in BASELINE.md",
                       "configs": stats}, f, indent=1)
        print(f"wrote {args.json}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, len(all_traj), figsize=(16, 3.5))
        for ax, (name, (emp, se)) in zip(axes, all_traj.items()):
            ax.semilogy(emp + 1e-8, "o-", label="AMP (empirical)")
            ax.semilogy(se + 1e-8, "--", label="state evolution")
            ax.set_title(name, fontsize=8)
            ax.set_xlabel("iteration")
            ax.legend(fontsize=7)
            ax.grid(alpha=0.3)
        axes[0].set_ylabel("NMSE")
        fig.tight_layout()
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
