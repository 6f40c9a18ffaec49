"""On-hardware Pallas BP exactness + speed check (VERDICT round-1 item 10).

Runs BOTH LDPC BP implementations on the real TPU at the reference profile's
waterfall operating point (802.11n rate 1/2, z=27, sumprod2, SNR ~3 dB —
ldpc_jossy/data/1809301420_profile.txt) and asserts

  * iteration-exact agreement (same early-exit iteration per codeword), and
  * decision-exact agreement (same hard decisions from the APP signs)

between the Pallas single-kernel decoder (ops/bp_pallas.py) and the XLA
while-loop decoder (ops/bp.py). The XLA decoder is itself validated
decision/iteration-exact against the C++ float64 oracle (tests/test_ldpc.py),
so this closes the chain on hardware where it matters — interpret-mode
equality (tests/test_bp_pallas.py) only checks the kernel's semantics on CPU.

Also times both paths; writes docs/artifacts/bp_pallas_tpu_check.json.

Usage: python benchmarks/bp_pallas_check.py [--batch 512] [--snr 3.0]
       [--max-iters 200]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3, windows=4):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best, out


def check_config(standard, rate, z, batch, snr, max_iters, method):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ldpc_sparc_tpu.models.ldpc import get_code
    from ldpc_sparc_tpu.ops.bp import bp_decode
    from ldpc_sparc_tpu.ops.bp_pallas import bp_decode_pallas

    code = get_code(standard, rate, z)
    B = batch

    key = jax.random.key(42)
    kb = jax.random.split(key, B)
    us = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5, (code.K,))
                  .astype(jnp.int32))(kb)
    xs = code.encode(us)
    sigma2 = 1.0 / 10 ** (snr / 10)
    ys = (1.0 - 2.0 * xs) + jnp.sqrt(sigma2) * jax.vmap(
        lambda k: jax.random.normal(k, (code.N,)))(kb)
    llr = (2.0 / sigma2 * ys).astype(jnp.float32)

    xla_fn = jax.jit(lambda l: bp_decode(l, code.graph, max_iters,
                                         method, backend="xla"))
    pal_fn = jax.jit(lambda l: bp_decode_pallas(l, code.graph, max_iters,
                                                method))

    dt_xla, r_xla = timeit(xla_fn, llr)
    dt_pal, r_pal = timeit(pal_fn, llr)

    it_xla = np.asarray(r_xla.iterations)
    it_pal = np.asarray(r_pal.iterations)
    dec_xla = np.asarray(r_xla.app) < 0
    dec_pal = np.asarray(r_pal.app) < 0

    iter_match = bool((it_xla == it_pal).all())
    dec_match = bool((dec_xla == dec_pal).all())
    app_max_rel = float(np.max(
        np.abs(np.asarray(r_xla.app) - np.asarray(r_pal.app)) /
        (np.abs(np.asarray(r_xla.app)) + 1e-3)))
    block_errs = int(np.sum((dec_xla != np.asarray(xs, bool)).any(axis=1)))

    return {
        "config": f"{standard} {rate} z={z} {method} SNR={snr}dB",
        "batch": B,
        "max_iters": max_iters,
        "iterations_exact": iter_match,
        "decisions_exact": dec_match,
        "app_max_rel_diff": round(app_max_rel, 6),
        "mean_iterations": round(float(it_xla.mean()), 2),
        "block_errors": block_errs,
        "xla_ms_per_block": round(dt_xla / B * 1e3, 4),
        "pallas_ms_per_block": round(dt_pal / B * 1e3, 4),
        "pallas_speedup_vs_xla": round(dt_xla / dt_pal, 2),
        "ref_baseline_ms_per_block": 138.0,
        "pallas_vs_ref": round(138.0 / (dt_pal / B * 1e3), 1),
    }


# default rows: the 2018 profile's operating point (the 138 ms/block
# baseline), a high-rate z=81 point, and the reference concat experiment's
# z=150 code (the VMEM-pressure case the in-place kernel exists for)
DEFAULT_CONFIGS = [
    ("802.11n", "1/2", 27, 512, 3.0),
    ("802.11n", "5/6", 81, 512, 5.0),
    ("802.16", "1/2", 150, 128, 3.0),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--standard", default=None,
                    help="run ONE config instead of the default rows")
    ap.add_argument("--rate", default="1/2")
    ap.add_argument("--z", type=int, default=27)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--snr", type=float, default=3.0)
    ap.add_argument("--max-iters", type=int, default=200)
    ap.add_argument("--method", default="sumprod2")
    args = ap.parse_args()

    import jax
    platform = jax.devices()[0].platform
    if args.standard is not None:
        configs = [(args.standard, args.rate, args.z, args.batch, args.snr)]
    else:
        configs = DEFAULT_CONFIGS

    rows = []
    for standard, rate, z, batch, snr in configs:
        row = check_config(standard, rate, z, batch, snr, args.max_iters,
                           args.method)
        print(json.dumps(row), flush=True)
        rows.append(row)

    result = {"platform": platform, "rows": rows}
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts",
        "bp_pallas_tpu_check.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)

    if not all(r["iterations_exact"] and r["decisions_exact"] for r in rows):
        print("MISMATCH between Pallas and XLA BP", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
