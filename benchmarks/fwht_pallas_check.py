"""On-hardware fused-Pallas SRHT check: exactness vs the XLA chain + speed.

Times three levels at the flagship config (L=1024, M=512, R=1.0 — the
BASELINE.json north-star operating point) with the design-product backend
set to (a) the XLA Kronecker chain, (b) the fused Pallas kernel:

  * pair — forward A.beta + adjoint A^T.z (the AMP hot pair)
  * full — the jitted vmapped AMP decode (the bench.py measurement)

and checks that the Pallas-backend decode reaches the same BER (0.0) and
agrees with the XLA design products to bf16-accumulation tolerance.

Writes docs/artifacts/fwht_pallas_tpu_check.json.

Usage: python benchmarks/fwht_pallas_check.py [--batch 128] [--t_max 25]
       [--dtype bfloat16|float32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=5, windows=4):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t_max", type=int, default=25)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--mlf", type=int, default=5,
                    help="XLA-chain max_log_factor (best from perf_sweep)")
    ap.add_argument("--mode", default="ms", choices=("ms", "2mm"),
                    help="Pallas kernel flavor: multi-stage single-pass "
                         "or two-sided two-matmul")
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache", jax.default_backend())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from ldpc_sparc_tpu.config import SparcParams, DecodeParams
    from ldpc_sparc_tpu.ops import wht, wht_pallas
    from ldpc_sparc_tpu.ops.transforms import SparcDesign
    from ldpc_sparc_tpu.models.sparc import amp_decode, awgn_channel
    from ldpc_sparc_tpu.utils import bits as bitops

    params = SparcParams(P=15.0, R=1.0, L=1024, M=512)
    decode = DecodeParams(t_max=args.t_max)
    awgn_var = 1.0
    B = args.batch
    wht.set_fwht_options(max_log_factor=args.mlf)
    wht_pallas.set_fwht_backend(dtype=args.dtype, mode=args.mode)
    design = SparcDesign.for_params(params, awgn_var, seed=0)

    key = jax.random.key(0)
    bits = jax.vmap(lambda k: bitops.random_bits(k, params.bit_len))(
        jax.random.split(key, B))
    beta0 = jax.vmap(lambda b: bitops.bits_to_msg_vector(b, params.M))(bits)

    row = {"platform": jax.devices()[0].platform, "batch": B,
           "mlf_xla": args.mlf, "pallas_dtype": args.dtype,
           # record the flavor actually dispatched at this width, not the
           # requested knob ('ms' below w=1024 falls back to '2mm')
           "pallas_mode": wht_pallas.resolved_fwht_mode(design.w),
           "pallas_mode_requested": args.mode,
           "w": design.w, "offset": design.offset}
    results = {}
    for backend in ("xla", "pallas"):
        wht_pallas.set_fwht_backend(backend=backend)

        @jax.jit
        def pair(b):
            return design.az(design.ab(b))

        @jax.jit
        def decode_batch(y):
            res = jax.vmap(lambda yy: amp_decode(
                yy, design, params, decode, awgn_var))(y)
            return res.beta, res.t_final

        x = jax.jit(design.ab)(beta0)
        y = awgn_channel(x, awgn_var, jax.random.fold_in(key, 7))
        dt_pair, pr = timeit(pair, beta0)
        dt_full, (beta, _) = timeit(decode_batch, y)
        bits_out = jax.vmap(lambda b: bitops.msg_vector_to_bits(
            b, params.M))(beta)
        ber = float(jnp.mean(bits.astype(jnp.int32)
                             != bits_out.astype(jnp.int32)))
        iters = B * (decode.t_max - 1)
        results[backend] = {"pair_out": np.asarray(pr), "x": np.asarray(x)}
        row[backend] = {
            "pair_ms": round(dt_pair * 1e3, 3),
            "full_ms": round(dt_full * 1e3, 3),
            "iters_per_s": round(iters / dt_full, 1),
            "ber": ber,
        }
    wht_pallas.set_fwht_backend(backend="auto")

    # agreement: forward products and the A^T A pair to bf16 tolerance
    ref = results["xla"]["pair_out"]
    got = results["pallas"]["pair_out"]
    denom = np.abs(ref).mean() + 1e-9
    row["pair_rel_err"] = float(np.abs(got - ref).max() / denom)
    row["x_rel_err"] = float(
        np.abs(results["pallas"]["x"] - results["xla"]["x"]).max()
        / (np.abs(results["xla"]["x"]).mean() + 1e-9))
    row["pallas_speedup_pair"] = round(
        row["xla"]["pair_ms"] / row["pallas"]["pair_ms"], 2)
    row["pallas_speedup_full"] = round(
        row["xla"]["full_ms"] / row["pallas"]["full_ms"], 2)
    print(json.dumps(row))

    # keyed by kernel mode so both measured flavors stay on record
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts",
        "fwht_pallas_tpu_check.json")
    doc = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        if "pallas_mode" in prev:          # legacy single-row schema
            doc[prev["pallas_mode"]] = prev
        elif "xla" in prev:
            doc["2mm"] = prev
        else:
            doc = prev
    doc[args.mode] = row
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)

    # bf16 inputs with f32 accumulation across a width-2^19 two-sided
    # product: relative error ~sqrt(w)*2^-9 on near-cancelling outputs
    tol = 0.04 if args.dtype == "bfloat16" else 1e-4
    if row["pair_rel_err"] > tol or row["pallas"]["ber"] > 0.0:
        print("MISMATCH between Pallas and XLA design products",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
