"""Hardware sweep of the AMP hot-loop tuning knobs (VERDICT round-1 item 3).

Sweeps (batch, FWHT max_log_factor, MXU dtype) on the real chip and times
three levels:

  * full    — the jitted vmapped AMP decode (the bench.py measurement)
  * fwht    — one forward + one adjoint design product (the A beta / A^T z
              pair that dominates each AMP iteration)
  * denoise — the MMSE denoiser alone

Per-iteration FLOP model (flagship L=1024, M=512, R=1.0: w = LM = 2^19,
factors f_i from the split): the two design products cost
2 * (2 * w * sum(f_i)) FLOPs; the denoiser ~6 * LM. Reported GFLOP/s uses
this model, and docs/ROOFLINE.md interprets it against the v5e roofline.

Usage: python benchmarks/perf_sweep.py [--batches 8,32,128]
       [--factors 5,7,10] [--dtypes float32,bfloat16] [--level full,fwht]
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
    ap.add_argument("--batches", default="8,32,128")
    ap.add_argument("--factors", default="5,7,10")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--levels", default="full,fwht,denoise")
    ap.add_argument("--t_max", type=int, default=25)
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
    from ldpc_sparc_tpu.config import SparcParams, DecodeParams
    from ldpc_sparc_tpu.ops import wht
    from ldpc_sparc_tpu.ops.transforms import SparcDesign
    from ldpc_sparc_tpu.ops.denoiser import mmse_denoise
    from ldpc_sparc_tpu.models.sparc import amp_decode, awgn_channel
    from ldpc_sparc_tpu.utils import bits as bitops

    params = SparcParams(P=15.0, R=1.0, L=1024, M=512)
    decode = DecodeParams(t_max=args.t_max)
    awgn_var = 1.0
    levels = args.levels.split(",")
    results = []

    for mlf in [int(v) for v in args.factors.split(",")]:
        for dt in args.dtypes.split(","):
            wht.set_fwht_options(max_log_factor=mlf, matmul_dtype=dt)
            design = SparcDesign.for_params(params, awgn_var, seed=0)
            w = design.w
            factors = wht._factorize(w.bit_length() - 1, mlf)
            flops_pair = 2 * (2 * w * sum(factors))  # fwd + adj
            flops_iter = flops_pair + 6 * design.LM

            for batch in [int(v) for v in args.batches.split(",")]:
                key = jax.random.key(0)
                bits = jax.vmap(lambda k: bitops.random_bits(
                    k, params.bit_len))(jax.random.split(key, batch))
                beta0 = jax.vmap(lambda b: bitops.bits_to_msg_vector(
                    b, params.M))(bits)
                x = design.ab(beta0)
                y = awgn_channel(x, awgn_var, jax.random.fold_in(key, 7))
                row = {"mlf": mlf, "factors": factors, "dtype": dt,
                       "batch": batch}

                if "full" in levels:
                    @jax.jit
                    def decode_batch(y):
                        res = jax.vmap(lambda yy: amp_decode(
                            yy, design, params, decode, awgn_var))(y)
                        return res.beta, res.t_final
                    dt_full, (beta, _) = timeit(decode_batch, y)
                    bits_out = jax.vmap(lambda b: bitops.msg_vector_to_bits(
                        b, params.M))(beta)
                    ber = float(jnp.mean(bits.astype(jnp.int32)
                                         != bits_out.astype(jnp.int32)))
                    iters = batch * (decode.t_max - 1)
                    row.update(
                        iters_per_s=round(iters / dt_full, 1),
                        full_ms=round(dt_full * 1e3, 3),
                        gflops=round(iters * flops_iter / dt_full / 1e9, 1),
                        ber=ber)

                if "fwht" in levels:
                    @jax.jit
                    def pair(b):
                        return design.az(design.ab(b))
                    dt_pair, _ = timeit(pair, beta0)
                    row.update(
                        fwht_pair_ms=round(dt_pair * 1e3, 3),
                        fwht_gflops=round(batch * flops_pair / dt_pair / 1e9, 1))

                if "denoise" in levels:
                    tau_inv = jnp.full((design.LM,), 2.0, jnp.float32)
                    @jax.jit
                    def den(s):
                        return jax.vmap(lambda ss: mmse_denoise(
                            ss, tau_inv, params.M, params.K))(s)
                    dt_den, _ = timeit(den, beta0 + 0.1)
                    row.update(denoise_ms=round(dt_den * 1e3, 3))

                results.append(row)
                print(json.dumps(row), flush=True)

    return results


if __name__ == "__main__":
    main()
