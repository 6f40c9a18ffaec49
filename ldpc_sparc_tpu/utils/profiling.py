"""Profiling / tracing utilities.

TPU-native counterpart of the reference's profiling harness (SURVEY.md
section 5): the cProfile driver (ldpc_jossy/py/profile_ldpc.py), kernprof
decorators (sparc_sophie/testing/timing_*.py) and the notebooks'
per-trial `time.perf_counter` prints. Here:

  * `timed(fn)` — wall-clock with device sync (block_until_ready), the
    per-trial metric the baselines are quoted in (BASELINE.md)
  * `trace(path)` — context manager around jax.profiler for full XLA traces
    viewable in TensorBoard/Perfetto
  * `flops_estimate` — speed-of-light reference numbers for the two hot
    kernels (Hadamard products and BP iterations)
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax


def timed(fn: Callable, *args, reps: int = 1, warmup: int = 1, **kw):
    """Run fn reps times with device sync; returns (last_result, sec/rep)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / reps


@contextlib.contextmanager
def trace(path: str = "/tmp/jax-trace"):
    """XLA profiler trace: `with trace('/tmp/t'): run()` then inspect in
    TensorBoard (`tensorboard --logdir /tmp/t`) or Perfetto."""
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


def amp_iteration_flops(L: int, M: int, n: int) -> int:
    """FLOPs of one AMP iteration through the factored Hadamard design:
    two FWHTs of length w (2 * w*log2(w) mults via the Kronecker matmuls,
    counted as dense factor matmuls) plus the O(L*M) denoiser."""
    w = 1 << (max(n + 1, L * M + 1) - 1).bit_length()
    log_w = w.bit_length() - 1
    # Kronecker chain: for factors f_i, cost = sum_i w * f_i MACs
    from ..ops.wht import _factorize
    factors = _factorize(log_w)
    fwht = 2 * w * sum(factors)  # MACs*2
    return 2 * fwht + 10 * L * M


def bp_iteration_flops(E: int, z: int, dc_max: int, Mp: int) -> int:
    """Elementwise-op count of one BP iteration in the z-structured layout
    (variable sums + 3*(dc-2) Lxor evaluations per check row)."""
    var_ops = 4 * E * z
    lxor_ops = 12  # min/sign/two log1p-exp per Lxor
    chk_ops = Mp * z * 3 * dc_max * lxor_ops
    return var_ops + chk_ops
