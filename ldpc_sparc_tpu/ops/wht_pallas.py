"""Fused Pallas SRHT block kernel — the north-star AMP design product.

One kernel per design block computes the full width-w Walsh-Hadamard
transform with the sign diagonal and block scale fused, keeping the whole
2^19-element state VMEM-resident:

    H_w = H_a (x) H_b   (Sylvester Kronecker)   =>
    FWHT(x)  =  H_a @ X @ H_b     with X the (a, b) row-major view of x

so the entire transform is TWO MXU matmuls on one VMEM block — no
per-stage HBM round trips and none of the moveaxis relayouts the XLA
Kronecker chain (ops/wht.py:fwht) pays between stages. The +-1 sign
diagonal (pre for the forward product, post for the adjoint) and the
sqrt(W/L)/L block scale ride along as VPU elementwise ops on the resident
block, so the only HBM traffic per transform is one read of x and one
write of y (plus the bf16 sign plane).

Matmuls run on the MXU in bfloat16 with float32 accumulation: Hadamard
entries are +-1 (exact in bf16) and the activation rounding (~2^-8
relative) sits ~40 dB under the AWGN operating noise — the same accuracy
budget as the XLA path's bfloat16 knob (ops/wht.py matmul_dtype), gated
end-to-end by the bench BER check. Pass LDPC_SPARC_FWHT_DTYPE=float32 to
keep full f32 matmuls.

Used automatically by ops/transforms.srht_apply for offset-0 (power-of-two
window) designs on TPU — the flagship L=1024, M=512 code — with the
random-subset gather/scatter of the SMALL side (~9k of 524k elements)
left to XLA around the kernel, where it costs a few tens of KB of HBM
traffic. Ref: sparc_public/sparc.py:883-999 (the AMP hot loop this
serves); BASELINE.json north_star.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wht import hadamard_factor

# Backend knobs (read at trace time; see also ops/wht.py set_fwht_options)
_FWHT_BACKEND = os.environ.get("LDPC_SPARC_FWHT_BACKEND", "auto")
_FWHT_PALLAS_DTYPE = os.environ.get("LDPC_SPARC_FWHT_DTYPE", "bfloat16")
# Kernel flavor: "ms" = multi-stage in-VMEM Kronecker chain (sublane-factor
# matmuls + one lane-axis matmul, VMEM-local axis rotations between stages —
# single HBM pass AND near-minimal FLOPs); "2mm" = the transpose-free
# two-sided H_a @ X @ H_b form (more FLOPs, kept for comparison/benchmarks).
_FWHT_PALLAS_MODE = os.environ.get("LDPC_SPARC_FWHT_MODE", "ms")

# Pallas path bounds: below 2^14 the XLA chain is already cheap (and tiny
# widths break the (8,128) tiling); above 2^20 the H_b factor alone
# outgrows a sensible VMEM budget.
_MIN_LOG_W = 14
_MAX_LOG_W = 20


def set_fwht_backend(backend: str | None = None, dtype: str | None = None,
                     mode: str | None = None):
    global _FWHT_BACKEND, _FWHT_PALLAS_DTYPE, _FWHT_PALLAS_MODE
    if backend is not None:
        assert backend in ("auto", "xla", "pallas")
        _FWHT_BACKEND = backend
    if dtype is not None:
        assert dtype in ("float32", "bfloat16")
        _FWHT_PALLAS_DTYPE = dtype
    if mode is not None:
        assert mode in ("ms", "2mm")
        _FWHT_PALLAS_MODE = mode


def use_pallas_srht(w: int, offset: int, window_is_w: bool,
                    is_complex: bool) -> bool:
    """Decide whether srht_apply should route through the fused kernel.

    `auto` resolves to the XLA chain: on the v5e the measured winner is
    the mlf=5 Kronecker chain. Both Pallas flavors lose on the full
    decode — the two-matmul form is MXU-bound (13x the FLOPs), and the
    single-pass multi-stage form is throttled by the ~240 GB/s achieved
    DMA-pipeline bandwidth plus the scatter/gather fusion forfeited at
    the kernel boundary (docs/ROOFLINE.md section 1,
    docs/artifacts/fwht_pallas_tpu_check.json keys "2mm"/"ms"). Set
    LDPC_SPARC_FWHT_BACKEND=pallas (or set_fwht_backend) to opt in on
    hardware where the tradeoff lands the other way.
    """
    if _FWHT_BACKEND != "pallas" or is_complex:
        return False
    return (offset == 0 and window_is_w
            and _MIN_LOG_W <= (w.bit_length() - 1) <= _MAX_LOG_W)


def _split_ab(w: int) -> tuple[int, int]:
    """w = a * b with a <= b, both powers of two (a=512, b=1024 at 2^19)."""
    log_w = w.bit_length() - 1
    a = 1 << (log_w // 2)
    return a, w // a


def _kernel(apply_pre: bool, mm: jnp.dtype):
    """y = Ha @ (x * signs?) @ Hb [* signs?], one (a, b) block."""

    def kernel(x_ref, ha_ref, hb_ref, signs_ref, o_ref):
        x = x_ref[0]
        s = signs_ref[0].astype(jnp.float32)
        if apply_pre:
            x = x * s
        t = jnp.dot(x.astype(mm), hb_ref[...],
                    preferred_element_type=jnp.float32)       # (a, b) = X @ Hb
        y = jnp.dot(ha_ref[...], t.astype(mm),
                    preferred_element_type=jnp.float32)       # Ha @ (X Hb)
        if not apply_pre:
            y = y * s
        o_ref[0] = y

    return kernel


def _sublane_factors(S: int, max_log: int = 7) -> tuple[int, ...]:
    """Factor S (power of two) into near-equal powers of two, each <= 2^max_log.

    Larger leading factors keep the MXU contraction dimension full (K=128);
    the tail factor absorbs the remainder."""
    log_s = S.bit_length() - 1
    if log_s == 0:
        return ()
    out = []
    while log_s > 0:
        g = min(max_log, log_s)
        out.append(1 << g)
        log_s -= g
    return tuple(out)


def _ms_kernel(apply_pre: bool, mm, S: int, factors: tuple[int, ...]):
    """Single-HBM-pass FWHT on the (S, 128) row-major view of a w-vector.

    H_w = H_f1 (x) ... (x) H_fk (x) H_128 (Sylvester big-endian index
    split), so the transform is k sublane-axis contractions plus one
    lane-axis matmul, all on the VMEM-resident block. Between sublane
    stages the contracted axis rotates to the back (a sublane-only
    permutation — the 128-lane minor axis never moves, so no lane-crossing
    relayout); after k rotations the axis order is restored.
    """

    def kernel(x_ref, signs_ref, *hs_and_out):
        *h_refs, o_ref = hs_and_out
        t = x_ref[0]                                   # (S, 128) f32
        if apply_pre:
            t = t * signs_ref[0].astype(jnp.float32)
        k = len(factors)
        shape = tuple(factors) + (128,)
        t = t.reshape(shape)
        for i, f in enumerate(factors):
            t2 = jnp.dot(h_refs[i][...], t.astype(mm).reshape(f, -1),
                         preferred_element_type=jnp.float32)
            t = t2.reshape((f,) + shape[1:])
            if k > 1:
                # rotate contracted axis to just before the lane axis
                t = t.transpose(tuple(range(1, k)) + (0, k))
                shape = shape[1:k] + (f, 128)
        t = t.reshape(S, 128)
        y = jnp.dot(t.astype(mm), h_refs[k][...],
                    preferred_element_type=jnp.float32)  # lane factor H_128
        if not apply_pre:
            y = y * signs_ref[0].astype(jnp.float32)
        o_ref[0] = y

    return kernel


def _fwht_signed_ms(x, signs, w, apply_pre, interpret):
    E = x.shape[0]
    S = w // 128
    factors = _sublane_factors(S)
    mm = jnp.bfloat16 if _FWHT_PALLAS_DTYPE == "bfloat16" else jnp.float32
    xv = x.reshape(E, S, 128).astype(jnp.float32)
    sv = signs.reshape(E, S, 128).astype(mm)         # +-1: exact in bf16
    hs = [hadamard_factor(f, mm) for f in factors] + [hadamard_factor(128, mm)]

    flops = 2 * w * (sum(factors) + 128) + 2 * w
    out = pl.pallas_call(
        _ms_kernel(apply_pre, mm, S, factors),
        grid=(E,),
        in_specs=[
            pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((f, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for f in tuple(factors) + (128,)
        ],
        out_specs=pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, S, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=E * flops,
            bytes_accessed=E * w * (4 + 4 + jnp.dtype(mm).itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xv, sv, *hs)
    return out.reshape(E, w).astype(x.dtype)


def _fwht_signed_2mm(x, signs, w, apply_pre, interpret):
    E = x.shape[0]
    a, b = _split_ab(w)
    mm = jnp.bfloat16 if _FWHT_PALLAS_DTYPE == "bfloat16" else jnp.float32
    xv = x.reshape(E, a, b).astype(jnp.float32)
    sv = signs.reshape(E, a, b).astype(mm)   # +-1: exact in bf16
    ha = hadamard_factor(a, mm)
    hb = hadamard_factor(b, mm)

    flops = 2 * (a * b * b + a * a * b) + 2 * a * b
    out = pl.pallas_call(
        _kernel(apply_pre, mm),
        grid=(E,),
        in_specs=[
            pl.BlockSpec((1, a, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, a), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, a, b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, a, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=E * flops,
            bytes_accessed=E * a * b * (4 + 4 + jnp.dtype(mm).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(xv, ha, hb, sv)
    return out.reshape(E, w).astype(x.dtype)


def fwht_signed(x: jnp.ndarray, signs: jnp.ndarray, w: int,
                apply_pre: bool, interpret: bool = False) -> jnp.ndarray:
    """Fused FWHT over the last axis of x: (E, w) -> (E, w).

    apply_pre=True : y[e] = FWHT(x[e] * signs[e])   (forward / window-in)
    apply_pre=False: y[e] = FWHT(x[e]) * signs[e]   (adjoint / window-out)

    signs: (E, w) +-1. The per-block sqrt(W/L) scale is NOT applied here —
    it commutes through the linear transform, so srht_apply applies it on
    the small (random-index) side where it costs O(small) instead of O(w).

    Dispatches on the kernel-flavor knob (set_fwht_backend mode): "ms" is
    the single-pass multi-stage kernel, "2mm" the two-sided form.
    Deliberately NOT jax.jit-wrapped: the mode/dtype knobs are trace-time
    globals, and a shape-keyed jit cache would silently reuse a stale
    flavor after set_fwht_backend. Callers trace it inside their own jit.
    """
    if resolved_fwht_mode(w) == "ms":
        return _fwht_signed_ms(x, signs, w, apply_pre, interpret)
    return _fwht_signed_2mm(x, signs, w, apply_pre, interpret)


def resolved_fwht_mode(w: int) -> str:
    """The kernel flavor fwht_signed will ACTUALLY dispatch for width w:
    mode='ms' requires w >= 1024 (the multi-stage kernel needs >= 8
    sublane factors of 128 lanes), below which it falls back to '2mm'.
    Benchmarks must record this, not the requested knob (advisor r3)."""
    return "ms" if (_FWHT_PALLAS_MODE == "ms" and w >= 128 * 8) else "2mm"
