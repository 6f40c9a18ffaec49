"""Fused Pallas AMP denoiser step: s-update + softmax + section energy.

Why this kernel exists (measured, docs/ROOFLINE.md section 1): on hardware
the XLA log-domain softmax denoiser costs ~54 us/lane at the flagship
L=1024/M=512 config — as much as BOTH design transforms together — because
the softmax lowers to ~3 full passes over the 2 MB state plus a separate
broadcast multiply and a separate psi energy reduction. This kernel fuses
the whole tail of the AMP iteration (sparc_public/sparc.py:972-979):

    s        = beta + tau_sec * azo          (azo = A^T (z/phi))
    logits   = s / tau_sec
    beta_new = softmax(logits) per M-section  (Bayes-MMSE, K=1)
    sec_en   = sum(beta_new^2) per section    (the psi/NMSE statistic)

into ONE VMEM-resident pass: read beta + azo (+ the tiny (L,) per-section
tau), write s + beta_new (+ the tiny (L,) energies). The per-section
max/sum reductions run on the VPU over the (M/128, 128) section tiles
while the state stays in VMEM.

Scope: the real, unmodulated (K=1) denoiser with M a multiple of 128 —
the flagship/benchmark family. Everything else falls back to the XLA path
(ops/denoiser.py), which remains the reference implementation this kernel
is tested against (tests/test_denoiser_pallas.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# "auto"/"xla" resolve to the XLA path (measured faster on this platform —
# see use_fused_denoiser); "pallas" forces the fused kernel for eligible
# shapes (tests use interpret mode).
_DENOISER_BACKEND = os.environ.get("LDPC_SPARC_DENOISER_BACKEND", "auto")


def set_denoiser_backend(backend: str) -> None:
    global _DENOISER_BACKEND
    assert backend in ("auto", "xla", "pallas")
    _DENOISER_BACKEND = backend


def use_fused_denoiser(M: int, K: int, LM: int, is_complex: bool) -> bool:
    """Eligibility + backend gate, resolved at trace time.

    `auto` resolves to the XLA path: on the tunneled v5e the fused kernel
    measures 8 857 vs 11 494 iters/s on the flagship decode (BER 0.0 both)
    — the same ~240 GB/s achieved DMA-pipeline ceiling that sank the
    Pallas FWHT flavors outweighs the pass-count reduction
    (docs/ROOFLINE.md section 1b). Set LDPC_SPARC_DENOISER_BACKEND=pallas
    to opt in on hardware where kernel DMA runs at full HBM rate."""
    if _DENOISER_BACKEND != "pallas" or is_complex or K != 1:
        return False
    # upper bound: the kernel holds ~5 (L, M)-sized f32 blocks live in VMEM
    # (beta, azo, s, beta_new + softmax temporaries); past the 100 MB
    # vmem_limit it would fail to compile instead of falling back (advisor
    # r3) — mirror wht_pallas's _MAX_LOG_W style gate
    if 5 * 4 * LM > 100 * 1024 * 1024:
        return False
    return M % 128 == 0 and LM % M == 0 and LM >= 128 * 8


def _kernel(L: int, M: int):
    # All ops are 2-D (sections x M-lanes): per-section statistics are
    # lane-axis reductions and tau is a lane-broadcast — shapes Mosaic
    # lowers natively (no sublane<->lane shape casts).

    def kernel(beta_ref, azo_ref, tau_ref, s_ref, out_ref, en_ref):
        tau = tau_ref[0]                                   # (L, 1)
        beta = beta_ref[0]                                 # (L, M)
        azo = azo_ref[0]
        s = beta + tau * azo
        logits = s / tau
        m = jnp.max(logits, axis=1, keepdims=True)         # (L, 1)
        e = jnp.exp(logits - m)
        z = jnp.sum(e, axis=1, keepdims=True)
        p = e / z
        s_ref[0] = s
        out_ref[0] = p
        en_ref[0] = jnp.sum(p * p, axis=1, keepdims=True)  # (L, 1)

    return kernel


def fused_denoise_update(beta: jnp.ndarray, azo: jnp.ndarray,
                         tau_sec: jnp.ndarray, M: int,
                         interpret: bool = False):
    """One fused AMP tail step for a single codeword lane.

    beta, azo : (LM,) float32 — current estimate and A^T(z/phi)
    tau_sec   : (L,) float32 — effective noise variance per section
                (rep_c(tau) collapsed to one value per section)

    Returns (s, beta_new, sec_energy):
      s          : (LM,) = beta + tau_sec*azo (per-section broadcast)
      beta_new   : (LM,) = per-section softmax(s/tau_sec)
      sec_energy : (L,) = sum(beta_new^2) per section

    vmap over a batch of lanes adds the grid dimension.
    """
    LM = beta.shape[-1]
    L = LM // M
    bv = beta.reshape(1, L, M).astype(jnp.float32)
    av = azo.reshape(1, L, M).astype(jnp.float32)
    tv = tau_sec.reshape(1, L, 1).astype(jnp.float32)

    state_spec = pl.BlockSpec((1, L, M), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, L, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    s, out, en = pl.pallas_call(
        _kernel(L, M),
        grid=(1,),
        in_specs=[state_spec, state_spec, vec_spec],
        out_specs=[state_spec, state_spec, vec_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, L, M), jnp.float32),
            jax.ShapeDtypeStruct((1, L, M), jnp.float32),
            jax.ShapeDtypeStruct((1, L, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * LM, bytes_accessed=4 * LM * 4,
            transcendentals=LM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(bv, av, tv)
    return s.reshape(LM), out.reshape(LM), en.reshape(L)
