"""Section-wise Bayes-MMSE and MAP denoisers for SPARC AMP.

float32-safe, log-domain redesign of the reference denoisers:

  * `msg_vector_mmse_estimator` (sparc_public/sparc.py:402-465) worked around
    float64 overflow with subtract-max + np.float128; here the posterior is a
    per-section softmax (log-sum-exp), which is exactly the same math and
    overflow-free in float32 — this also eliminates the L3 overflow
    "termination" pathway (sparc_sophie/sparc_new.py:1068-1097).
  * `msg_vector_map_estimator` (sparc_public/sparc.py:467-512): the K=2/K=4
    special cases there are algebraically identical to the general
    argmax_{m,k} Re(s_m conj(c_k)) rule, so we implement only the general
    rule (one fused code path on the VPU).

All functions are unit-amplitude: they estimate the indicator/PSK message
vector beta0 with nonzero values on the K-PSK constellation. Codecs that
carry an amplitude (the L3 convention sqrt(n*P/L)) scale outside.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.bits import psk_constel


def _section_logits(s: jnp.ndarray, inv_tau: jnp.ndarray, M: int,
                    K: int) -> jnp.ndarray:
    """Per-section posterior logits.

    s       : (..., L*M) effective observation (real, or complex for K>=4)
    inv_tau : broadcastable to (..., L*M); 1/tau with tau the effective noise
              variance. For complex s the likelihood uses 2/tau (the
              reference's `tau /= 2`, sparc_public/sparc.py:417-418) — the
              caller passes inv_tau = 1/tau and we apply the factor here.

    Returns logits of shape (..., L, M) for K == 1, else (..., L, M, K).
    """
    L = s.shape[-1] // M
    sec = s.reshape(s.shape[:-1] + (L, M))
    it = jnp.broadcast_to(inv_tau, s.shape).reshape(sec.shape)
    if K == 1:
        return jnp.real(sec) * it
    c = jnp.asarray(psk_constel(K))
    factor = 2.0 if jnp.iscomplexobj(sec) else 1.0
    return jnp.real(sec[..., None] * jnp.conj(c)) * (factor * it[..., None])


def mmse_denoise(s: jnp.ndarray, inv_tau: jnp.ndarray, M: int, K: int = 1,
                 return_probs: bool = False):
    """Posterior-mean estimate E[beta0 | beta0 + tau*N = s].

    Returns beta (..., L*M); if return_probs, also the per-section posterior
    over nonzero positions, shape (..., L, M) (position marginals for
    modulated codes).
    """
    logits = _section_logits(s, inv_tau, M, K)
    if K == 1:
        p = jax.nn.softmax(logits, axis=-1)          # (..., L, M)
        beta = p.reshape(s.shape)
        pos = p
    else:
        shp = logits.shape
        flat = logits.reshape(shp[:-2] + (M * K,))
        p = jax.nn.softmax(flat, axis=-1).reshape(shp)   # (..., L, M, K)
        c = jnp.asarray(psk_constel(K))
        beta = jnp.sum(p * c, axis=-1).reshape(s.shape)
        pos = jnp.sum(p, axis=-1)
    if return_probs:
        return beta, pos
    return beta


def map_estimate(s: jnp.ndarray, M: int, K: int = 1) -> jnp.ndarray:
    """Hard-decision (MAP) estimate: per section, the (position, value) pair
    maximizing Re(s conj(c)) — generalizes sparc_public/sparc.py:467-512."""
    logits = _section_logits(s, jnp.ones((), jnp.float32), M, K)
    L = s.shape[-1] // M
    if K == 1:
        idx = jnp.argmax(logits, axis=-1)  # (..., L)
        beta = jax.nn.one_hot(idx, M, dtype=jnp.float32)
        return beta.reshape(s.shape[:-1] + (L * M,))
    shp = logits.shape
    flat = logits.reshape(shp[:-2] + (M * K,))
    mk = jnp.argmax(flat, axis=-1)
    m_idx, k_idx = mk // K, mk % K
    c = jnp.asarray(psk_constel(K))
    onehot = jax.nn.one_hot(m_idx, M, dtype=jnp.float32)
    vals = c[k_idx]
    beta = onehot * vals[..., None]
    return beta.reshape(s.shape[:-1] + (L * M,))
