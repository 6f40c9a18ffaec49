"""Error-rate metrics (vectorized forms of sparc_public/sparc_sim.py:62-175
and sparc_sophie/sparc_new.py:1380-1388)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def bit_error_rate(bits_in: jnp.ndarray, bits_out: jnp.ndarray) -> jnp.ndarray:
    """Fraction of differing bits (calc_ber, sparc_public/sparc_sim.py:62-70)."""
    assert bits_in.shape == bits_out.shape
    return jnp.mean(bits_in.astype(jnp.int32) != bits_out.astype(jnp.int32),
                    axis=-1)


def section_errors(beta0: jnp.ndarray, beta: jnp.ndarray, L: int):
    """Per-section error indicators and section error rate
    (calc_ser, sparc_public/sparc_sim.py:72-98)."""
    M = beta0.shape[-1] // L
    b0 = beta0.reshape(beta0.shape[:-1] + (L, M))
    b = beta.reshape(beta.shape[:-1] + (L, M))
    err = jnp.any(b0 != b, axis=-1)
    return err, jnp.mean(err, axis=-1)


def location_value_errors(beta0: jnp.ndarray, beta: jnp.ndarray, L: int):
    """Location / value / section error rates for modulated SPARCs
    (calc_ler_ver, sparc_public/sparc_sim.py:100-175).

    Returns (ler, ver, ser) plus the per-section error indicator arrays.
    """
    M = beta0.shape[-1] // L
    b0 = beta0.reshape(beta0.shape[:-1] + (L, M))
    b = beta.reshape(beta.shape[:-1] + (L, M))
    i0 = jnp.argmax(jnp.abs(b0), axis=-1)
    i1 = jnp.argmax(jnp.abs(b), axis=-1)
    v0 = jnp.take_along_axis(b0, i0[..., None], axis=-1)[..., 0]
    v1 = jnp.take_along_axis(b, i1[..., None], axis=-1)[..., 0]
    loc_err = i0 != i1
    val_err = v0 != v1
    sec_err = jnp.logical_or(loc_err, val_err)
    rates = (jnp.mean(loc_err, axis=-1), jnp.mean(val_err, axis=-1),
             jnp.mean(sec_err, axis=-1))
    return rates, (loc_err, val_err, sec_err)
