"""Vectorized bit / message-vector / PSK codecs.

Replaces the per-section Python loops of the reference bit codec
(`bin_arr_2_msg_vector` / `msg_vector_2_bin_arr`, sparc_public/sparc.py:330-400,
and the amplitude-carrying L3 variants, sparc_sophie/sparc_new.py:1298-1341)
with reshapes, one-hots and bit-arithmetic that XLA vectorizes onto the VPU.

Conventions (identical to the reference):
  * bits within a section index are MSB-first (`bin_arr_2_int` uses
    1 << arange(k)[::-1], sparc_public/sparc.py:182-189)
  * the message vector has exactly one nonzero per M-entry section
  * modulated SPARCs carry log2(K) extra Gray-coded PSK value bits per section
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# bits <-> integers (sectionwise, MSB first)
# --------------------------------------------------------------------------

def bits_to_ints(bits: jnp.ndarray, width: int) -> jnp.ndarray:
    """(..., width) {0,1} -> (...,) integer, MSB first."""
    weights = jnp.asarray(1 << np.arange(width)[::-1], dtype=jnp.int32)
    return jnp.asarray(bits, jnp.int32) @ weights


def ints_to_bits(idx: jnp.ndarray, width: int) -> jnp.ndarray:
    """(...,) integer -> (..., width) {0,1}, MSB first."""
    shifts = jnp.asarray(np.arange(width)[::-1], dtype=jnp.int32)
    return (idx[..., None] >> shifts) & 1


# --------------------------------------------------------------------------
# Gray code and PSK constellations
# --------------------------------------------------------------------------

def bin2gray(num: np.ndarray) -> np.ndarray:
    return num ^ (num >> 1)


def gray2bin(num: np.ndarray) -> np.ndarray:
    num = np.array(num, copy=True)
    mask = num >> 1
    while np.any(mask != 0):
        num = num ^ mask
        mask = mask >> 1
    return num


def psk_constel(K: int) -> np.ndarray:
    """K-PSK constellation (sparc_public/sparc.py:225-239).

    K=2 is real {1,-1}; K>=4 is complex unit-circle, with the K=4 points on
    the axes exactly.
    """
    if K == 1:
        return np.array([1.0])
    if K == 2:
        return np.array([1.0, -1.0])
    if K == 4:
        return np.array([1 + 0j, 0 + 1j, -1 + 0j, 0 - 1j])
    theta = 2 * np.pi * np.arange(K) / K
    return np.cos(theta) + 1j * np.sin(theta)


def psk_mod_table(K: int) -> np.ndarray:
    """Lookup table: value-bits integer b -> constellation symbol c[gray2bin(b)].

    Precomputed host-side so modulation is a single gather
    (replaces the per-symbol loop at sparc_public/sparc.py:241-269).
    """
    c = psk_constel(K)
    b = np.arange(K)
    return c[gray2bin(b)]


def psk_demod_table(K: int) -> np.ndarray:
    """Lookup table: constellation index k -> value-bits integer bin2gray(k)."""
    return bin2gray(np.arange(K))


# --------------------------------------------------------------------------
# bits <-> message vector
# --------------------------------------------------------------------------

def bits_to_msg_vector(bits: jnp.ndarray, M: int, K: int = 1,
                       amplitude=1.0) -> jnp.ndarray:
    """Binary array -> SPARC message vector with one nonzero per section.

    bits: (L * sec_size,) with sec_size = log2(M) + log2(K); each section's
    first log2(M) bits pick the nonzero location, the remaining log2(K) bits
    Gray-select the K-PSK value. Vectorized form of
    sparc_public/sparc.py:330-364.

    amplitude: value of the nonzero entry (1 for the L2 convention;
    sqrt(n*P/L) for the L3 convention, sparc_sophie/sparc_new.py:1298-1317).

    Returns (L*M,) float (K<=2) or complex (K>=4).
    """
    logM = M.bit_length() - 1
    logK = K.bit_length() - 1
    sec_size = logM + logK
    assert bits.size % sec_size == 0
    L = bits.size // sec_size
    secs = bits.reshape(L, sec_size)
    idx = bits_to_ints(secs[:, :logM], logM)  # (L,)
    if K == 1:
        vals = jnp.full((L,), amplitude, dtype=jnp.float32)
    else:
        table = jnp.asarray(psk_mod_table(K))
        vbits = bits_to_ints(secs[:, logM:], logK)
        vals = table[vbits] * amplitude
    onehot = jax.nn.one_hot(idx, M, dtype=vals.dtype)
    return (onehot * vals[:, None]).reshape(L * M)


def msg_vector_to_bits(msg_vector: jnp.ndarray, M: int, K: int = 1) -> jnp.ndarray:
    """SPARC message vector -> binary array (inverse of `bits_to_msg_vector`).

    Vectorized form of sparc_public/sparc.py:366-400. The nonzero location is
    recovered by |.|-argmax per section (exact for valid message vectors), the
    value bits by nearest-constellation-point then Gray encoding.
    """
    logM = M.bit_length() - 1
    logK = K.bit_length() - 1
    assert msg_vector.size % M == 0
    L = msg_vector.size // M
    secs = msg_vector.reshape(L, M)
    idx = jnp.argmax(jnp.abs(secs), axis=1)  # (L,)
    loc_bits = ints_to_bits(idx, logM)  # (L, logM)
    if K == 1:
        return loc_bits.reshape(L * logM).astype(jnp.bool_)
    c = jnp.asarray(psk_constel(K))
    vals = jnp.take_along_axis(secs, idx[:, None], axis=1)[:, 0]
    # nearest constellation point (values may carry an amplitude factor)
    norm = jnp.abs(vals)[:, None]
    k = jnp.argmax(jnp.real(vals[:, None] * jnp.conj(c[None, :]))
                   / jnp.maximum(norm, 1e-30), axis=1)
    demod = jnp.asarray(psk_demod_table(K))
    val_bits = ints_to_bits(demod[k], logK)
    bits = jnp.concatenate([loc_bits, val_bits], axis=1)
    return bits.reshape(L * (logM + logK)).astype(jnp.bool_)


def random_bits(key: jax.Array, length: int) -> jnp.ndarray:
    """Uniform random bits (replaces `rnd_bin_arr`, sparc_public/sparc.py:174-180)."""
    return jax.random.bernoulli(key, 0.5, (length,))


def random_msg_vector(key: jax.Array, L: int, M: int, K: int = 1) -> jnp.ndarray:
    """Random valid message vector (sparc_public/sparc.py:303-328)."""
    kb = jax.random.split(key, 1)[0]
    logM = M.bit_length() - 1
    logK = K.bit_length() - 1
    bits = random_bits(kb, L * (logM + logK))
    return bits_to_msg_vector(bits, M, K)
