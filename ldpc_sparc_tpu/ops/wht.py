"""Fast Walsh-Hadamard transform, MXU-factored.

The SPARC design matrix is a seeded row/column-subsampled Hadamard operator
(the design documented at sparc_public/sparc.py:703-728; the reference's
actual implementation substitutes scipy DCT/FFT, sparc_public/sparc.py:593-701
— statistically equivalent ensembles for AMP).

TPU-first design: instead of the O(w log w) butterfly (scalar-loop shaped,
hostile to the MXU), we use the Kronecker factorization

    H_w = H_a  (x)  H_b  (x)  ...   =>   FWHT = a chain of dense matmuls

with factors of at most 2^10, so a w=2^20 transform is two 1024x1024 matmuls
per batch row — exactly the shape the 128x128 systolic array wants. XLA fuses
the surrounding scatter/gather/scale elementwise ops into the matmul kernels.

All Hadamard factor matrices are Sylvester-ordered, symmetric, entries +-1.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Largest Kronecker factor: 2^10 x 2^10 dense matmul tiles well on the MXU
# while keeping the factor matrix (4 MB fp32) comfortably in VMEM.
_MAX_LOG_FACTOR = 7


@functools.lru_cache(maxsize=None)
def _hadamard_np(n: int) -> np.ndarray:
    """Sylvester-ordered n x n Hadamard matrix (n a power of two)."""
    assert n > 0 and (n & (n - 1)) == 0
    H = np.array([[1.0]], dtype=np.float32)
    while H.shape[0] < n:
        H = np.block([[H, H], [H, -H]])
    return H


def hadamard_factor(n: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_hadamard_np(n), dtype=dtype)


def _factorize(log_w: int) -> list[int]:
    """Split log2(w) into near-equal chunks of at most _MAX_LOG_FACTOR."""
    if log_w == 0:
        return [1]
    k = -(-log_w // _MAX_LOG_FACTOR)  # ceil
    base, rem = divmod(log_w, k)
    logs = [base + (1 if i < rem else 0) for i in range(k)]
    return [1 << g for g in logs]


def fwht(x: jnp.ndarray) -> jnp.ndarray:
    """Walsh-Hadamard transform along the last axis (unnormalized, H H = w I).

    x: (..., w) with w a power of two. Complex inputs are handled by
    transforming real and imaginary parts (H is real), keeping the matmuls
    on the real MXU path.
    """
    w = x.shape[-1]
    assert w > 0 and (w & (w - 1)) == 0, "FWHT length must be a power of two"
    if jnp.iscomplexobj(x):
        return jax.lax.complex(fwht(jnp.real(x)), fwht(jnp.imag(x)))

    log_w = w.bit_length() - 1
    factors = _factorize(log_w)
    batch = x.shape[:-1]
    y = x.reshape(batch + tuple(factors))
    nb = len(batch)
    for i, f in enumerate(factors):
        H = hadamard_factor(f, y.dtype)
        axis = nb + i
        # contract factor axis with H (symmetric), put result back in place
        y = jnp.moveaxis(
            jnp.tensordot(y, H, axes=[[axis], [0]]), -1, axis)
    return y.reshape(batch + (w,))


def fwht_matrix_row(w: int, r: int) -> np.ndarray:
    """Row r of the Sylvester Hadamard H_w without materializing H_w.

    H_w[r, c] = (-1)^{popcount(r & c)} — used by tests and by dense-oracle
    checks of the subsampled design operator.
    """
    c = np.arange(w, dtype=np.uint64)
    bits = np.bitwise_count(np.bitwise_and(np.uint64(r), c)) \
        if hasattr(np, "bitwise_count") else None
    if bits is None:
        v = np.bitwise_and(np.uint64(r), c)
        bits = np.zeros(w, dtype=np.int64)
        vv = v.astype(np.uint64)
        while np.any(vv):
            bits += (vv & 1).astype(np.int64)
            vv >>= np.uint64(1)
    return np.where(bits % 2 == 0, 1.0, -1.0)
