"""Seeded subsampled-Hadamard SPARC design operator.

This is the single design-matrix engine behind every codec in the framework,
replacing BOTH of the reference's engines:

  * the seeded subsampled DCT/FFT closures of sparc_public
    (`sub_dct` / `sub_fft` / `sparc_transforms`, sparc_public/sparc.py:593-880)
  * the dense n x LM Gaussian matrix of sparc_sophie
    (`create_design_matrix`, sparc_sophie/sparc_new.py:1284-1294)

The operator implements A (n x L*M) in blockwise form: the base matrix W
(always unified to 2-D, (Lr, Lc)) partitions A into Lr*Lc blocks of shape
(Mr, Mc); each nonzero block (r, c) is sqrt(W[r,c]/L) * H_w[order0, order1]
for a shared Sylvester-Hadamard H_w and per-block random row/column index
sets drawn from [1, w) (the all-ones row/column 0 is excluded, mirroring
`generate_ordering`, sparc_public/sparc.py:735-775).

All three Hadamard / DCT / Gaussian ensembles are statistically
interchangeable for AMP at these block lengths; BER parity with the
reference is asserted distributionally, not bit-exactly (SURVEY.md section 7).

TPU mapping: forward/adjoint products are scatter -> batched FWHT (MXU
matmuls, see ops/wht.py) -> gather -> segment-sum, all static-shaped and
fused by XLA. The nonzero-block list is flattened at build time so the
spatially-coupled band structure costs exactly its nonzero blocks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .wht import fwht
from ..config import SparcParams, create_base_matrix


def _next_pow2_at_least(x: int) -> int:
    return 1 << (x - 1).bit_length()


def generate_orderings(W: np.ndarray, Mr: int, Mc: int, w: int,
                       seed) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Draw per-nonzero-block random row/column index sets from [1, w).

    Matches the traversal semantics of `generate_ordering`
    (sparc_public/sparc.py:735-775): blocks are visited row-major and each
    nonzero block consumes two shuffles from one seeded stream, so different
    blocks get independent orderings.

    Returns (rows, cols, order0, order1):
      rows, cols : (E,) block coordinates of the E nonzero blocks
      order0     : (E, Mr) row indices into H_w
      order1     : (E, Mc) column indices into H_w
    """
    rng = np.random.default_rng(seed)
    Lr, Lc = W.shape
    rows, cols, o0, o1 = [], [], [], []
    base = np.arange(1, w, dtype=np.int32)
    for r in range(Lr):
        for c in range(Lc):
            if W[r, c] != 0:
                rows.append(r)
                cols.append(c)
                o0.append(rng.permutation(base)[:Mr])
                o1.append(rng.permutation(base)[:Mc])
    return (np.array(rows, dtype=np.int32), np.array(cols, dtype=np.int32),
            np.stack(o0), np.stack(o1))


@jax.tree_util.register_pytree_node_class
@dataclass
class SparcDesign:
    """Blockwise subsampled-Hadamard design operator.

    Array leaves (jit/vmap-traceable):
      order0 : (E, Mr) int32   per-block Hadamard row indices
      order1 : (E, Mc) int32   per-block Hadamard column indices
      scale  : (E,)    float32 per-block sqrt(W[r,c]/L)
    Static metadata:
      rows/cols : nonzero-block coordinates; shapes Lr, Lc, Mr, Mc, w, n, LM.
    """

    order0: jnp.ndarray
    order1: jnp.ndarray
    scale: jnp.ndarray
    rows: tuple
    cols: tuple
    Lr: int
    Lc: int
    Mr: int
    Mc: int
    w: int
    n: int
    LM: int

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return ((self.order0, self.order1, self.scale),
                (self.rows, self.cols, self.Lr, self.Lc, self.Mr, self.Mc,
                 self.w, self.n, self.LM))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    # -- construction -------------------------------------------------------
    @classmethod
    def build(cls, W: np.ndarray, L: int, M: int, n: int, seed) -> "SparcDesign":
        """Build the operator for base matrix W (2-D (Lr, Lc)).

        Shapes follow sparc_public/sparc.py:777-837: Mr = n/Lr rows and
        Mc = L*M/Lc columns per block, transform size w = next power of two
        with room to skip index 0.
        """
        W = np.atleast_2d(np.asarray(W, dtype=np.float64))
        Lr, Lc = W.shape
        assert n % Lr == 0, "Lr must divide n"
        assert (L * M) % Lc == 0, "Lc must divide L*M"
        Mr, Mc = n // Lr, (L * M) // Lc
        w = _next_pow2_at_least(max(Mr + 1, Mc + 1))
        rows, cols, o0, o1 = generate_orderings(W, Mr, Mc, w, seed)
        scale = np.sqrt(W[rows, cols] / L).astype(np.float32)
        return cls(jnp.asarray(o0), jnp.asarray(o1), jnp.asarray(scale),
                   tuple(int(r) for r in rows), tuple(int(c) for c in cols),
                   Lr, Lc, Mr, Mc, w, n, L * M)

    @classmethod
    def for_params(cls, params: SparcParams, awgn_var: float, seed) -> "SparcDesign":
        W = create_base_matrix(params, awgn_var)
        return cls.build(W, params.L, params.M, params.codeword_length(), seed)

    # -- products -----------------------------------------------------------
    @property
    def E(self) -> int:
        return len(self.rows)

    def _block_transform(self, vals: jnp.ndarray, order_in: jnp.ndarray,
                         order_out: jnp.ndarray) -> jnp.ndarray:
        """Core per-block product: scatter vals into w-space at order_in,
        FWHT, gather at order_out, scale. vals: (E, m_in) -> (E, m_out)."""
        E = self.E
        X = jnp.zeros((E, self.w), dtype=vals.dtype)
        X = X.at[jnp.arange(E)[:, None], order_in].set(vals)
        Y = fwht(X)
        out = jnp.take_along_axis(Y, order_out, axis=1)
        return out * self.scale[:, None].astype(out.dtype)

    def ab(self, beta: jnp.ndarray) -> jnp.ndarray:
        """A @ beta. beta: (..., L*M) -> (..., n).

        Blockwise: out_row_block[r] = sum_c sqrt(W[r,c]/L) *
        H[order0_rc][:, order1_rc] @ beta_col_block[c]
        (forward product of sparc_public/sparc.py:851-862).
        """
        if beta.ndim > 1:
            return jax.vmap(self.ab)(beta)
        xb = beta.reshape(self.Lc, self.Mc)
        vals = xb[jnp.asarray(self.cols)]  # (E, Mc)
        parts = self._block_transform(vals, self.order1, self.order0)  # (E, Mr)
        out = jax.ops.segment_sum(parts, jnp.asarray(self.rows),
                                  num_segments=self.Lr)
        return out.reshape(self.n)

    def az(self, z: jnp.ndarray) -> jnp.ndarray:
        """A.T @ z. z: (..., n) -> (..., L*M).

        H is symmetric so the adjoint is the same kernel with row/column
        orders swapped (adjoint product of sparc_public/sparc.py:864-875).
        """
        if z.ndim > 1:
            return jax.vmap(self.az)(z)
        zb = z.reshape(self.Lr, self.Mr)
        vals = zb[jnp.asarray(self.rows)]  # (E, Mr)
        parts = self._block_transform(vals, self.order0, self.order1)  # (E, Mc)
        out = jax.ops.segment_sum(parts, jnp.asarray(self.cols),
                                  num_segments=self.Lc)
        return out.reshape(self.LM)

    # -- test utilities -----------------------------------------------------
    def dense(self) -> np.ndarray:
        """Materialize A as a dense (n, L*M) numpy array. Tests only."""
        eye = jnp.eye(self.LM, dtype=jnp.float32)
        return np.asarray(jax.vmap(self.ab)(eye)).T


def build_batched_designs(W: np.ndarray, L: int, M: int, n: int, seed,
                          batch: int) -> SparcDesign:
    """A batch of independent designs (fresh A per Monte-Carlo trial, as the
    reference draws a new seeded transform per trial). The returned design's
    order0/order1 carry a leading batch axis; use with `jax.vmap` over the
    array leaves."""
    designs = [SparcDesign.build(W, L, M, n, (seed, b)) for b in range(batch)]
    d0 = designs[0]
    order0 = jnp.stack([d.order0 for d in designs])
    order1 = jnp.stack([d.order1 for d in designs])
    return SparcDesign(order0, order1, d0.scale, d0.rows, d0.cols,
                       d0.Lr, d0.Lc, d0.Mr, d0.Mc, d0.w, d0.n, d0.LM)
