"""Pallas TPU kernel for LDPC belief propagation.

The entire decode runs in ONE kernel invocation per batch tile: channel
LLRs stream HBM -> VMEM once, the (edges, z, batch) message array lives in
VMEM scratch across ALL iterations (a full 802.11n graph is ~1-3 MB), and
the a-posteriori LLRs stream back once — zero per-iteration HBM round trips,
unlike the XLA scan in ops/bp.py whose carry crosses HBM every iteration.

Structure exploited (same layout as ops/bp.py): the protograph is static,
so the kernel is fully unrolled over its ~80-90 edges —

  * variable update: per protograph column, a sum of that column's rolled
    edge messages plus the channel block; extrinsic by subtraction.
    Check<->variable alignment is `pltpu.roll` with the edge's STATIC
    cyclic shift (no gathers at all).
  * check update: per protograph row, the forward-backward pairwise LLR-XOR
    trellis (c_ldpc.c:294-314) unrolled over the row's static edge list.
  * early exit: per-lane (per-codeword) done mask; finished codewords
    freeze, the iteration loop is a `fori_loop` to max_iters.

Batch layout matches ops/bp.py `_decode_lanes`: codewords on the 128-wide
lane axis, z on sublanes. Tile = 128 codewords per grid step.

Oracle relationships: bit-exact (up to f32) with ops/bp.py `_decode_lanes`,
which is itself decision/iteration-exact vs the C++ float64 oracle
(native/bp_ref.cpp) — the validation chain required by SURVEY.md section 4.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bp import TannerGraph, BpResult, _BIG


LANE_TILE = 128


def _lxor(a, b, correction: bool):
    sgn = jnp.sign(a) * jnp.sign(b)
    sgn = jnp.where(sgn == 0.0, 1.0, sgn)
    out = sgn * jnp.minimum(jnp.abs(a), jnp.abs(b))
    if correction:
        out = out + jnp.log1p(jnp.exp(-jnp.abs(a + b)))
        out = out - jnp.log1p(jnp.exp(-jnp.abs(a - b)))
    return out


def _make_kernel(g: TannerGraph, max_iters: int, correction: bool,
                 corr_factor: float, bt: int):
    z, E, Mp, Np = g.z, g.E, g.Mp, g.Np
    edge_row = [int(r) for r in g.edge_row]
    edge_col = [int(c) for c in g.edge_col]
    shifts = [int(s) for s in g.edge_shift]
    # static edge lists per check row
    row_edges = [[e for e in range(E) if edge_row[e] == i] for i in range(Mp)]
    col_edges = [[e for e in range(E) if edge_col[e] == j] for j in range(Np)]

    def kernel(ch_ref, app_ref, it_ref, msg_ref, done_ref):
        """ch_ref: (Np, z, bt) VMEM; app_ref: (Np, z, bt); it_ref: (1, bt)
        int32; msg_ref: (E, z, bt) VMEM scratch; done_ref: (1, bt) float32
        scratch (1.0 = frozen).

        msg_ref is reused IN PLACE between the two half-iterations: it holds
        check-aligned c2v messages entering the variable update and
        check-aligned v2c messages entering the check update (each edge
        belongs to exactly one column and one row, so each phase reads an
        edge's slot before overwriting it). This keeps peak VMEM at one
        (E, z, bt) buffer plus per-column/per-row temporaries — the
        all-edges-materialized form needs ~3x that and overflows VMEM at the
        reference concat scale z=150. Frozen (done) lanes always keep c2v."""
        msg_ref[...] = jnp.zeros((E, z, bt), jnp.float32)
        done_ref[...] = jnp.zeros((1, bt), jnp.float32)
        it_ref[...] = jnp.zeros((1, bt), jnp.int32)
        app_ref[...] = ch_ref[...]

        def body(carry):
            t, _ = carry
            done = done_ref[0]                      # (bt,)
            live = 1.0 - done

            # ---- variable nodes (one protograph column at a time) ----
            for j in range(Np):
                # var-aligned incoming c2v: roll each edge's check-aligned
                # block by its static shift (m_var[v] = m_chk[(v - s) mod z])
                vals = [pltpu.roll(msg_ref[e], shifts[e], axis=0)
                        for e in col_edges[j]]
                tot = ch_ref[j]
                for v in vals:
                    tot = tot + v
                # update app only for live lanes
                app_ref[j] = app_ref[j] * done + tot * live
                for e, v in zip(col_edges[j], vals):
                    # extrinsic v2c, re-aligned to check order (pltpu.roll
                    # needs a non-negative shift: -s mod z)
                    v2c = pltpu.roll(tot - v, (z - shifts[e]) % z, axis=0)
                    msg_ref[e] = msg_ref[e] * done + v2c * live

            # ---- check nodes (forward-backward trellis) ----
            all_ok = jnp.ones((bt,), jnp.float32)
            for i in range(Mp):
                es = row_edges[i]
                d = len(es)
                msgs = [msg_ref[e][...] for e in es]
                fwd = [msgs[0]]
                bwd = [None] * d
                bwd[d - 1] = msgs[d - 1]
                for k in range(1, d):
                    fwd.append(_lxor(fwd[k - 1], msgs[k], correction))
                    bwd[d - 1 - k] = _lxor(bwd[d - k], msgs[d - 1 - k],
                                           correction)
                aggr = bwd[0]                       # (z, bt)
                row_ok = jnp.min(jnp.sign(aggr), axis=0)  # 1 iff all > 0
                all_ok = jnp.minimum(all_ok, row_ok)
                for k in range(d):
                    if d == 1:
                        ext = jnp.full((z, bt), _BIG, jnp.float32)
                    elif k == 0:
                        ext = bwd[1]
                    elif k == d - 1:
                        ext = fwd[d - 2]
                    else:
                        ext = _lxor(fwd[k - 1], bwd[k + 1], correction)
                    if not correction:
                        ext = ext * corr_factor
                    e = es[k]
                    msg_ref[e] = msg_ref[e] * done + ext * live

            parity_ok = jnp.maximum(all_ok, 0.0)    # (bt,) 1.0 if satisfied
            newly = (1.0 - done) * (1.0 - parity_ok)
            it_ref[...] = it_ref[...] + newly[None, :].astype(jnp.int32)
            new_done = jnp.maximum(done, parity_ok)
            done_ref[...] = new_done[None, :]
            return t + 1, jnp.min(new_done) >= 1.0

        # true early exit: stop as soon as every codeword in the tile has
        # satisfied parity (the C kernel's break, c_ldpc.c:104-106) — real
        # decodes converge in ~10-20 of max_iters=200 iterations
        jax.lax.while_loop(
            lambda c: jnp.logical_and(c[0] < max_iters,
                                      jnp.logical_not(c[1])),
            body, (jnp.int32(0), jnp.asarray(False)))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("g", "max_iters", "correction",
                                    "corr_factor", "interpret"))
def _pallas_decode(ch, g, max_iters, correction, corr_factor,
                   interpret=False):
    """ch: (B, Nv) float32, B a multiple of LANE_TILE."""
    B = ch.shape[0]
    z, Np, E = g.z, g.Np, g.E
    bt = LANE_TILE
    kernel = _make_kernel(g, max_iters, correction, corr_factor, bt)
    chT = jnp.moveaxis(ch.reshape(B, Np, z), 0, -1)     # (Np, z, B)

    app, it = pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[pl.BlockSpec((Np, z, bt), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((Np, z, bt), lambda b: (0, 0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, bt), lambda b: (0, b),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((Np, z, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((E, z, bt), jnp.float32),
                        pltpu.VMEM((1, bt), jnp.float32)],
        interpret=interpret,
    )(chT)
    return BpResult(app=jnp.moveaxis(app, -1, 0).reshape(B, Np * z),
                    iterations=it[0])


def bp_decode_pallas(ch: jnp.ndarray, graph: TannerGraph,
                     max_iters: int = 200, method: str = "sumprod",
                     corr_factor: float = 0.7,
                     interpret: bool = False) -> BpResult:
    """Pallas BP decode. ch: (B, Nv); B is padded up to a LANE_TILE multiple
    internally. Set interpret=True on CPU (tests)."""
    assert method in ("sumprod", "sumprod2", "minsum")
    correction = method != "minsum"
    squeeze = ch.ndim == 1
    if squeeze:
        ch = ch[None, :]
    B = ch.shape[0]
    pad = (-B) % LANE_TILE
    if pad:
        # pad lanes must satisfy parity immediately or the whole-tile
        # early-exit never fires (sign(0) = 0 keeps row_ok at 0 and the
        # loop runs all max_iters): +_BIG LLRs = a confident all-zeros
        # codeword, done after one iteration
        ch = jnp.pad(ch, ((0, pad), (0, 0)), constant_values=_BIG)
    res = _pallas_decode(ch.astype(jnp.float32), graph, max_iters,
                         correction, float(corr_factor), interpret)
    app, it = res.app[:B], res.iterations[:B]
    if squeeze:
        app, it = app[0], it[0]
    return BpResult(app=app, iterations=it)
