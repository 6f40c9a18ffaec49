"""Counter-based PRNG plumbing.

Replaces the reference's ad-hoc `np.random.RandomState(seed)` re-seeding in
every function (e.g. sparc_public/sparc_sim.py:194, sparc_sophie/sparc_new.py:31)
with deterministic Threefry key derivation: one root key per experiment,
`fold_in` tags per (component, trial, snr). RNG parity with numpy bit streams
is explicitly distributional, not bit-exact (SURVEY.md section 7, hard parts).
"""

from __future__ import annotations

import jax


# Stable component tags for fold_in derivation.
BITS = 0xB1
DESIGN = 0xDE
CHANNEL = 0xC4
TRIAL = 0x7A


def _flatten(seed):
    if isinstance(seed, (tuple, list)):
        out = []
        for s in seed:
            out.extend(_flatten(s))
        return out
    return [int(seed)]


def root_key(seed) -> jax.Array:
    """Derive a root key from an int or an arbitrarily nested tuple of ints."""
    parts = _flatten(seed)
    key = jax.random.key(parts[0])
    for s in parts[1:]:
        key = jax.random.fold_in(key, s)
    return key


def derive(key: jax.Array, *tags: int) -> jax.Array:
    for t in tags:
        key = jax.random.fold_in(key, t)
    return key
