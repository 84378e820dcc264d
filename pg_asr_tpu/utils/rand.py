"""Training-time PRNG selection.

On TPU, threefry dropout-mask generation over (B,T,512)-sized activations
measured ~5 ms/step at the bench shape — a third of the whole train step.
The 'rbg' implementation maps to the hardware RNG instruction instead;
splits/folds on an rbg key stay rbg, so one call at driver startup switches
the whole step. CPU keeps threefry (rbg is TPU-native). Streams differ
between impls, which only reshuffles dropout/sampling noise.
"""

from __future__ import annotations

import jax


def training_rng(seed: int):
    """PRNG key for dropout / PG sampling, fastest impl for the backend."""
    if jax.default_backend() == "tpu":
        return jax.random.key(seed, impl="rbg")
    return jax.random.PRNGKey(seed)
