"""Gradient reversal layers (GRL) as ``jax.custom_vjp`` — exact and free.

The reference implements GRL as a torch autograd Function that passes the
input through and negates+scales the gradient (``lib/DAF/DA.py:19-33``,
α = 0.1). MAF adds a *weighted* GRL whose backward is scaled by the
discriminator's own confidence (``lib/MAF/DA.py:34-53``), and PA-ATF/PT-MAF
pass α as an argument (``lib/PA_ATF/faster_rcnn.py:29-41``). All three map to
one-line custom VJPs here; under jit they are literally a single negate-scale
fused into the backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _grl(x, alpha):
    return x


def _grl_fwd(x, alpha):
    return x, alpha


def _grl_bwd(alpha, g):
    return jax.tree_util.tree_map(lambda t: -alpha * t, g), None


_grl.defvjp(_grl_fwd, _grl_bwd)


def grad_reverse(x: jnp.ndarray, alpha: float = 0.1) -> jnp.ndarray:
    """Identity forward; backward multiplies the cotangent by ``-alpha``
    (reference ``GRLayer``, ``lib/DAF/DA.py:19-33``)."""
    return _grl(x, jnp.asarray(alpha, dtype=x.dtype))


@jax.custom_vjp
def _wgrl(x, weight):
    return x


def _wgrl_fwd(x, weight):
    return x, weight


def _wgrl_bwd(weight, g):
    return -weight * g, None


_wgrl.defvjp(_wgrl_fwd, _wgrl_bwd)


def weighted_grad_reverse(x: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """MAF's WGRLayer (``lib/MAF/DA.py:34-53``): backward scaled elementwise
    by a (stop-gradient) per-position weight, then negated. ``weight`` must
    broadcast against ``x``."""
    return _wgrl(x, jax.lax.stop_gradient(weight))
