"""
Minimum-image periodic-boundary displacement.

Reproduces the reference's single-wrap semantics (``rdf_cn.py:50-55``):
each component is wrapped at most once by +-L when |d| > L/2. For
wrapped input coordinates (|d| < 1.5 L always) this equals the closed
form ``d - L*round(d/L)``; we keep the compare/select form to be
bit-faithful at the |d| == L/2 boundary (reference wraps only on strict
inequality).
"""

import jax.numpy as jnp


def minimum_image(d, lengths):
    """Wrap displacement components into (-L/2, L/2].

    Args:
      d: displacements, shape (..., 3) or any shape broadcastable with
         ``lengths``.
      lengths: box lengths, broadcastable to ``d`` (e.g. (3,) for the last
         axis).
    Returns:
      wrapped displacements, same shape/dtype as ``d``.
    """
    half = lengths / 2
    over = d > half
    under = d < -half
    return jnp.where(over, d - lengths, jnp.where(under, d + lengths, d))


def minimum_image_1d(d, length):
    """Scalar-axis variant used inside kernels."""
    half = length / 2
    return jnp.where(d > half, d - length, jnp.where(d < -half, d + length, d))
