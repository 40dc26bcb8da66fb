"""Per-segment API (reference ``Segment``, segment.h:43-125): thin, explicit
wrappers over the batched primitives in ops/ and models/trajectory.

A segment is one row of the stacked trajectory representation:
coefficients (N, D) + scalar time.  Everything here also accepts leading
batch axes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..ops import basis, roots
from .trajectory import Trajectory, Extremum, min_max_magnitude


def evaluate(coefficients: jnp.ndarray, t, derivative: int = 0) -> jnp.ndarray:
    """Evaluate a segment's D polynomials at local time(s) t.

    Args:
      coefficients: (..., N, D).
      t: scalar or (..., T).

    Returns:
      (..., T, D) (or (..., D) for scalar t).  Segment::evaluate
      (segment.cpp:51-58).
    """
    per_dim = jnp.moveaxis(jnp.asarray(coefficients), -1, -2)  # (..., D, N)
    t_arr = jnp.asarray(t)
    scalar = t_arr.ndim == 0
    t_arr = jnp.atleast_1d(t_arr)
    vals = basis.polyval(per_dim[..., None, :], jnp.expand_dims(t_arr, -2),
                         derivative)
    out = jnp.moveaxis(vals, -2, -1)
    return out[..., 0, :] if scalar else out


def min_max_magnitude_candidate_times(coefficients: jnp.ndarray,
                                      derivative: int,
                                      t_start, t_end
                                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(candidate times, valid mask) for extrema of ||x^(d)|| on [t_start,
    t_end]: endpoints + roots of d/dt ||x^(d)||^2
    (Segment::computeMinMaxMagnitudeCandidateTimes, segment.cpp:82-133)."""
    return roots.magnitude_minmax_candidates(coefficients, derivative,
                                             t_start, t_end)


def min_max_magnitude_single(coefficients: jnp.ndarray, time,
                             derivative: int) -> Tuple[Extremum, Extremum]:
    """(min, max) of ||x^(d)|| over one segment
    (Segment::computeMinMaxMagnitude, segment.cpp:160-184)."""
    coeffs = jnp.asarray(coefficients)[..., None, :, :]     # add K axis
    times = jnp.asarray(time)[..., None]
    traj = Trajectory(coefficients=coeffs, times=times)
    return min_max_magnitude(traj, derivative)


def get_segment_dimension(coefficients: jnp.ndarray,
                          dims: Sequence[int]) -> jnp.ndarray:
    """Project onto a subset of spatial dimensions (segment.cpp:186-211)."""
    return jnp.take(jnp.asarray(coefficients), jnp.asarray(list(dims)),
                    axis=-1)


def append_dimensions(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Stack two segments' dimensions (segment.cpp:213-248)."""
    return jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], axis=-1)
