"""Trajectory export: sampled text dump (Matlab-readable) and npz archives.

Replaces printMatlabSampledTrajectory (nonlinear_impl.h:2907-3003): sampled
[t, pos, vel, acc, jerk, snap] rows to a whitespace-separated text file, plus
a structured npz round-trip for batches of trajectories (the reference has no
binary serialization at all)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ..models import trajectory as traj_mod
from ..models.trajectory import Trajectory


def sample_trajectory(traj: Trajectory, dt: float,
                      derivatives: Sequence[int] = (0, 1, 2, 3, 4)
                      ) -> np.ndarray:
    """Sampled state matrix: columns [t, x^(d) for d in derivatives...].

    Shape (T, 1 + len(derivatives) * D).
    """
    times = np.asarray(traj.times)
    ts = traj_mod.sample_times(times, dt)
    ts_clamped = np.minimum(ts, times.sum() - 1e-9)
    cols = [ts[:, None]]
    for d in derivatives:
        vals = np.asarray(traj_mod.evaluate(traj, jnp.asarray(ts_clamped), d))
        cols.append(vals)
    return np.concatenate(cols, axis=1)


def write_matlab_sampled_trajectory(traj: Trajectory, path: str,
                                    dt: float = 0.05) -> None:
    """Text dump in the reference's format: one row per sample,
    [t, x y z, vx vy vz, ax ay az, jx jy jz, sx sy sz]
    (printMatlabSampledTrajectory, nonlinear_impl.h:2907-3003)."""
    data = sample_trajectory(traj, dt)
    np.savetxt(path, data, fmt="%.12g")


def save_trajectories(path: str, traj: Trajectory, **extra) -> None:
    """npz archive of a (possibly batched) trajectory pytree + extras."""
    np.savez_compressed(
        path,
        coefficients=np.asarray(traj.coefficients),
        times=np.asarray(traj.times),
        **{k: np.asarray(v) for k, v in extra.items()})


def load_trajectories(path: str) -> Trajectory:
    with np.load(path) as data:
        return Trajectory(coefficients=jnp.asarray(data["coefficients"]),
                          times=jnp.asarray(data["times"]))
