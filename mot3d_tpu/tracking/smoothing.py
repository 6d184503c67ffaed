"""Trajectory smoothing (the reference's `fuse_pose`).

Mirrors `Tracking/utils/vis_utils.py:82-198`: per trajectory, rotations are
Slerp-interpolated/smoothed, translations and yaw are gaussian-filtered over
time, and shapes/boxes are filled forward.  Host-side (visualisation/eval
path), NumPy + SciPy.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from scipy.ndimage import gaussian_filter1d
from scipy.spatial.transform import Rotation, Slerp


def fuse_pose(trajectory: List[dict], sigma_translation: float = 1.0,
              sigma_rotation: float = 1.0,
              seq_len: Optional[int] = None) -> List[dict]:
    """Smooth one trajectory (list of {scan_idx, loc, euler?, ...}).

    - translations: gaussian_filter1d over the track's own timeline;
    - rotations (if 'euler' present): Slerp onto every frame between first
      and last observation, then yaw smoothing;
    - other keys are filled forward for interpolated frames.
    Returns a new, densified trajectory covering every scan index between
    the first and last observation.
    """
    if len(trajectory) < 2:
        return list(trajectory)
    traj = sorted(trajectory, key=lambda d: d["scan_idx"])
    times = np.array([d["scan_idx"] for d in traj], np.float64)
    locs = np.stack([np.asarray(d["loc"], np.float64) for d in traj])

    full_t = np.arange(int(times[0]), int(times[-1]) + 1)
    interp_locs = np.stack([
        np.interp(full_t, times, locs[:, k]) for k in range(3)], axis=1)
    smooth_locs = gaussian_filter1d(interp_locs, sigma_translation, axis=0)

    have_rot = "euler" in traj[0]
    if have_rot:
        rots = Rotation.from_euler(
            "xyz", np.stack([np.asarray(d["euler"]) for d in traj]))
        slerp = Slerp(times, rots)
        interp = slerp(full_t)
        eulers = interp.as_euler("xyz")
        # Yaw smoothing (the reference smooths the y rotation channel).
        eulers[:, 1] = gaussian_filter1d(eulers[:, 1], sigma_rotation)

    out = []
    src_idx = 0
    for k, t in enumerate(full_t):
        while src_idx + 1 < len(traj) and traj[src_idx + 1]["scan_idx"] <= t:
            src_idx += 1
        det = dict(traj[src_idx])  # fill-forward everything else
        det["scan_idx"] = int(t)
        det["loc"] = smooth_locs[k]
        if have_rot:
            det["euler"] = eulers[k]
        out.append(det)
    return out


def fuse_trajectories(trajectories: List[List[dict]], **kw) -> List[List[dict]]:
    return [fuse_pose(t, **kw) for t in trajectories]
