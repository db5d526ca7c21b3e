#!/usr/bin/env python
"""Derive ATE/RPE goldens from an INDEPENDENT transcription of evo's
documented algorithm, to pin `aether_tpu/eval/pose_metrics.py` to evo's
numeric contract (reference `evaluation/rel_pose/evo_utils.py:162-246`
delegates to the evo package, which is not installed here).

The transcription below deliberately follows evo's own code structure —
(3, N) position matrices, loop-built outer-product covariance, the
`scale(s)` THEN `transform(se3(r, t))` alignment order, RPE alignment
before pair enumeration — rather than aether_tpu's vectorized layout, so a
convention slip in either implementation (align order, scale handling,
degrees vs radians, RMSE vs mean, E = rel_ref^-1 @ rel_est orientation)
makes the two disagree.

evo contract transcribed (evo.core.geometry / metrics / main_ape / main_rpe,
as invoked by the reference with align=True, correct_scale=True, delta=1,
delta_unit=frames, all_pairs=True):

- umeyama_alignment(x, y, with_scale): x = est (3, N), y = ref (3, N);
  cov = sum_i outer(y_i - mu_y, x_i - mu_x) / N; svd -> u, d, v (v is V^T);
  s = diag(1, 1, det(u)det(v)); r = u s v; c = trace(diag(d) s) / sigma_x
  with sigma_x = mean ||x_i - mu_x||^2; t = mu_y - c r mu_x.
- align: est poses -> scale positions by c, then left-multiply se3(r, t):
  R_i' = r R_i, p_i' = c r p_i + t.
- APE(translation_part): err_i = ||p_est_aligned_i - p_ref_i||; stat = RMSE.
- RPE(delta=1, frames, all_pairs): pairs (i, i+1) for every i (at delta=1
  the all-pairs and non-overlapping enumerations coincide); on the ALIGNED
  est: rel_X = X_i^-1 X_{i+1}; E = rel_ref^-1 rel_est;
  translation_part: err = ||E[:3, 3]||; rotation_angle_deg:
  err = degrees(|rotation angle of E[:3, :3]|); stat = RMSE.

Writes tests/fixtures/pose_metric_goldens.npz.
"""

import os
import sys

import numpy as np
from scipy.spatial.transform import Rotation

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --- independent evo transcription (see module docstring) -------------------


def evo_umeyama(x: np.ndarray, y: np.ndarray, with_scale: bool):
    """x, y: (3, N) est/ref position matrices (evo's layout)."""
    n = x.shape[1]
    mean_x = x.mean(axis=1)
    mean_y = y.mean(axis=1)
    sigma_x = float(np.sum((x - mean_x[:, None]) ** 2)) / n
    outer_sum = np.zeros((3, 3))
    for i in range(n):
        outer_sum += np.outer(y[:, i] - mean_y, x[:, i] - mean_x)
    cov_xy = outer_sum / n
    u, d, v = np.linalg.svd(cov_xy)
    s = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(v) < 0.0:
        s[2, 2] = -1.0
    r = u @ s @ v
    c = np.trace(np.diag(d) @ s) / sigma_x if with_scale else 1.0
    t = mean_y - c * r @ mean_x
    return r, t, c


def evo_align(est_se3: np.ndarray, ref_se3: np.ndarray):
    """evo trajectory.align(correct_scale=True): scale(c) then transform."""
    r, t, c = evo_umeyama(est_se3[:, :3, 3].T, ref_se3[:, :3, 3].T, True)
    out = est_se3.copy()
    out[:, :3, 3] *= c                       # PosePath3D.scale
    for i in range(len(out)):                # PosePath3D.transform(se3(r,t))
        se3 = np.eye(4)
        se3[:3, :3] = r
        se3[:3, 3] = t
        out[i] = se3 @ out[i]
    return out


def evo_ape_translation(est_se3, ref_se3):
    aligned = evo_align(est_se3, ref_se3)
    errs = [np.linalg.norm(aligned[i, :3, 3] - ref_se3[i, :3, 3])
            for i in range(len(ref_se3))]
    return float(np.sqrt(np.mean(np.square(errs))))


def evo_rpe(est_se3, ref_se3, pose_relation: str, delta: int = 1):
    aligned = evo_align(est_se3, ref_se3)
    # delta_unit=frames, all_pairs=True: every (i, i+delta)
    pairs = [(i, i + delta) for i in range(len(aligned) - delta)]
    errs = []
    for i, j in pairs:
        rel_est = np.linalg.inv(aligned[i]) @ aligned[j]
        rel_ref = np.linalg.inv(ref_se3[i]) @ ref_se3[j]
        e = np.linalg.inv(rel_ref) @ rel_est
        if pose_relation == "rotation_angle_deg":
            errs.append(np.degrees(
                np.abs(Rotation.from_matrix(e[:3, :3]).magnitude())))
        elif pose_relation == "translation_part":
            errs.append(np.linalg.norm(e[:3, 3]))
        else:
            raise ValueError(pose_relation)
    return float(np.sqrt(np.mean(np.square(errs))))


# --- trajectories exercising the convention traps ----------------------------


def _se3(rotvecs, positions):
    out = np.zeros((len(positions), 4, 4))
    out[:, 3, 3] = 1.0
    out[:, :3, :3] = Rotation.from_rotvec(rotvecs).as_matrix()
    out[:, :3, 3] = positions
    return out


def make_trajectories():
    trajs = {}

    # T1 similarity: est is an EXACT similarity transform of ref — any
    # alignment slip (scale off, wrong order) makes ATE blow up from ~0.
    th = np.linspace(0.0, 2.2, 9)
    ref_pos = np.stack([np.cos(th), np.sin(th), 0.3 * th], axis=1)
    ref_rv = np.stack([0.1 * th, -0.2 * th, 0.05 + 0 * th], axis=1)
    ref = _se3(ref_rv, ref_pos)
    g_r = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    s, t = 2.3, np.array([4.0, -2.0, 1.0])
    est = ref.copy()
    est[:, :3, 3] = (s * (g_r @ ref_pos.T)).T + t
    est[:, :3, :3] = g_r @ ref[:, :3, :3]
    trajs["similarity"] = (est, ref)

    # T2 noisy: deterministic per-frame translation + rotation perturbations
    # — nonzero ATE, RPE-trans, RPE-rot (rot errors ~2-8 deg: the
    # degrees-vs-radians trap is a 57x difference).
    rng = np.random.default_rng(2024)
    est2 = est.copy()
    est2[:, :3, 3] += rng.normal(0.0, 0.15, (9, 3))
    pert = Rotation.from_rotvec(rng.normal(0.0, 0.06, (9, 3))).as_matrix()
    est2[:, :3, :3] = np.einsum("nij,njk->nik", pert, est2[:, :3, :3])
    trajs["noisy"] = (est2, ref)

    # T3 scale-trap: est at 0.05x scale on an L-shaped path — without
    # correct_scale the ATE is ~path-length; with it, only the injected
    # noise remains.
    pos3 = np.concatenate([
        np.stack([np.linspace(0, 5, 6), np.zeros(6), np.zeros(6)], axis=1),
        np.stack([np.full(5, 5.0), np.linspace(1, 5, 5), np.zeros(5)], axis=1),
    ])
    rv3 = np.stack([np.zeros(11), np.linspace(0, 0.8, 11),
                    np.linspace(0, -0.4, 11)], axis=1)
    ref3 = _se3(rv3, pos3)
    est3 = ref3.copy()
    est3[:, :3, 3] = 0.05 * pos3 + rng.normal(0.0, 0.002, (11, 3))
    trajs["scale_trap"] = (est3, ref3)

    return trajs


def main():
    out = {}
    for name, (est, ref) in make_trajectories.__call__().items():
        ate = evo_ape_translation(est, ref)
        rpe_t = evo_rpe(est, ref, "translation_part")
        rpe_r = evo_rpe(est, ref, "rotation_angle_deg")
        out[f"{name}_est"] = est
        out[f"{name}_ref"] = ref
        out[f"{name}_metrics"] = np.array([ate, rpe_t, rpe_r])
        print(f"{name:12s} ATE {ate:.10f}  RPE-t {rpe_t:.10f}  "
              f"RPE-r {rpe_r:.10f} deg")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "pose_metric_goldens.npz")
    np.savez(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
