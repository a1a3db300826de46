"""Multi-view camera synchronization (SyncMatch-style power iteration).

Functional parity with the reference's vendored synchronization
(utils/sync_utils.py:48-191, itself from facebookresearch/SyncMatch): build a
confidence-weighted 4Nx4N block matrix of pairwise SE(3)s, square it `squares`
times, renormalize each block by its homogeneous mass, and project rotations
back to SO(3).

Runs host-side in numpy float64: the matrices are 20x20 for 5 views, eval-only,
and TPUs have no fast f64 — this is the correct placement (SURVEY.md §7.3).
`camera_synchronization_jax` is the float32, jit-compatible variant for fully
jitted eval pipelines; it rescales the matrix after every squaring (the scale
cancels in the final per-block mass normalization) so float32 survives the
2**squares power iteration, and matches the f64 path to ~1e-4 on
well-conditioned graphs (tested in tests/test_eval.py).
"""

from __future__ import annotations

import functools
from itertools import combinations
from typing import Dict, Tuple

import numpy as np

from forge_tpu.data import pose_np


def _se3_inverse(P: np.ndarray) -> np.ndarray:
    return pose_np.se3_inverse(P)


def camera_chaining(Ps: Dict, confidence: Dict, N: int) -> np.ndarray:
    """Chain adjacent pairwise transforms (reference: utils/sync_utils.py:48-73)."""
    for i in range(N - 1):
        assert (i, i + 1) in Ps
    batch = Ps[(0, 1)].shape[0]
    L = [np.broadcast_to(np.eye(4), (batch, 4, 4)).copy()]
    for i in range(N - 1):
        L.append(Ps[(i, i + 1)] @ L[-1])
    return np.stack(L, 1)


def camera_synchronization(
    Ps: Dict[Tuple[int, int], np.ndarray],
    confidence: Dict[Tuple[int, int], np.ndarray],
    N: int,
    squares: int = 10,
    so3_projection: bool = True,
    normalize_confidences: bool = True,
    center_first_camera: bool = False,
) -> np.ndarray:
    """Ps[(i, j)]: [b,4,4] transform i->j (extrinsic-style); returns [b,N,4,4].

    reference: utils/sync_utils.py:76-191.
    """
    if N == 2:
        return camera_chaining(Ps, confidence, N)

    views = set()
    for i, j in Ps:
        assert (i, j) in confidence and i != j and (j, i) not in Ps
        views.update((i, j))
    assert views == set(range(N))

    batch = next(iter(Ps.values())).shape[0]

    conf = np.zeros((batch, N, N), dtype=np.float64)
    for (i, j), c in confidence.items():
        c = np.asarray(c, dtype=np.float64).reshape(batch)
        conf[:, i, j] = c
        conf[:, j, i] = c
        if normalize_confidences:
            conf[:, i, i] += c / 2
            conf[:, j, j] += c / 2
    if not normalize_confidences:
        for i in range(N):
            conf[:, i, i] = 1.0
    else:
        conf = conf / np.clip(conf.sum(axis=1, keepdims=True), 1e-9, None)

    L = np.zeros((batch, N, 4, N, 4), dtype=np.float64)
    eye = np.eye(4)
    for i in range(N):
        L[:, i, :, i, :] = conf[:, i, i, None, None] * eye
    for (i, j), P in Ps.items():
        P = np.asarray(P, dtype=np.float64)
        L[:, i, :, j, :] = conf[:, i, j, None, None] * _se3_inverse(P)
        L[:, j, :, i, :] = conf[:, j, i, None, None] * P
    L = L.reshape(batch, 4 * N, 4 * N)

    for _ in range(squares):
        L = L @ L

    L = L.reshape(batch, N, 4, N, 4)
    col = 0 if center_first_camera else N // 2
    L = L[:, :, :, col, :]

    mass = L[:, :, 3:, 3:]
    assert mass.min() > 0, "2**squares, or the set of edges, is too small"
    L = L / np.clip(mass, 1e-9, None)

    if so3_projection:
        R_pre = L[:, :, :3, :3]
        U, _, Vt = np.linalg.svd(R_pre)
        det = np.linalg.det(U @ Vt)
        S = np.concatenate(
            [np.ones(det.shape + (1, 2)), det[..., None, None]], axis=-1
        )
        R = (U * S) @ Vt
        L = np.concatenate(
            [np.concatenate([R, L[:, :, :3, 3:]], axis=3), L[:, :, 3:]], axis=2
        )
    return L.astype(np.float32)


def camera_synchronization_jax(
    Ps: Dict[Tuple[int, int], "object"],
    confidence: Dict[Tuple[int, int], "object"],
    N: int,
    squares: int = 10,
    so3_projection: bool = True,
    normalize_confidences: bool = True,
    center_first_camera: bool = False,
):
    """Float32, jit-compatible power-iteration sync (same math as
    `camera_synchronization`).

    Dict keys are static (trace-time python); values may be traced jnp arrays
    [b, 4, 4] / [b]. Compensated renormalization: after each L @ L the matrix
    is divided by its per-batch max-abs entry — an overall scalar that cancels
    exactly in the final mass normalization but keeps float32 in range
    through the 2**squares amplification (reference math:
    utils/sync_utils.py:76-191, which runs float64 on CUDA).
    """
    import jax.numpy as jnp

    if N == 2:
        raise NotImplementedError("use camera_chaining for N == 2")

    first = next(iter(Ps.values()))
    batch = first.shape[0]
    f32 = jnp.float32

    conf = jnp.zeros((batch, N, N), f32)
    for (i, j), c in confidence.items():
        c = jnp.asarray(c, f32).reshape(batch)
        conf = conf.at[:, i, j].add(c).at[:, j, i].add(c)
        if normalize_confidences:
            conf = conf.at[:, i, i].add(c / 2).at[:, j, j].add(c / 2)
    if not normalize_confidences:
        conf = conf.at[:, jnp.arange(N), jnp.arange(N)].set(1.0)
    else:
        conf = conf / jnp.clip(conf.sum(axis=1, keepdims=True), 1e-9, None)

    def inv(P):
        Rt = jnp.swapaxes(P[:, :3, :3], -1, -2)
        t = -(Rt @ P[:, :3, 3:4])
        top = jnp.concatenate([Rt, t], axis=-1)
        bot = jnp.broadcast_to(
            jnp.asarray([[0.0, 0, 0, 1]], f32), (P.shape[0], 1, 4))
        return jnp.concatenate([top, bot], axis=-2)

    eye = jnp.eye(4, dtype=f32)
    L = jnp.zeros((batch, N, 4, N, 4), f32)
    for i in range(N):
        L = L.at[:, i, :, i, :].set(conf[:, i, i, None, None] * eye)
    for (i, j), P in Ps.items():
        P = jnp.asarray(P, f32)
        L = L.at[:, i, :, j, :].set(conf[:, i, j, None, None] * inv(P))
        L = L.at[:, j, :, i, :].set(conf[:, j, i, None, None] * P)
    L = L.reshape(batch, 4 * N, 4 * N)

    for _ in range(squares):
        L = L @ L
        s = jnp.max(jnp.abs(L), axis=(-2, -1), keepdims=True)
        L = L / jnp.maximum(s, 1e-30)

    L = L.reshape(batch, N, 4, N, 4)
    col = 0 if center_first_camera else N // 2
    L = L[:, :, :, col, :]
    mass = L[:, :, 3:, 3:]
    L = L / jnp.clip(mass, 1e-9, None)

    if so3_projection:
        R_pre = L[:, :, :3, :3]
        U, _, Vt = jnp.linalg.svd(R_pre)
        det = jnp.linalg.det(U @ Vt)
        S_ = jnp.concatenate(
            [jnp.ones(det.shape + (1, 2), f32), det[..., None, None]], axis=-1
        )
        R = (U * S_) @ Vt
        L = jnp.concatenate(
            [jnp.concatenate([R, L[:, :, :3, 3:]], axis=3), L[:, :, 3:]],
            axis=2,
        )
    return L


def camera_synchronization_eig(
    Ps: Dict[Tuple[int, int], np.ndarray],
    confidence: Dict[Tuple[int, int], np.ndarray],
    N: int,
) -> np.ndarray:
    """Spectral variant (reference: utils/sync_utils.py:194-278)."""
    batch = next(iter(Ps.values())).shape[0]
    conf = np.zeros((batch, N, N), dtype=np.float64)
    for (i, j), c in confidence.items():
        c = np.asarray(c, dtype=np.float64).reshape(batch)
        conf[:, i, j] = c
        conf[:, j, i] = c

    L = np.zeros((batch, N, 3, N, 3), dtype=np.float64)
    B = np.zeros((batch, N, 3, 1), dtype=np.float64)
    for i in range(N):
        L[:, i, :, i, :] = conf[:, i].sum(axis=1)[:, None, None] * np.eye(3)
    for (i, j), P in Ps.items():
        P = np.asarray(P, dtype=np.float64)
        R_ij = P[:, :3, :3]
        t_ij = P[:, :3, 3:4]
        c_ij = conf[:, i, j, None, None]
        L[:, i, :, j, :] = -c_ij * np.swapaxes(R_ij, -1, -2)
        B[:, i] += -c_ij * (np.swapaxes(R_ij, -1, -2) @ t_ij)
        L[:, j, :, i, :] = -c_ij * R_ij
        B[:, j] += c_ij * t_ij
    L = L.reshape(batch, 3 * N, 3 * N)
    B = B.reshape(batch, 3 * N)

    _, evec = np.linalg.eigh(L)
    evec = evec[:, :, :3].reshape(batch, N, 3, 3)
    det = np.linalg.det(evec)
    evec = evec * np.sign(det.mean(axis=1))[:, None, None, None]
    U, _, Vt = np.linalg.svd(evec)
    R = U @ Vt

    t = (np.linalg.pinv(L) @ B[:, :, None]).reshape(batch, N, 3)

    # make_Rt packs row-vector convention: Rt = [[R^T, t],[0,1]] of R^T
    out = np.zeros((batch, N, 4, 4), dtype=np.float64)
    out[:, :, :3, :3] = R
    out[:, :, :3, 3] = t
    out[:, :, 3, 3] = 1.0
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# Eval-harness entry: synchronize the 5x4 pairwise pose predictions
# (moved here from eval/evaluate.py — the pairwise-graph construction is
# sync-algorithm semantics, not harness glue).
# ---------------------------------------------------------------------------

def _jitted_sync(pairs, N, squares, center_first):
    """Jit-compiled f32 power-iteration sync specialized to a static pair set
    (BASELINE north star: camera synchronization as jit-compiled loops).
    Cached so repeated instances reuse the compiled program."""
    import jax

    def f(ps_vals, conf_vals):
        Ps = dict(zip(pairs, ps_vals))
        conf = dict(zip(pairs, conf_vals))
        return camera_synchronization_jax(
            Ps, conf, N=N, squares=squares, center_first_camera=center_first)

    return jax.jit(f)


def sync_pose(return_dict: Dict, best_canonical_id: str, cfg,
              backend: str = "host") -> np.ndarray:
    """Synchronize the 5x4 pairwise pose predictions (reference: kubric_eval.py:95-145).

    return_dict: predict_initial's per-canonical-permutation entries
    ({"poses_cam", "permutation", ...}, eval/evaluate.py). Edges are weighed
    by pairwise cycle consistency (kubric_eval.py:112-123).

    backend 'host': float64 numpy power iteration (reference semantics,
    utils/sync_utils.py:76-191). 'jit': the compiled f32 variant with
    compensated renormalization (camera_synchronization_jax above; accuracy
    vs f64 tested in tests/test_eval.py).
    """
    import jax.numpy as jnp

    from forge_tpu.eval import metrics as M
    from forge_tpu.geometry.rotations import mat2quat, quat2mat

    t = len(return_dict)
    pose_dict = {}
    best_pairs = []
    for key, entry in return_dict.items():
        mats = np.asarray(quat2mat(jnp.asarray(entry["poses_cam"])))
        perm = entry["permutation"]
        assert key == str(perm[0])
        for idx in range(t - 1):
            pose_dict[(int(key), perm[idx + 1])] = mats[idx]
            if key == str(best_canonical_id):
                best_pairs.append((int(key), idx))

    conf_dict = {}
    eye_q = np.array([1.0, 0, 0, 0, 0, 0, 0])
    for i in range(t):
        for j in range(t):
            if i == j:
                conf_dict[(i, j)] = 1.0
            else:
                cycle = pose_dict[(i, j)] @ pose_dict[(j, i)]
                q = np.asarray(mat2quat(jnp.asarray(cycle[None])))[0]
                theta, _ = M.compute_pose_metric(q, eye_q)
                conf_dict[(i, j)] = (np.cos(theta * np.pi / 180.0) + 1) / 2

    Ps, confidence = {}, {}
    for pair in combinations(range(t), 2):
        confidence[pair] = np.asarray([conf_dict[pair]], np.float64)
        if pair in best_pairs or pair[::-1] not in best_pairs:
            Ps[pair] = pose_np.se3_inverse(pose_dict[pair][None])
        else:
            Ps[pair] = pose_dict[pair[::-1]][None]

    if backend == "jit":
        pairs = tuple(sorted(Ps))
        fn = _jitted_sync(pairs, t, 10, True)
        Ps_sync = np.asarray(fn(
            tuple(Ps[p].astype(np.float32) for p in pairs),
            tuple(confidence[p].astype(np.float32) for p in pairs)))
    else:
        Ps_sync = camera_synchronization(
            Ps, confidence, N=t, squares=10, center_first_camera=True
        )
    poses = pose_np.se3_inverse(Ps_sync[0])
    poses = poses[return_dict[str(best_canonical_id)]["permutation"]]
    rel = pose_np.get_relative_pose(poses[0], poses[1:])
    return np.asarray(mat2quat(jnp.asarray(rel.astype(np.float32))))


_jitted_sync = functools.lru_cache(maxsize=8)(_jitted_sync)
