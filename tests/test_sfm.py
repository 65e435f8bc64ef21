"""SfM layer tests: Lie ops, BA convergence on synthetic scenes, sharded BA
equivalence on the 8-device mesh, pose-graph optimization, ATE."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accelerated_features_tpu.sfm import (
    BAProblem, PoseGraph, absolute_trajectory_error, bundle_adjust,
    optimize_pose_graph, project, reprojection_rmse, se3_compose,
    se3_from_Rt, se3_inverse, so3_exp, so3_log, triangulate_linear,
    two_view_reconstruction)
from accelerated_features_tpu.geometry import posekit_available


def test_so3_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(10, 3)).astype(np.float32) * 0.8
    R = so3_exp(jnp.asarray(w))
    w2 = np.asarray(so3_log(R))
    np.testing.assert_allclose(w2, w, atol=1e-5)
    # orthonormality
    RtR = np.einsum("nij,nik->njk", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (10, 1, 1)),
                               atol=1e-5)


def test_se3_compose_inverse():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(6,)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32) * 0.3)
    ab = se3_compose(a, b)
    ident = se3_compose(se3_inverse(a), a)
    np.testing.assert_allclose(np.asarray(ident), np.zeros(6), atol=1e-5)
    # matrix check
    from accelerated_features_tpu.sfm import se3_matrix
    Tab = np.asarray(se3_matrix(ab))
    Ta = np.asarray(se3_matrix(a))
    Tb = np.asarray(se3_matrix(b))
    np.testing.assert_allclose(Tab, Ta @ Tb, atol=1e-5)


def _synth_ba_problem(seed=0, n_cams=6, n_pts=120, noise_px=1.0,
                      perturb=0.05):
    """Cameras on an arc looking at a point cloud; observations with noise;
    initial estimate perturbed from ground truth."""
    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    X = rng.uniform([-2, -2, 6], [2, 2, 10], (n_pts, 3)).astype(np.float32)

    cams_gt = np.zeros((n_cams, 6), np.float32)
    for c in range(n_cams):
        ang = 0.1 * (c - n_cams / 2)
        cams_gt[c, :3] = [0, ang, 0]
        cams_gt[c, 3:] = [0.5 * (c - n_cams / 2), 0, 0]

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cams):
        for p in range(n_pts):
            uv = np.asarray(project(jnp.asarray(cams_gt[c]),
                                    jnp.asarray(X[p]), jnp.asarray(K)))
            if 0 <= uv[0] < 640 and 0 <= uv[1] < 480:
                obs_cam.append(c)
                obs_pt.append(p)
                obs_uv.append(uv + rng.normal(0, noise_px, 2))
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True

    cams0 = cams_gt + rng.normal(0, perturb, cams_gt.shape).astype(np.float32)
    cams0[0] = cams_gt[0]
    pts0 = X + rng.normal(0, perturb * 2, X.shape).astype(np.float32)

    problem = BAProblem(
        cams=jnp.asarray(cams0),
        points=jnp.asarray(pts0),
        K=jnp.asarray(K),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(np.asarray(obs_uv), jnp.float32),
        obs_mask=jnp.ones((len(obs_cam),), bool),
        fixed_cams=jnp.asarray(fixed),
    )
    return problem, cams_gt, X


def test_bundle_adjust_converges():
    problem, cams_gt, X_gt = _synth_ba_problem()
    rmse0 = float(reprojection_rmse(problem))
    solved, info = jax.jit(
        lambda p: bundle_adjust(p, iters=15, cg_iters=40))(problem)
    rmse1 = float(reprojection_rmse(solved))
    assert rmse1 < rmse0 / 3, (rmse0, rmse1)
    assert rmse1 < 2.0  # ~noise level (1px std)
    assert float(info["final_cost"]) < float(info["initial_cost"])
    # camera poses close to GT
    cams = np.asarray(solved.cams)
    assert np.abs(cams - cams_gt).max() < 0.05


def test_bundle_adjust_masked_obs():
    """Masked-out observations must not affect the solution (scale gauge
    pinned — see _fix_scale_gauge; with it, the padded and unpadded
    problems solve BIT-identically)."""
    problem, _, _ = _synth_ba_problem(seed=3)
    problem = _fix_scale_gauge(problem)
    n = problem.obs_cam.shape[0]
    pad = 64
    rng = np.random.default_rng(0)
    garbage = BAProblem(
        cams=problem.cams, points=problem.points, K=problem.K,
        obs_cam=jnp.concatenate([problem.obs_cam,
                                 jnp.zeros((pad,), jnp.int32)]),
        obs_pt=jnp.concatenate([problem.obs_pt,
                                jnp.zeros((pad,), jnp.int32)]),
        obs_uv=jnp.concatenate([problem.obs_uv,
                                jnp.asarray(rng.uniform(0, 5000, (pad, 2)),
                                            jnp.float32)]),
        obs_mask=jnp.concatenate([problem.obs_mask,
                                  jnp.zeros((pad,), bool)]),
        fixed_cams=problem.fixed_cams,
    )
    s1, _ = jax.jit(lambda p: bundle_adjust(p, iters=5, cg_iters=30))(problem)
    s2, _ = jax.jit(lambda p: bundle_adjust(p, iters=5, cg_iters=30))(garbage)
    np.testing.assert_allclose(np.asarray(s2.cams), np.asarray(s1.cams),
                               atol=1e-4)


def _fix_scale_gauge(problem):
    """Freeze a second camera: one fixed camera leaves the global SCALE
    gauge free (7 dof - 6), i.e. a flat cost direction along which any
    solver position is equally valid. Parameter-level equality across
    sharding layouts / padding is only well-defined once that direction
    is pinned — block-Jacobi PCG (sfm/ba.py cg_solve) converges fast
    enough to actually move along it, where slow plain CG accidentally
    acted as a regularizer."""
    f = np.asarray(problem.fixed_cams).copy()
    f[1] = True
    return problem._replace(fixed_cams=jnp.asarray(f))


def test_sharded_ba_matches_single_device():
    from accelerated_features_tpu.parallel.ba import bundle_adjust_sharded
    from accelerated_features_tpu.parallel import make_mesh
    problem, _, _ = _synth_ba_problem(seed=5, n_cams=4, n_pts=60)
    problem = _fix_scale_gauge(problem)
    single, info1 = jax.jit(
        lambda p: bundle_adjust(p, iters=8, cg_iters=30))(problem)
    mesh = make_mesh((8, 1))
    sharded, info2 = bundle_adjust_sharded(problem, mesh, iters=8,
                                           cg_iters=30)
    np.testing.assert_allclose(float(info2["final_cost"]),
                               float(info1["final_cost"]), rtol=1e-3)
    # atol: f32 reduction-order noise on translation magnitudes ~5
    # (observed up to ~1e-3 absolute, ~2e-4 relative)
    np.testing.assert_allclose(np.asarray(sharded.cams),
                               np.asarray(single.cams), atol=2e-3)

    # gauge-DEFICIENT spec (only cam0 fixed): parameter equality is not
    # well-defined along the flat scale direction, but the COST must
    # still agree tightly across layouts
    loose, li1 = jax.jit(
        lambda p: bundle_adjust(p, iters=8, cg_iters=30))(
        _synth_ba_problem(seed=5, n_cams=4, n_pts=60)[0])
    loose_sh, li2 = bundle_adjust_sharded(
        _synth_ba_problem(seed=5, n_cams=4, n_pts=60)[0], mesh,
        iters=8, cg_iters=30)
    np.testing.assert_allclose(float(li2["final_cost"]),
                               float(li1["final_cost"]), rtol=1e-3)


def test_triangulation():
    rng = np.random.default_rng(2)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    R = np.asarray(so3_exp(jnp.asarray([0.0, 0.1, 0.0])))
    t = np.array([0.5, 0, 0])
    X = rng.uniform([-1, -1, 5], [1, 1, 8], (30, 3))
    P0 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P1 = K @ np.hstack([R, t[:, None]])
    x0 = (P0 @ np.hstack([X, np.ones((30, 1))]).T).T
    x0 = x0[:, :2] / x0[:, 2:]
    x1 = (P1 @ np.hstack([X, np.ones((30, 1))]).T).T
    x1 = x1[:, :2] / x1[:, 2:]
    X_est = triangulate_linear(P0, P1, x0, x1)
    np.testing.assert_allclose(X_est, X, atol=1e-6)


@pytest.mark.skipif(not posekit_available(), reason="posekit unavailable")
def test_two_view_reconstruction_plus_ba():
    """Full slice: matches -> pose RANSAC -> triangulation -> BA."""
    rng = np.random.default_rng(4)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    R = np.asarray(so3_exp(jnp.asarray([0.05, -0.15, 0.02])))
    t = np.array([0.6, 0.1, 0.05])
    X = rng.uniform([-2, -2, 5], [2, 2, 10], (200, 3))
    x0h = (K @ (X / X[:, 2:]).T).T
    Xc = (R @ X.T).T + t
    x1h = (K @ (Xc / Xc[:, 2:]).T).T
    p0 = x0h[:, :2] + rng.normal(0, 0.5, (200, 2))
    p1 = x1h[:, :2] + rng.normal(0, 0.5, (200, 2))
    # outliers
    p1[:30] = rng.uniform(0, 640, (30, 2))

    out = two_view_reconstruction(p0, p1, K)
    assert out is not None
    problem, inl = out
    assert inl.sum() > 120
    solved, info = jax.jit(
        lambda p: bundle_adjust(p, iters=10, cg_iters=30))(problem)
    assert float(reprojection_rmse(solved)) < 1.5


def test_pose_graph_optimization():
    """Chain of keyframes with noisy odometry + a loop closure."""
    rng = np.random.default_rng(6)
    n = 8
    gt = np.zeros((n, 6), np.float32)
    for i in range(n):
        gt[i, :3] = [0, 0.1 * i, 0]
        gt[i, 3:] = [0.4 * i, 0, 0]

    g = PoseGraph.empty()
    noisy = gt + rng.normal(0, 0.05, gt.shape).astype(np.float32)
    noisy[0] = gt[0]
    for i in range(n):
        g.add_keyframe(noisy[i])
    for i in range(n - 1):
        meas = np.asarray(se3_compose(jnp.asarray(gt[i + 1]),
                                      se3_inverse(jnp.asarray(gt[i]))))
        g.add_edge(i, i + 1, meas)
    # loop closure 0 -> n-1
    meas = np.asarray(se3_compose(jnp.asarray(gt[n - 1]),
                                  se3_inverse(jnp.asarray(gt[0]))))
    g.add_edge(0, n - 1, meas, weight=2.0)

    poses, info = optimize_pose_graph(g, iters=25)
    assert info["final_cost"] < 1e-6 * max(info["initial_cost"], 1.0) or \
        info["final_cost"] < 1e-6
    ate = absolute_trajectory_error(poses, gt)
    assert ate < 1e-2, ate


def test_ate_invariance():
    """ATE is zero under a global similarity transform."""
    rng = np.random.default_rng(7)
    gt = rng.normal(size=(10, 6)).astype(np.float32) * 0.3
    ate = absolute_trajectory_error(gt, gt)
    assert ate < 1e-5


def test_track_building():
    from accelerated_features_tpu.sfm.tracks import build_tracks
    # 3 frames; kpt 0 of each frame is one track; kpt 1 only in frames 0-1
    kpts = [np.array([[10.0, 10], [50, 50]], np.float32),
            np.array([[11.0, 10], [51, 50]], np.float32),
            np.array([[12.0, 10], [99, 99]], np.float32)]
    matches = {
        (0, 1): (np.array([0, 1]), np.array([0, 1])),
        (1, 2): (np.array([0]), np.array([0])),
    }
    oc, op, uv, n = build_tracks(matches, kpts, min_length=2)
    assert n == 2
    lens = [np.sum(op == t) for t in range(n)]
    assert sorted(lens) == [2, 3]
    # the 3-view track has one obs per frame
    t3 = int(np.argmax(lens))
    assert sorted(oc[op == t3].tolist()) == [0, 1, 2]


def test_track_conflict_dropped():
    from accelerated_features_tpu.sfm.tracks import build_tracks
    kpts = [np.zeros((3, 2), np.float32)] * 2
    # kpt 0 and 1 of frame 0 both match kpt 0 of frame 1 -> conflict
    matches = {(0, 1): (np.array([0, 1]), np.array([0, 0]))}
    _, _, _, n = build_tracks(matches, kpts, min_length=2)
    assert n == 0


def test_triangulate_tracks_and_ba():
    """Multi-view tracks -> triangulation -> BA on a 4-camera scene."""
    from accelerated_features_tpu.sfm.tracks import (build_tracks,
                                                     triangulate_tracks)
    rng = np.random.default_rng(11)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    n_cams, n_pts = 4, 60
    X = rng.uniform([-2, -2, 6], [2, 2, 10], (n_pts, 3)).astype(np.float32)
    cams = np.zeros((n_cams, 6), np.float32)
    cams[:, 3] = np.linspace(-1, 1, n_cams)

    kpts, matches = [], {}
    for c in range(n_cams):
        uv = np.stack([np.asarray(project(jnp.asarray(cams[c]),
                                          jnp.asarray(X[p]),
                                          jnp.asarray(K)))
                       for p in range(n_pts)])
        kpts.append(uv.astype(np.float32))
    for c in range(n_cams - 1):
        matches[(c, c + 1)] = (np.arange(n_pts), np.arange(n_pts))

    oc, op, uv, n = build_tracks(matches, kpts, min_length=3)
    assert n == n_pts
    assert (np.bincount(op) == n_cams).all()

    Xt = triangulate_tracks(oc, op, uv, n, cams, K)
    np.testing.assert_allclose(Xt, X, atol=1e-3)


@pytest.mark.skipif(not posekit_available(), reason="posekit unavailable")
def test_incremental_slam_synthetic():
    """Stream a synthetic trajectory through the incremental tracker with an
    injected geometric front end; keyframes + windowed BA must track the
    motion (ATE small after scale alignment)."""
    from accelerated_features_tpu.sfm.slam import IncrementalSlam, SlamConfig

    rng = np.random.default_rng(0)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    X = rng.uniform([-3, -3, 6], [3, 3, 14], (400, 3))

    n_frames = 12
    gt = np.zeros((n_frames, 6), np.float32)
    for i in range(n_frames):
        gt[i, :3] = [0, 0.04 * i, 0]
        gt[i, 3:] = [0.3 * i, 0.02 * i, 0]

    def frame_features(i):
        uv = np.stack([np.asarray(project(jnp.asarray(gt[i]),
                                          jnp.asarray(X[p], jnp.float32),
                                          jnp.asarray(K, jnp.float32)))
                       for p in range(len(X))])
        vis = ((uv[:, 0] > 0) & (uv[:, 0] < 640) &
               (uv[:, 1] > 0) & (uv[:, 1] < 480))
        ids = np.nonzero(vis)[0]
        noise = rng.normal(0, 0.3, (len(ids), 2))
        return {"keypoints": (uv[ids] + noise).astype(np.float32),
                "ids": ids}

    feats = [frame_features(i) for i in range(n_frames)]
    it = iter(range(n_frames))

    def extract(_image):
        return feats[next(it)]

    def match(d0, d1):
        common, a_idx, b_idx = np.intersect1d(d0["ids"], d1["ids"],
                                              return_indices=True)
        return a_idx, b_idx

    cfg = SlamConfig(kf_min_inliers=10_000, window=4)  # force KF every frame
    slam = IncrementalSlam(K, cfg, extract=extract, match=match)
    for i in range(n_frames):
        out = slam.process_frame(None)
    traj = slam.trajectory()
    assert len(traj) >= n_frames - 1
    assert slam.last_ba_rmse is not None and slam.last_ba_rmse < 2.0

    # monocular scale is free: compare after similarity alignment
    ate = absolute_trajectory_error(traj, gt[:len(traj)])
    assert ate < 0.2, ate


def _circle_slam_run(enable_loop, n_frames=14, noise=0.8, seed=3):
    """Camera orbits inside a ring of landmarks and returns to the start;
    injected geometric front end with per-point descriptors for retrieval."""
    from accelerated_features_tpu.sfm.slam import IncrementalSlam, SlamConfig

    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    n_pts = 900
    ang = rng.uniform(0, 2 * np.pi, n_pts)
    rad = rng.uniform(7, 11, n_pts)
    X = np.stack([rad * np.sin(ang), rng.uniform(-3, 3, n_pts),
                  rad * np.cos(ang)], -1)
    descs = rng.normal(size=(n_pts, 64)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)

    gt = np.zeros((n_frames, 6), np.float32)
    feats = []
    for i in range(n_frames):
        th = 2 * np.pi * i / n_frames
        c = 2.0 * np.array([np.sin(th), 0.0, np.cos(th)])
        aa = np.array([0.0, -th, 0.0])
        R = np.asarray(so3_exp(jnp.asarray(aa, jnp.float32)))
        t = -R @ c
        gt[i, :3] = aa
        gt[i, 3:] = t
        uv = np.stack([np.asarray(project(jnp.asarray(gt[i]),
                                          jnp.asarray(X[p], jnp.float32),
                                          jnp.asarray(K, jnp.float32)))
                       for p in range(n_pts)])
        Xc = (R @ X.T).T + t
        vis = ((uv[:, 0] > 0) & (uv[:, 0] < 640) &
               (uv[:, 1] > 0) & (uv[:, 1] < 480) & (Xc[:, 2] > 0.5))
        ids = np.nonzero(vis)[0]
        kp = uv[ids] + rng.normal(0, noise, (len(ids), 2))
        feats.append({"keypoints": kp.astype(np.float32), "ids": ids,
                      "descriptors": descs[ids]})

    it = iter(range(n_frames))

    def extract(_image):
        return feats[next(it)]

    def match(d0, d1):
        common, a_idx, b_idx = np.intersect1d(d0["ids"], d1["ids"],
                                              return_indices=True)
        return a_idx, b_idx

    cfg = SlamConfig(kf_min_inliers=10_000, window=4,
                     enable_loop_closure=enable_loop,
                     loop_min_sim=0.05, loop_min_gap=4,
                     loop_candidates=3, loop_min_inliers=20)
    slam = IncrementalSlam(K, cfg, extract=extract, match=match)
    for i in range(n_frames):
        slam.process_frame(None)
    traj = slam.trajectory()
    ate = absolute_trajectory_error(traj, gt[:len(traj)])
    return slam, ate


def test_slam_loop_closure_collapses_drift():
    """A verified loop edge + pose-graph optimization must shrink ATE vs
    the same sequence tracked as pure odometry (VERDICT r1 #4)."""
    slam_open, ate_open = _circle_slam_run(enable_loop=False)
    slam_loop, ate_loop = _circle_slam_run(enable_loop=True)
    assert slam_open.n_loop_closures == 0
    assert slam_loop.n_loop_closures >= 1
    assert ate_loop < ate_open * 0.75, (ate_open, ate_loop)
    assert ate_loop < 0.25, ate_loop


def test_slam_relocalization():
    """Cutting the sequential overlap (teleport) must trigger
    relocalization against a previously-seen keyframe."""
    from accelerated_features_tpu.sfm.slam import IncrementalSlam, SlamConfig

    rng = np.random.default_rng(4)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    n_pts = 700
    ang = rng.uniform(0, 2 * np.pi, n_pts)
    rad = rng.uniform(7, 11, n_pts)
    X = np.stack([rad * np.sin(ang), rng.uniform(-3, 3, n_pts),
                  rad * np.cos(ang)], -1)
    descs = rng.normal(size=(n_pts, 64)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)

    def make_frame(th):
        c = 2.0 * np.array([np.sin(th), 0.0, np.cos(th)])
        aa = np.array([0.0, -th, 0.0])
        R = np.asarray(so3_exp(jnp.asarray(aa, jnp.float32)))
        t = -R @ c
        pose = np.concatenate([aa, t]).astype(np.float32)
        uv = np.stack([np.asarray(project(jnp.asarray(pose),
                                          jnp.asarray(X[p], jnp.float32),
                                          jnp.asarray(K, jnp.float32)))
                       for p in range(n_pts)])
        Xc = (R @ X.T).T + t
        vis = ((uv[:, 0] > 0) & (uv[:, 0] < 640) &
               (uv[:, 1] > 0) & (uv[:, 1] < 480) & (Xc[:, 2] > 0.5))
        ids = np.nonzero(vis)[0]
        return {"keypoints": uv[ids].astype(np.float32), "ids": ids,
                "descriptors": descs[ids]}

    # wander away from the start with tracked keyframes, then teleport back
    # near angle 0: the last keyframe (1.35 rad away) shares no view with
    # the final frame, but keyframe 0 does -> relocalization must anchor it
    angles = [0.0, 0.12, 0.24, 0.36, 0.6, 0.85, 1.1, 1.35, 0.05]
    frames = [make_frame(a) for a in angles]
    it = iter(range(len(frames)))

    def extract(_image):
        return frames[next(it)]

    def match(d0, d1):
        common, a_idx, b_idx = np.intersect1d(d0["ids"], d1["ids"],
                                              return_indices=True)
        return a_idx, b_idx

    cfg = SlamConfig(kf_min_inliers=10_000, window=4,
                     enable_loop_closure=True, loop_min_sim=0.05,
                     loop_min_gap=10, reloc_min_inliers=15)
    slam = IncrementalSlam(K, cfg, extract=extract, match=match)
    outs = [slam.process_frame(None) for _ in range(len(frames))]
    assert slam.n_relocalizations >= 1
    assert any(o["relocalized"] for o in outs)


def test_block_jacobi_pcg_converges_faster():
    """Block-Jacobi PCG (M = damped U, zero extra interconnect traffic)
    must reach the plain-CG@50 cost level in <= half the iterations on
    the synthetic BA problem — each saved CG iteration saves one
    latency-bound camera-space psum in the distributed solver
    (parallel/ba.predicted_weak_scaling)."""
    import jax

    from accelerated_features_tpu.sfm.ba import bundle_adjust

    p, _, _ = _synth_ba_problem()

    _, st_plain = jax.jit(lambda q: bundle_adjust(
        q, iters=6, cg_iters=50, precond=False))(p)
    _, st_pcg = jax.jit(lambda q: bundle_adjust(
        q, iters=6, cg_iters=20, precond=True))(p)
    # PCG at 20 iters matches (or beats) plain CG at 50
    assert float(st_pcg["final_cost"]) <= 1.02 * float(
        st_plain["final_cost"])
