"""End-to-end windowed BA test on the analytic plane scene.

Golden-convergence test in the spirit SURVEY.md §4 calls for: render exact
images of a textured plane from known poses, perturb poses + inverse depths,
run the jitted LM window optimizer, and require recovery of the ground
truth. Also checks the Schur-marginalization identity: replacing a point set
by its (HM, bM0) prior leaves the frame-block GN step unchanged at the
linearization point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmvio_tpu.models import ba
from dmvio_tpu.ops import ba_solve, interp, pyramid, residuals
from dmvio_tpu.ops.residuals import BAFrames, BAPoints
from dmvio_tpu.utils import lie, synthetic
from dmvio_tpu.utils.camera import Calib, PATTERN

H, W = 96, 128
F, P = 4, 256


def build_problem(seed=0, pose_noise=0.01, idepth_noise=0.05, aff_gt=False):
    rng = np.random.default_rng(seed)
    calib = Calib.create(100.0, 100.0, W / 2 - 0.5, H / 2 - 0.5)
    scene = synthetic.default_scene(depth=2.0)
    R_gt, t_gt = synthetic.orbit_poses(F)

    gains = 0.05 * rng.standard_normal(F) if aff_gt else np.zeros(F)
    offs = 2.0 * rng.standard_normal(F) if aff_gt else np.zeros(F)
    images = jnp.stack([
        pyramid.build_pyramid(
            synthetic.render(scene, R_gt[f], t_gt[f], calib, H, W,
                             float(gains[f]), float(offs[f])),
            levels=1,
        )[0]
        for f in range(F)
    ])

    # Points hosted across the first 2 frames, on a jittered grid.
    hosts = np.tile(np.arange(2), P // 2 + 1)[:P].astype(np.int32)
    u = rng.uniform(8, W - 8, P).astype(np.float32)
    v = rng.uniform(8, H - 8, P).astype(np.float32)
    host_j = jnp.asarray(hosts)
    id_gt = jax.vmap(
        lambda f, uu, vv: synthetic.gt_idepth(scene, R_gt[f], t_gt[f], calib, uu, vv)
    )(host_j, jnp.asarray(u), jnp.asarray(v))

    pat = jnp.asarray(PATTERN)
    color = jax.vmap(
        lambda f, uu, vv: interp.bilinear(images[f][0], uu + pat[:, 0], vv + pat[:, 1])
    )(host_j, jnp.asarray(u), jnp.asarray(v))

    # Perturb all but frame 0 (gauge anchor).
    Rs, ts = [R_gt[0]], [t_gt[0]]
    for f in range(1, F):
        xi = jnp.asarray(
            np.concatenate([
                rng.normal(0, pose_noise, 3),        # translation (m)
                rng.normal(0, pose_noise * 0.5, 3),  # rotation (rad)
            ]), jnp.float32)
        R, t = lie.se3_retract(R_gt[f], t_gt[f], xi)
        Rs.append(R)
        ts.append(t)
    R_init = jnp.stack(Rs)
    t_init = jnp.stack(ts)
    aff_init = jnp.zeros((F, 2), jnp.float32)

    idep = id_gt * jnp.asarray(1.0 + rng.normal(0, idepth_noise, P), jnp.float32)

    frames = BAFrames(
        R_cw=R_init, t_cw=t_init, aff=aff_init,
        R0_cw=R_init, t0_cw=t_init, aff0=aff_init,
        mask=jnp.ones(F, bool),
    )
    points = BAPoints(
        host=host_j, u=jnp.asarray(u), v=jnp.asarray(v),
        idepth=idep, idepth_zero=idep,
        color=color, weight=jnp.ones((P, 8), jnp.float32),
        mask=jnp.ones(P, bool),
    )
    pair_mask = host_j[None, :] != jnp.arange(F)[:, None]

    C = ba_solve.cdim(F)
    prior = np.zeros(C, np.float32)
    prior[:4] = 1e8                      # pin intrinsics
    prior[4:4 + 6] = 1e8                 # pin first-frame pose (gauge)
    prior[4 + 6:4 + 8] = 1e8             # pin first-frame affine
    for f in range(1, F):
        prior[4 + 8 * f + 6] = 1e2 if aff_gt else 1e6   # affine a
        prior[4 + 8 * f + 7] = 1e0 if aff_gt else 1e4   # affine b

    problem = ba.BAProblem(
        frames=frames, points=points, calib=calib,
        calib0=calib.as_vec(),
        HM=jnp.zeros((C, C), jnp.float32), bM0=jnp.zeros(C, jnp.float32),
        prior_diag=jnp.asarray(prior), pair_mask=pair_mask,
    )
    return problem, images, (R_gt, t_gt, id_gt)


def pose_errors(frames, R_gt, t_gt):
    """Max translation/rotation error after optimal SCALE alignment.

    The monocular window has an unobservable global scale (frame 0 is
    pinned at t = 0, so its prior cannot fix scale) — like any monocular
    evaluation, compare after scale alignment.
    """
    t_est = np.asarray(frames.t_cw[:F], np.float64)
    t_ref = np.asarray(t_gt[:F], np.float64)
    s = float((t_est * t_ref).sum() / max((t_est * t_est).sum(), 1e-12))
    errs_t, errs_r = [], []
    for f in range(F):
        dR = np.asarray(frames.R_cw[f]) @ np.asarray(R_gt[f]).T
        errs_r.append(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR)))))
        errs_t.append(np.linalg.norm(s * t_est[f] - t_ref[f]))
    return np.max(errs_t), np.max(errs_r), s


def test_ba_recovers_ground_truth():
    problem, images, (R_gt, t_gt, id_gt) = build_problem()
    et0, er0, _ = pose_errors(problem.frames, R_gt, t_gt)

    result = ba.optimize_jit(problem, images, max_iters=10)

    et1, er1, s = pose_errors(result.frames, R_gt, t_gt)
    assert et1 < 0.15 * et0 + 1e-5, (et0, et1)
    assert er1 < 0.15 * er0 + 1e-5, (er0, er1)

    # Inverse depths co-scale with translations (idepth ~ 1/s).
    id_err = np.asarray(jnp.abs(result.points.idepth / s - id_gt) / id_gt)
    # 1.2%: the synthetic texture's high-frequency terms (added to make
    # wrong geometry photometrically costly) also raise the linearization
    # error floor slightly.
    assert np.median(id_err) < 0.012, np.median(id_err)
    # Energy must have dropped dramatically vs the initial linearization.
    lin0 = residuals.linearize(problem.frames, problem.points, problem.calib,
                               images, problem.pair_mask)
    assert float(result.energy) < 0.05 * float(jnp.sum(lin0.energy))


def test_ba_recovers_affine_brightness():
    problem, images, (R_gt, t_gt, id_gt) = build_problem(
        seed=3, pose_noise=0.005, aff_gt=True
    )
    result = ba.optimize_jit(problem, images, max_iters=12)
    et1, er1, s = pose_errors(result.frames, R_gt, t_gt)
    assert et1 < 5e-3, et1
    # Relative brightness gains should be recovered: predicted target
    # intensity uses exp(a_t - a_h); frame 0 is pinned at (0, 0).
    id_err = np.asarray(jnp.abs(result.points.idepth / s - id_gt) / id_gt)
    assert np.median(id_err) < 0.02


def test_point_marginalization_preserves_frame_step():
    """Schur identity: folding points into (HM, bM0) and dropping them gives
    the same frame-block GN step at the linearization point."""
    problem, images, _ = build_problem(seed=7)
    Fn = F
    N_null = ba_solve.nullspaces(problem.frames, Fn)

    lin = residuals.linearize(problem.frames, problem.points, problem.calib,
                              images, problem.pair_mask)
    sys_full = ba_solve.accumulate(lin, problem.points.host, Fn)

    zeroC = jnp.zeros_like(problem.bM0)
    dx_full, _ = ba_solve.solve_levenberg(
        sys_full, problem.HM, zeroC, problem.prior_diag, zeroC,
        jnp.asarray(0.0), problem.frames.mask, problem.points.mask, N_null,
    )

    # Marginalize the last quarter of the points.
    marg = jnp.arange(P) >= (3 * P) // 4
    HM_add, bM_add = ba.marginalization_update_jit(problem, images, marg)

    keep_points = problem.points._replace(mask=problem.points.mask & ~marg)
    lin2 = residuals.linearize(problem.frames, keep_points, problem.calib,
                               images, problem.pair_mask)
    sys_red = ba_solve.accumulate(lin2, keep_points.host, Fn)
    dx_red, _ = ba_solve.solve_levenberg(
        sys_red, problem.HM + HM_add, bM_add, problem.prior_diag, zeroC,
        jnp.asarray(0.0), problem.frames.mask, keep_points.mask, N_null,
    )
    np.testing.assert_allclose(
        np.asarray(dx_red), np.asarray(dx_full), rtol=5e-2, atol=5e-4
    )


def test_frame_energy_th_adaptive():
    """setNewFrameEnergyTH parity (FullSystemOptimize.cpp:96-147): the
    threshold follows each frame's own residual-energy distribution, so a
    frame whose energies are uniformly elevated (exposure jump, texture
    change) keeps its inliers where a fixed threshold would drop them."""
    import numpy as np

    from dmvio_tpu.models import ba
    from dmvio_tpu.ops.residuals import OUTLIER_TH

    rng = np.random.default_rng(0)
    F, P = 4, 256
    pair_ok = np.ones((F, P), bool)
    base = rng.uniform(5.0, 50.0, (F, P)).astype(np.float32)
    # Frame 2: uniformly 40x energies (still a consistent model fit).
    base[2] *= 40.0
    th = np.asarray(ba.frame_energy_th(jnp.asarray(base),
                                       jnp.asarray(pair_ok)))
    assert th.shape == (F,)
    # Normal frames: threshold above nearly all their energies.
    assert (base[0] < th[0]).mean() > 0.95
    # The elevated frame's threshold scales up; a fixed 12^2*8 threshold
    # would have dropped most of its pairs.
    assert th[2] > th[0]
    assert (base[2] < th[2]).mean() > 0.5
    assert (base[2] > OUTLIER_TH * 8).mean() > 0.4   # fixed TH would drop
    # Hard cap (IMUSettings.h:59) and empty-frame fallback.
    assert th.max() <= 5000.0 + 1e-3
    pair_ok[1] = False
    th2 = np.asarray(ba.frame_energy_th(jnp.asarray(base),
                                        jnp.asarray(pair_ok)))
    assert abs(th2[1] - OUTLIER_TH * 8) < 1e-3
