"""Algebra checks for the BA solver: Schur == dense solve, marginalization,
nullspace projection."""

import jax
import jax.numpy as jnp
import numpy as np

from dmvio_tpu.ops import ba_solve
from dmvio_tpu.ops.ba_solve import BASystem, CPART, cdim
from dmvio_tpu.ops.residuals import BAFrames
from dmvio_tpu.utils import lie


def random_system(seed=0, F=3, P=12, rows_per_point=6):
    """Build a consistent (H, b, H_fd, H_dd, b_d) from explicit Jacobians."""
    rng = np.random.default_rng(seed)
    C = cdim(F)
    N = P * rows_per_point
    J = rng.normal(size=(N, C)).astype(np.float32)
    Jd_scalar = rng.normal(size=N).astype(np.float32) + 2.0
    r = rng.normal(size=N).astype(np.float32)
    point_of_row = np.repeat(np.arange(P), rows_per_point)

    H = J.T @ J
    b = J.T @ r
    H_fd = np.zeros((P, C), np.float32)
    H_dd = np.zeros(P, np.float32)
    b_d = np.zeros(P, np.float32)
    for n in range(N):
        p = point_of_row[n]
        H_fd[p] += Jd_scalar[n] * J[n]
        H_dd[p] += Jd_scalar[n] ** 2
        b_d[p] += Jd_scalar[n] * r[n]

    # Full dense system over [C + P] for ground truth.
    Jfull = np.zeros((N, C + P), np.float32)
    Jfull[:, :C] = J
    Jfull[np.arange(N), C + point_of_row] = Jd_scalar
    Hfull = Jfull.T @ Jfull
    bfull = Jfull.T @ r

    sys = BASystem(
        H=jnp.asarray(H), b=jnp.asarray(b),
        H_fd=jnp.asarray(H_fd), H_dd=jnp.asarray(H_dd), b_d=jnp.asarray(b_d),
        energy=jnp.asarray(0.0), num_terms=jnp.asarray(float(N)),
    )
    return sys, Hfull, bfull, C, P


def test_schur_solve_matches_dense():
    sys, Hfull, bfull, C, P = random_system()
    F = 3
    # Small ridge so the dense reference is well posed.
    prior = 1e-2 * jnp.ones(C)
    Hfull_r = Hfull.copy()
    Hfull_r[:C, :C] += np.diag(np.asarray(prior))

    dx_ref = np.linalg.solve(Hfull_r.astype(np.float64), -bfull.astype(np.float64))

    dx_f, dx_d = ba_solve.solve_levenberg(
        sys,
        HM=jnp.zeros((C, C)),
        bM_eff=jnp.zeros(C),
        H_prior_diag=prior,
        b_prior=jnp.zeros(C),
        lam=jnp.asarray(0.0),
        frame_mask=jnp.ones(F, bool),
        point_mask=jnp.ones(P, bool),
        N_null=jnp.zeros((C, 7)),
    )
    np.testing.assert_allclose(np.asarray(dx_f), dx_ref[:C], rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dx_d), dx_ref[C:], rtol=2e-2, atol=2e-3)


def test_masked_frame_and_points_get_zero_steps():
    sys, _, _, C, P = random_system(seed=1)
    F = 3
    fmask = jnp.asarray([True, True, False])
    pmask = jnp.asarray([True] * (P - 3) + [False] * 3)
    dx_f, dx_d = ba_solve.solve_levenberg(
        sys, jnp.zeros((C, C)), jnp.zeros(C), 1e-2 * jnp.ones(C),
        jnp.zeros(C), jnp.asarray(0.0), fmask, pmask, jnp.zeros((C, 7)),
    )
    blk = np.asarray(dx_f)[CPART + 16: CPART + 24]
    np.testing.assert_allclose(blk, 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dx_d)[-3:], 0.0, atol=1e-7)
    assert np.all(np.isfinite(np.asarray(dx_f)))


def test_marginalize_frame_prior_matches_manual_schur():
    rng = np.random.default_rng(2)
    F = 3
    C = cdim(F)
    A = rng.normal(size=(C + 5, C)).astype(np.float64)
    HM = A.T @ A
    bM = rng.normal(size=C)

    slot = 1
    i0 = CPART + 8 * slot
    keep = np.ones(C, bool)
    keep[i0:i0 + 8] = False
    Hkk = HM[np.ix_(keep, keep)]
    Hkb = HM[np.ix_(keep, ~keep)]
    Hbb = HM[np.ix_(~keep, ~keep)]
    bk, bb = bM[keep], bM[~keep]
    Hs = Hkk - Hkb @ np.linalg.inv(Hbb) @ Hkb.T
    bs = bk - Hkb @ np.linalg.inv(Hbb) @ bb

    HM_new, bM_new = ba_solve.marginalize_frame_prior(
        jnp.asarray(HM, jnp.float32), jnp.asarray(bM, jnp.float32), slot, F
    )
    HM_new = np.asarray(HM_new)
    bM_new = np.asarray(bM_new)
    np.testing.assert_allclose(HM_new[np.ix_(keep, keep)], Hs, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(bM_new[keep], bs, rtol=2e-2, atol=2e-2)
    # Marginalized rows/cols zeroed.
    np.testing.assert_allclose(HM_new[~keep], 0.0, atol=1e-6)
    np.testing.assert_allclose(bM_new[~keep], 0.0, atol=1e-6)


def test_nullspace_projection_removes_gauge():
    rng = np.random.default_rng(3)
    F = 4
    C = cdim(F)
    R_list, t_list = [], []
    for _ in range(F):
        xi = jnp.asarray(rng.normal(0, 0.3, 6), jnp.float32)
        R, t = lie.se3_exp(xi)
        R_list.append(R)
        t_list.append(t)
    frames = BAFrames(
        R_cw=jnp.stack(R_list), t_cw=jnp.stack(t_list),
        aff=jnp.zeros((F, 2)),
        R0_cw=jnp.stack(R_list), t0_cw=jnp.stack(t_list),
        aff0=jnp.zeros((F, 2)),
        mask=jnp.ones(F, bool),
    )
    N = ba_solve.nullspaces(frames, F)
    assert N.shape == (C, 7)
    # A pure-gauge step is annihilated.
    g = jnp.asarray(rng.normal(0, 1.0, 7), jnp.float32)
    dx_gauge = N @ g
    out = ba_solve.orthogonalize_step(dx_gauge, N)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-3)
    # A step orthogonal to the gauge directions is preserved.
    dx = jnp.asarray(rng.normal(0, 1.0, C), jnp.float32)
    dx_perp = dx - N @ jnp.linalg.solve(N.T @ N + 1e-9 * jnp.eye(7), N.T @ dx)
    out2 = ba_solve.orthogonalize_step(dx_perp, N)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(dx_perp),
                               rtol=1e-3, atol=1e-3)


def test_nullspace_annihilates_photometric_gradient():
    """The gauge directions really are nullspaces of the photometric system:
    moving all frames by a global transform does not change relative poses,
    so H @ N ~ 0 for the frame-pose block of an active system."""
    from dmvio_tpu.ops import residuals as res_mod
    from tests.test_residuals import make_scene

    calib, images, frames, points, pair_mask = make_scene(seed=5, F=3, P=24)
    lin = res_mod.linearize(frames, points, calib, images, pair_mask)
    sys = ba_solve.accumulate(lin, points.host, 3)
    N = ba_solve.nullspaces(frames, 3)
    H = np.asarray(sys.H, np.float64)
    scale = np.abs(H).max()
    # SE3 gauge columns annihilate the frame block directly.
    HN = H @ np.asarray(N, np.float64)
    assert np.abs(HN[:, :6]).max() < 1e-4 * max(scale, 1.0)
    # The scale gauge direction co-scales the idepths, which live in the
    # point block — it is a nullspace of the SCHUR-COMPLEMENTED system.
    H_fd = np.asarray(sys.H_fd, np.float64)
    H_dd = np.asarray(sys.H_dd, np.float64)
    H_sc = H - H_fd.T @ (H_fd / H_dd[:, None])
    HscN = H_sc @ np.asarray(N, np.float64)
    assert np.abs(HscN[:, 6]).max() < 1e-3 * max(scale, 1.0)


def test_accumulate_blockwise_matches_dense():
    """Blockwise normal-equation assembly == dense full-Jacobian assembly.

    `accumulate` builds H/b/H_fd from per-pair 8x8 blocks placed by
    target/host index; `accumulate_dense` materializes the scattered
    [F,P,K,C] Jacobian (the reference-equivalent form). Same system, bit-
    for-bit up to f32 summation order."""
    from dmvio_tpu.ops import residuals as res_mod
    from tests.test_residuals import make_scene

    calib, images, frames, points, pair_mask = make_scene(seed=7, F=4, P=40)
    lin = res_mod.linearize(frames, points, calib, images, pair_mask)
    fast = ba_solve.accumulate(lin, points.host, 4)
    dense = ba_solve.accumulate_dense(lin, points.host, 4)
    scale = float(jnp.max(jnp.abs(dense.H))) + 1e-9
    np.testing.assert_allclose(np.asarray(fast.H), np.asarray(dense.H),
                               rtol=1e-4, atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(fast.b), np.asarray(dense.b),
                               rtol=1e-4,
                               atol=1e-4 * float(jnp.max(jnp.abs(dense.b)) + 1e-9))
    np.testing.assert_allclose(np.asarray(fast.H_fd), np.asarray(dense.H_fd),
                               rtol=1e-4,
                               atol=1e-4 * float(jnp.max(jnp.abs(dense.H_fd)) + 1e-9))
    np.testing.assert_allclose(np.asarray(fast.H_dd), np.asarray(dense.H_dd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fast.b_d), np.asarray(dense.b_d),
                               rtol=1e-5, atol=1e-5)
