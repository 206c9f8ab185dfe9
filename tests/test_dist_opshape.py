"""Sharded window programs at the PRODUCTION operating point.

The other distributed tests shard small shapes (128x160, P=256, F=6);
this one runs the reference operating point — 512x512 images, P=2048
active points, F=8 window (settings.cpp:93-103, BENCH's config) — over
the 8-device virtual mesh, for both the visual BA and the EXTENDED
visual-inertial BA, and checks agreement with the single-device dispatch.
Slow (builds 8 rendered 512x512 pyramids); marked accordingly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

P, F, H, W = 2048, 8, 512, 512


@pytest.fixture(scope="module")
def op_problem():
    import __graft_entry__ as g

    return g._tiny_problem(P=P, F=F, H=H, W=W)


def test_visual_ba_sharded_matches_at_op_shape(op_problem):
    from dmvio_tpu.models import ba
    from dmvio_tpu.parallel import dist_ba

    problem, images = op_problem
    res_1 = ba.optimize_jit(problem, images, max_iters=2)
    placer = dist_ba.Placer(dist_ba.make_mesh(8))
    res_m = placer.gather(ba.optimize_jit(
        placer.place_ba(problem), placer.place_images(images),
        max_iters=2))
    np.testing.assert_allclose(float(res_m.energy), float(res_1.energy),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(res_m.frames.t_cw),
                               np.asarray(res_1.frames.t_cw), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_m.points.idepth),
                               np.asarray(res_1.points.idepth),
                               rtol=5e-3, atol=1e-4)


def test_vio_ba_sharded_matches_at_op_shape(op_problem):
    """The EXTENDED system (visual + inertial states + KF-to-KF pairs) at
    the operating shape, sharded vs single-device."""
    from dmvio_tpu.models import vio_ba
    from dmvio_tpu.ops import preint
    from dmvio_tpu.parallel import dist_ba

    problem, images = op_problem
    C = vio_ba.cdim_ext(F)
    st = vio_ba.empty_vio_states(F)._replace(
        v=jnp.tile(jnp.asarray([0.1, -0.05, 0.02], jnp.float32), (F, 1)),
        v0=jnp.tile(jnp.asarray([0.1, -0.05, 0.02], jnp.float32), (F, 1)))
    Q = F - 1
    pres = [preint.identity_preint(jnp.zeros(6))._replace(
        dt=jnp.asarray(0.15, jnp.float32),
        cov=jnp.eye(9, dtype=jnp.float32) * 1e-4) for _ in range(Q)]
    pre_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
    pairs = vio_ba.IMUPairs(
        pre=pre_b,
        i=jnp.arange(Q, dtype=jnp.int32),
        j=jnp.arange(1, Q + 1, dtype=jnp.int32),
        valid=jnp.ones(Q, bool))
    prior = np.zeros(C, np.float32)
    prior[:problem.prior_diag.shape[0]] = np.asarray(problem.prior_diag)
    vproblem = vio_ba.VIOProblem(
        base=problem, states=st, pairs=pairs,
        HM=jnp.zeros((C, C), jnp.float32), bM0=jnp.zeros(C, jnp.float32),
        prior_diag=jnp.asarray(prior),
        R_cb=jnp.eye(3), t_cb=jnp.zeros(3), imu_on=jnp.asarray(True))

    res_1 = vio_ba.optimize_jit(vproblem, images, max_iters=2)
    placer = dist_ba.Placer(dist_ba.make_mesh(8))
    res_m = placer.gather(vio_ba.optimize_jit(
        placer.place_vio(vproblem), placer.place_images(images),
        max_iters=2))
    np.testing.assert_allclose(float(res_m.energy), float(res_1.energy),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(res_m.frames.t_cw),
                               np.asarray(res_1.frames.t_cw), atol=1e-4)
    # Scale is un-pinned in this synthetic problem (no activation prior),
    # so the psum reduction-order difference shows up here first.
    np.testing.assert_allclose(np.asarray(res_m.states.s_log),
                               np.asarray(res_1.states.s_log), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res_m.points.idepth),
                               np.asarray(res_1.points.idepth),
                               rtol=5e-3, atol=1e-4)
