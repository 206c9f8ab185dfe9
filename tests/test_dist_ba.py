"""Distributed BA correctness: sharded result == single-device result.

Runs on the 8 virtual CPU devices configured in conftest.py; on real
hardware the same program maps onto ICI/DCN."""

import jax
import numpy as np
import pytest

from dmvio_tpu.parallel import dist_ba


@pytest.fixture(scope="module")
def tiny():
    import __graft_entry__ as ge

    return ge._tiny_problem(P=512)


def test_mesh_shapes():
    m = dist_ba.make_mesh(8)
    assert m.devices.size == 8
    assert m.axis_names == ("dp", "mp")


def test_sharded_matches_single(tiny):
    problem, images = tiny
    single = jax.jit(
        lambda pr, im: __import__(
            "dmvio_tpu.models.ba", fromlist=["ba"]).optimize(
                pr, im, max_iters=3))(problem, images)
    mesh = dist_ba.make_mesh(8)
    dist = dist_ba.optimize_dist(problem, images, mesh, max_iters=3)

    np.testing.assert_allclose(float(dist.energy), float(single.energy),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(dist.frames.t_cw),
                               np.asarray(single.frames.t_cw),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(dist.points.idepth),
                               np.asarray(single.points.idepth),
                               rtol=5e-3, atol=1e-4)


def test_sharded_two_devices(tiny):
    problem, images = tiny
    mesh = dist_ba.make_mesh(2)
    out = dist_ba.optimize_dist(problem, images, mesh, max_iters=2)
    assert np.isfinite(float(out.energy))
