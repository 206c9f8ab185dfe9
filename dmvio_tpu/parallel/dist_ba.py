"""Distributed windowed bundle adjustment over a TPU device mesh.

The reference's only parallelism is a 6-worker thread pool map-reducing
residual ranges on one CPU (IndexThreadReduce.h:80-146, used from
FullSystemOptimize.cpp:162 and EnergyFunctional.cpp:205-264). The TPU-native
equivalent scales the same axis — residuals/points, the only axis that grows
— across chips and hosts instead of threads:

  * POINTS shard over the mesh (both axes: a 2D host x chip mesh maps the
    point axis onto ICI first, DCN second).
  * FRAMES, images, the camera-system prior, and the solve replicate — the
    reduced camera system is ~(8F+4)^2, tiny next to the residual work.
  * The per-device partial camera Hessians J^T W J meet in an all-reduce
    that XLA/GSPMD inserts automatically at the sharded-matmul boundary
    (psum over the mesh): the "stitch" of AccumulatedTopHessian
    (AccumulatedTopHessian.h:85-139) becomes one collective.
  * Per-point state (inverse depth, its Schur block H_dd, and the
    back-substituted idepth steps, EnergyFunctional.cpp:267-321) never
    leaves its shard — zero communication for the point side.

No NCCL/MPI and no explicit collective calls: `jax.jit` over a
`jax.sharding.Mesh` with in_shardings does all placement, and the same
program runs on 1 chip, one host's 4 chips, or a multi-host slice (where
the dp axis rides DCN). Use `make_mesh` + `optimize_dist`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dmvio_tpu.models import ba


def make_mesh(n_devices: int, name_a: str = "dp", name_b: str = "mp") -> Mesh:
    """2D (host-like x chip-like) mesh over the first n devices."""
    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())} "
            "(set --xla_force_host_platform_device_count for virtual runs)")
    if n_devices % 2 == 0:
        shape = (n_devices // 2, 2)
    else:
        shape = (n_devices, 1)
    devs = np.asarray(jax.devices()[:n_devices]).reshape(shape)
    return Mesh(devs, (name_a, name_b))


def shard_problem(problem: ba.BAProblem, images, mesh: Mesh):
    """Place a BAProblem on the mesh: points sharded, frames replicated.

    The point count must divide evenly by the mesh size (pad with masked
    slots if needed — capacities are powers of two throughout)."""
    pt_axes = tuple(mesh.axis_names)
    rep = NamedSharding(mesh, P())

    def shard_points(x):
        spec = P(pt_axes, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    def replicate(x):
        return jax.device_put(x, rep)

    points = jax.tree_util.tree_map(shard_points, problem.points)
    pair_mask = jax.device_put(
        problem.pair_mask, NamedSharding(mesh, P(None, pt_axes)))
    frames = jax.tree_util.tree_map(replicate, problem.frames)
    problem = problem._replace(
        frames=frames, points=points, pair_mask=pair_mask,
        HM=replicate(problem.HM), bM0=replicate(problem.bM0),
        prior_diag=replicate(problem.prior_diag),
        calib0=replicate(problem.calib0),
        calib=jax.tree_util.tree_map(replicate, problem.calib),
    )
    return problem, replicate(images)


def optimize_dist(problem: ba.BAProblem, images, mesh: Mesh,
                  max_iters: int = 6) -> ba.BAResult:
    """Sharded windowed BA: same program as ba.optimize, placed on `mesh`.

    GSPMD propagates the input shardings through linearize/accumulate and
    inserts the camera-system all-reduce; results match the single-device
    optimizer bit-for-bit up to reduction order."""
    problem, images = shard_problem(problem, images, mesh)
    with mesh:
        step = jax.jit(lambda pr, im: ba.optimize(pr, im,
                                                  max_iters=max_iters))
        return step(problem, images)
