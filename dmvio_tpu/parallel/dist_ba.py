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
    """2D (host-like x chip-like) mesh over the first n devices.

    Under a multi-process runtime (jax.distributed.initialize via
    parallel/dist_init.py, jax.process_count() > 1) the mesh spans the
    WHOLE slice with the dp axis along processes — collectives over dp
    ride DCN, over mp ride ICI — and n_devices must be 0 (= all) or the
    global device count: cross-host GSPMD requires every process to run
    the identical program over the identical mesh."""
    devs_all = jax.devices()
    n_proc = jax.process_count()
    if n_proc > 1:
        n_local = len(devs_all) // n_proc
        if n_devices not in (0, len(devs_all)):
            raise RuntimeError(
                f"multi-process mesh must span all {len(devs_all)} global "
                f"devices (got n_devices={n_devices}; pass 0 for 'all')")
        devs = np.asarray(
            sorted(devs_all, key=lambda d: (d.process_index, d.id))
        ).reshape(n_proc, n_local)
        return Mesh(devs, (name_a, name_b))
    if n_devices == 0:
        n_devices = len(devs_all)
    if len(devs_all) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devs_all)} "
            "(set --xla_force_host_platform_device_count for virtual runs)")
    if n_devices % 2 == 0:
        shape = (n_devices // 2, 2)
    else:
        shape = (n_devices, 1)
    devs = np.asarray(devs_all[:n_devices]).reshape(shape)
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
    optimizer up to reduction order. Uses the module-level ba.optimize_jit
    — jit is sharding-polymorphic, so the sharded variant compiles once
    per input-sharding signature and is cached across calls."""
    problem, images = shard_problem(problem, images, mesh)
    return ba.optimize_jit(problem, images, max_iters=max_iters)


class Placer:
    """Places the pipeline's heavy point-axis programs on a device mesh.

    FullSystem routes its BA / point-marginalization dispatches through
    one of these when Config.mesh_devices > 1: inputs are placed (points
    and [F, P] incidence sharded over the mesh, frames / images / priors
    replicated), the SAME module-level jitted programs run under GSPMD,
    and the small results are gathered back to the home device where the
    rest of the window state lives. jit caches one sharded executable per
    input-sharding signature, so after the first keyframe the only
    per-call cost is placement:

      * point arrays: O(P) scatters, ~100 KB — negligible;
      * level-0 image stack: one ~F*3*H*W broadcast per KEYFRAME (cached
        by array identity — BA + both marginalization programs of the
        same keyframe reuse it), riding ICI on real hardware;
      * gathered results: the reduced camera system (~(8F+4)^2) and the
        [F, P] outlier/drop masks.

    This is the reference's only parallel axis (residual ranges over
    IndexThreadReduce workers) mapped onto chips instead of threads; per
    -point Schur state never leaves its shard.
    """

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        axes = tuple(mesh.axis_names)
        self._pt = NamedSharding(mesh, P(axes))          # [P, ...] leaves
        self._pair = NamedSharding(mesh, P(None, axes))  # [F, P] leaves
        self._rep = NamedSharding(mesh, P())
        # Multi-process (jax.distributed): placements become global arrays
        # (jax.device_put from identical per-host values is supported) and
        # gather() must route through collectives — a remote shard is not
        # addressable from this host.
        self._multiproc = jax.process_count() > 1
        self._home = jax.local_devices()[0]
        self._img_key = None
        self._img_placed = None

    # -- leaf placement helpers -----------------------------------------
    def _shard_points(self, pts):
        return jax.tree_util.tree_map(
            lambda x: self._put(x, self._pt), pts)

    def _put(self, x, sharding):
        """device_put that also works under a multi-process runtime.

        Committed process-local arrays cannot be device_put onto a global
        (partly non-addressable) sharding; every process holds the
        identical value (SPMD host pipeline), so place from host memory
        instead — jax accepts numpy inputs for global shardings by
        slicing each process's addressable shards locally. Already-global
        arrays with the right sharding pass through untouched."""
        if self._multiproc and isinstance(x, jax.Array):
            if not x.is_fully_addressable:
                return x if x.sharding == sharding \
                    else jax.device_put(x, sharding)
            x = np.asarray(x)
        return jax.device_put(x, sharding)

    def replicate(self, tree):
        return jax.tree_util.tree_map(
            lambda x: self._put(x, self._rep), tree)

    def place_images(self, images):
        """Replicate the window's level-0 image stack (identity-cached:
        jnp arrays are immutable, so id() keys one placement per stack)."""
        if self._img_key != id(images):
            self._img_placed = jax.tree_util.tree_map(
                lambda x: self._put(x, self._rep), images)
            self._img_key = id(images)
        return self._img_placed

    def pair_sharded(self, x):
        """Place an [F, P] mask/array with the point axis sharded."""
        return self._put(x, self._pair)

    def point_sharded(self, x):
        """Place a [P]-leading array sharded over the mesh."""
        return self._put(x, self._pt)

    def place_ba(self, problem: ba.BAProblem):
        """Place a visual window problem: points sharded, rest replicated."""
        return problem._replace(
            frames=self.replicate(problem.frames),
            points=self._shard_points(problem.points),
            calib=self.replicate(problem.calib),
            calib0=self.replicate(problem.calib0),
            HM=self.replicate(problem.HM),
            bM0=self.replicate(problem.bM0),
            prior_diag=self.replicate(problem.prior_diag),
            pair_mask=self.pair_sharded(problem.pair_mask),
        )

    def place_vio(self, problem):
        """Place an extended (visual + inertial) problem: the IMU block is
        frame-axis-sized and replicates; the point axis shards exactly as
        in the visual problem."""
        return problem._replace(
            base=self.place_ba(problem.base),
            states=self.replicate(problem.states),
            pairs=self.replicate(problem.pairs),
            HM=self.replicate(problem.HM),
            bM0=self.replicate(problem.bM0),
            prior_diag=self.replicate(problem.prior_diag),
            R_cb=self.replicate(problem.R_cb),
            t_cb=self.replicate(problem.t_cb),
            imu_on=self.replicate(problem.imu_on),
        )

    def gather(self, tree):
        """Bring results back to the LOCAL home device (where the rest of
        the window state lives, so downstream single-device programs see
        compatible placements).

        Single-process: a device_put off the mesh. Multi-process: remote
        shards are not addressable, so replicated leaves read their local
        replica and point-sharded leaves all-gather across processes
        (one DCN collective per leaf; the gathered results — the reduced
        camera system and per-point scalars — are small)."""
        if not self._multiproc:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._home), tree)
        from jax.experimental import multihost_utils

        def g(x):
            if getattr(x, "is_fully_addressable", True):
                return jax.device_put(x, self._home)
            if getattr(x, "is_fully_replicated", False):
                return jax.device_put(
                    np.asarray(x.addressable_data(0)), self._home)
            return jax.device_put(
                np.asarray(multihost_utils.process_allgather(x, tiled=True)),
                self._home)

        return jax.tree_util.tree_map(g, tree)
