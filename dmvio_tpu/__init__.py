"""dmvio_tpu: a TPU-native visual-inertial odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of DM-VIO
(delayed-marginalization visual-inertial odometry, RA-L 2022, built on DSO):

- coarse-to-fine direct photometric image alignment on image pyramids,
- sliding-window sparse photometric bundle adjustment (8-pixel patch
  residuals, Gauss-Newton/LM with Schur complement on point inverse depths,
  First-Estimate Jacobians),
- IMU preintegration factors fused into tracking and BA,
- delayed marginalization with a replayable second factor graph,
- pose-graph bundle adjustment (PGBA) for online IMU initialization.

The design is arrays-and-batch functional: fixed-capacity structure-of-array
window state with validity masks, hot loops as batched XLA/Pallas programs,
small dense solves in jax.numpy, and multi-chip scaling via
jax.sharding/shard_map with psum-reduced camera systems.
"""

__version__ = "0.1.0"
