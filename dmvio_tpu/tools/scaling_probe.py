"""Directional scaling evidence for the sharded window BA.

Real multi-chip hardware is not reachable from this environment (one TPU
chip behind a tunnel), and the 8 virtual CPU devices share one host's
cores — wall-clock there measures the threadpool, not scaling. What CAN
be measured honestly is the per-device program XLA compiles under GSPMD:
its FLOPs and bytes shrink with the point-axis sharding, which is the
quantity that rides each chip at deployment. This probe compiles the
production BA at the reference operating point (512x512, P=2048, F=8)
for 1 device and for the full virtual mesh and prints XLA's own cost
analysis for both.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORM_NAME=cpu python -m dmvio_tpu.tools.scaling_probe [n]
"""

from __future__ import annotations

import sys


def main(argv=None):
    args = list(argv if argv is not None else sys.argv[1:])
    n = int(args[0]) if args else 8

    import jax

    import __graft_entry__ as g
    from dmvio_tpu.models import ba
    from dmvio_tpu.parallel import dist_ba

    problem, images = g._tiny_problem(P=2048, F=8, H=512, W=512)
    step = jax.jit(lambda p, im: ba.optimize(p, im, max_iters=2))
    c1 = step.lower(problem, images).compile().cost_analysis()
    placer = dist_ba.Placer(dist_ba.make_mesh(n))
    cn = step.lower(placer.place_ba(problem),
                    placer.place_images(images)).compile().cost_analysis()
    for k in ("flops", "bytes accessed"):
        v1, vn = c1.get(k), cn.get(k)
        if v1 and vn:
            print(f"{k}: 1-dev {v1:.3e}  {n}-dev(per-device) {vn:.3e}  "
                  f"ratio {v1 / vn:.2f}x (ideal {n}x)")


if __name__ == "__main__":
    main()
