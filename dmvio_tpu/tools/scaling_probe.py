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
    JAX_PLATFORM_NAME=cpu python -m dmvio_tpu.tools.scaling_probe \
        [n] [P=2048] [F=8]

P=/F= probe shapes BEYOND the reference's operating point (its window is
capped at 7 KFs for CPU reasons, settings.cpp:99-100): the sharded BA's
whole payoff is that a bigger window's extra cost rides the mesh —
SURVEY.md §7 S6 "then scale the window".
"""

from __future__ import annotations

import sys


def main(argv=None):
    args = list(argv if argv is not None else sys.argv[1:])
    pos = [a for a in args if "=" not in a]
    kv = dict(a.split("=", 1) for a in args if "=" in a)
    n = int(pos[0]) if pos else 8
    P = int(kv.get("P", 2048))
    F = int(kv.get("F", 8))

    import jax

    import __graft_entry__ as g
    from dmvio_tpu.models import ba
    from dmvio_tpu.parallel import dist_ba

    problem, images = g._tiny_problem(P=P, F=F, H=512, W=512)
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
