"""Compiled-memory report for a render-step configuration.

Sizes the differentiable render step's device memory (XLA's own
allocation analysis of the compiled executable) for a given field
configuration, so operators can pick ``ray_chunk`` / ``heliostat_chunk``
before a plant-scale run OOMs at step time:

    python tools/memory_report.py --heliostats 4000 --rays 2 \
        --heliostat-chunk 500 [--blocking]

On CPU (JAX_PLATFORMS=cpu) the numbers reflect the CPU backend's layout -
indicative, not authoritative; run against the real TPU for HBM truth.
Measured reference points (v5e, 16 GB): 2,000 heliostats x 4 rays = 8.4 GB
temp un-chunked; 4,000 x 2 requests 20.5 GB un-chunked and fits
comfortably at heliostat_chunk=500 (docs/performance.md, "Plant scale").
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    parser = argparse.ArgumentParser(
        description="XLA memory analysis of the differentiable render step"
    )
    parser.add_argument("--heliostats", type=int, default=100)
    parser.add_argument("--rays", type=int, default=32)
    parser.add_argument("--surface-points", type=int, default=50)
    parser.add_argument("--ray-chunk", type=int, default=4)
    parser.add_argument("--heliostat-chunk", type=int, default=0)
    parser.add_argument("--blocking", action="store_true")
    parser.add_argument("--candidates", type=int, default=16)
    args = parser.parse_args()

    os.environ["BENCH_SURFACE_POINTS"] = str(args.surface_points)
    import bench  # noqa: E402  (reads env at import)

    from artist_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    step, step_args, rays = bench._build_step(
        blocking=args.blocking,
        heliostats=args.heliostats,
        rays=args.rays,
        ray_chunk=args.ray_chunk,
        candidates=args.candidates if args.blocking else None,
        heliostat_chunk=args.heliostat_chunk or None,
    )
    compiled = step.lower(*step_args).compile()
    analysis = compiled.memory_analysis()
    gib = 1024.0**3
    print(
        f"{args.heliostats} heliostats x {args.rays} rays x "
        f"{args.surface_points}^2 x4 points ({rays / 1e6:.1f}M rays), "
        f"blocking={'ON K=' + str(args.candidates) if args.blocking else 'off'}, "
        f"ray_chunk={args.ray_chunk}, "
        f"heliostat_chunk={args.heliostat_chunk or 'off'}:"
    )
    print(
        f"  arguments {analysis.argument_size_in_bytes / gib:.2f} GiB, "
        f"temporaries {analysis.temp_size_in_bytes / gib:.2f} GiB, "
        f"outputs {analysis.output_size_in_bytes / gib:.2f} GiB"
    )
    total = (
        analysis.argument_size_in_bytes
        + analysis.temp_size_in_bytes
        + analysis.output_size_in_bytes
    )
    print(f"  total ~{total / gib:.2f} GiB (v5e HBM: 16 GiB)")


if __name__ == "__main__":
    main()
