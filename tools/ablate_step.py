"""Device-time decomposition of the bench step by ablation (pipelined timing)."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from artist_tpu.field import heliostat_group as hg
from artist_tpu.field.solar_tower import get_centers_of_target_areas
from artist_tpu.nurbs import create_nurbs_evaluation_grid, evaluate_nurbs_surfaces
from artist_tpu.optim import losses
from artist_tpu.raytracing import RenderConfig, trace_rays
from artist_tpu.scenario.synthetic import make_synthetic_scenario
from artist_tpu.util import enable_compilation_cache

enable_compilation_cache()

scenario = make_synthetic_scenario(
    number_of_heliostats=100,
    number_of_surface_points_per_facet=(50, 50),
    number_of_rays=32,
)
group = scenario.heliostat_groups[0]
tower = scenario.solar_tower
num = group.number_of_heliostats
num_points = group.surface_points.shape[1]
active_indices = jnp.arange(num, dtype=jnp.int32)
target_indices = jnp.zeros(num, dtype=jnp.int32)
incident = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0, 0.0], jnp.float32), (num, 4))
aim_points = get_centers_of_target_areas(tower, target_indices)
du, de = scenario.light_sources[0].get_distortions(jax.random.PRNGKey(7), num_points, num)
gt = jnp.ones((num, 256, 256), jnp.float32)
# ABLATE_BLOCK_WINDOW=96 measures the dynamic-window splat formulation.
_BLOCK_WINDOW = int(os.environ.get("ABLATE_BLOCK_WINDOW", 0))
config = RenderConfig(
    bitmap_resolution=(256, 256),
    ray_chunk=4,
    splat_block_window=_BLOCK_WINDOW or None,
    splat_point_layout=(50, 50, 4) if _BLOCK_WINDOW else None,
)
RAYS = num * du.shape[1] * num_points


def loss_fn(control_points, group, du, de, gt, *, nurbs=True, splat=True):
    active = hg.gather_active(
        group.replace(nurbs_control_points=control_points), active_indices
    )
    if nurbs:
        points, normals = evaluate_nurbs_surfaces(
            active.nurbs_control_points,
            group.nurbs_degrees,
            create_nurbs_evaluation_grid((50, 50)),
            canting=active.canting,
            facet_translations=active.facet_translations,
        )
        active = active.replace(
            surface_points=points.reshape(num, -1, 4),
            surface_normals=normals.reshape(num, -1, 4),
        )
    aligned_points, aligned_normals, _, _ = (
        hg.align_surfaces_with_incident_ray_directions(active, aim_points, incident)
    )
    if not splat:
        return jnp.mean(aligned_points) + jnp.mean(aligned_normals) + jnp.mean(du) + jnp.mean(de)
    flux, _, _, _ = trace_rays(
        tower=tower,
        aligned_surface_points=aligned_points,
        aligned_surface_normals=aligned_normals,
        incident_ray_directions=incident,
        target_area_indices=target_indices,
        distortions_u=du,
        distortions_e=de,
        config=config,
    )
    return jnp.mean(losses.kl_divergence_loss(flux, gt))


def timeit(fn, args, label, steps=15):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    t = (time.perf_counter() - start) / steps
    print(f"{label:30s} {t*1e3:8.1f} ms   ({RAYS/t/1e6:8.1f} M rays/s)", flush=True)
    return t


# NOTE: do NOT add an "ablate NURBS" variant that drops evaluate_nurbs_surfaces
# while still differentiating w.r.t. control points: the loss then no longer
# depends on them, XLA dead-code-eliminates the ENTIRE backward pass, and the
# "fwd+bwd" number silently measures forward-only (measured: 36.7 vs 36.9 ms).
args = (group.nurbs_control_points, group, du, de, gt)
full = jax.jit(jax.value_and_grad(functools.partial(loss_fn, nurbs=True, splat=True)))
fwd = jax.jit(functools.partial(loss_fn, nurbs=True, splat=True))
geom_only = jax.jit(jax.value_and_grad(functools.partial(loss_fn, nurbs=True, splat=False)))

t_full = timeit(full, args, "full fwd+bwd")
t_fwd = timeit(fwd, args, "forward only")
t_geo = timeit(geom_only, args, "fwd+bwd, trace+splat ablated")
print(f"\nbwd share              : {(t_full-t_fwd)*1e3:7.1f} ms")
print(f"trace+splat share      : {(t_full-t_geo)*1e3:7.1f} ms")
print(f"NURBS+alignment fwd+bwd: {t_geo*1e3:7.1f} ms")
