"""Tutorial 02: field-level ray tracing sharded over a device mesh.

reference: tutorials/02_heliostat_raytracing_distributed_tutorial.py. The
reference shards heliostat groups and rays over torch.distributed ranks;
here a ``jax.sharding.Mesh`` with axes ``("heliostats", "rays")`` shards the
active-sample and ray axes, and XLA inserts the collectives. Run with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``
for a virtual 8-device mesh, or on a real TPU slice unchanged.
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import pathlib

import numpy as np
import jax
import jax.numpy as jnp

from artist_tpu.field import heliostat_group as hg
from artist_tpu.field.solar_tower import get_centers_of_target_areas
from artist_tpu.parallel import make_mesh, ray_sharding, sample_sharding
from artist_tpu.raytracing import RenderConfig, trace_rays
from artist_tpu.raytracing.render import get_bitmaps_per_target
from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.util.logging_utils import (
    enable_compilation_cache,
    set_logger_config,
)

set_logger_config()
enable_compilation_cache()  # reruns skip the remote TPU compiles

scenario_path = pathlib.Path(
    "/root/reference/tests/data/scenarios/test_scenario_paint_four_heliostats.h5"
)
scenario = load_scenario_from_hdf5(
    scenario_path, number_of_surface_points_per_facet=(25, 25)
)

devices = jax.devices()
ray_shards = 2 if len(devices) % 2 == 0 and len(devices) > 1 else 1
mesh = make_mesh(devices, shape=(len(devices) // ray_shards, ray_shards))
print(f"Mesh: {mesh.devices.shape} axes {mesh.axis_names}")

total_flux_per_target = None
for group_index, group in enumerate(scenario.heliostat_groups):
    num = group.number_of_heliostats
    # Pad the active-sample axis to a multiple of the heliostat mesh axis so
    # shards stay equal (the reference leaves excess ranks idle instead,
    # artist/raytracing/sampling.py:88-157).
    shards = mesh.devices.shape[0]
    padded = ((num + shards - 1) // shards) * shards
    mask = np.zeros(padded, np.int32)
    mask[:num] = 1

    active = hg.gather_active(
        group, np.minimum(np.arange(padded, dtype=np.int32), num - 1)
    )
    target_indices = jnp.zeros(padded, dtype=jnp.int32)
    incident = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0, 0.0], jnp.float32), (padded, 4)
    )
    aim = get_centers_of_target_areas(scenario.solar_tower, target_indices)
    points, normals, _, _ = hg.align_surfaces_with_incident_ray_directions(
        active, aim, incident
    )

    sun = scenario.light_sources[0]
    distortions_u, distortions_e = sun.get_distortions(
        jax.random.PRNGKey(7 + group_index), points.shape[1], padded
    )

    # Shard the sample axis over "heliostats" and the ray axis over "rays".
    points = jax.device_put(points, sample_sharding(mesh))
    normals = jax.device_put(normals, sample_sharding(mesh))
    distortions_u = jax.device_put(distortions_u, ray_sharding(mesh))
    distortions_e = jax.device_put(distortions_e, ray_sharding(mesh))

    flux, intercept, on_target, _ = trace_rays(
        tower=scenario.solar_tower,
        aligned_surface_points=points,
        aligned_surface_normals=normals,
        incident_ray_directions=incident,
        target_area_indices=target_indices,
        distortions_u=distortions_u,
        distortions_e=distortions_e,
        config=RenderConfig(bitmap_resolution=(256, 256)),
    )
    # Drop padding and sum per target (psum over the mesh happens inside the
    # sharded computation automatically).
    flux = flux[:num]
    per_target = get_bitmaps_per_target(
        flux, target_indices[:num], scenario.solar_tower.number_of_target_areas
    )
    total_flux_per_target = (
        per_target
        if total_flux_per_target is None
        else total_flux_per_target + per_target
    )
    print(
        f"Group {group_index}: {num} heliostats, mean intercept "
        f"{float(jnp.mean(intercept[:num])):.3f}"
    )

print(
    "Total flux per target:",
    np.asarray(jnp.sum(total_flux_per_target, axis=(1, 2))),
)
