"""Tutorial 01: align a single heliostat and render its flux bitmap.

reference: tutorials/01_single_heliostat_raytracing_tutorial.py.
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
from artist_tpu.raytracing import RenderConfig, trace_rays
from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.util.logging_utils import (
    enable_compilation_cache,
    set_logger_config,
)

set_logger_config()
enable_compilation_cache()  # reruns skip the remote TPU compiles

scenario_path = pathlib.Path(
    "/root/reference/tests/data/scenarios/test_scenario_paint_single_heliostat.h5"
)

# Load the scenario (NURBS surfaces are sampled at load time).
scenario = load_scenario_from_hdf5(
    scenario_path, number_of_surface_points_per_facet=(50, 50)
)

# Inspect the scenario.
group = scenario.heliostat_groups[0]
print(f"The light source is a {type(scenario.light_sources[0]).__name__}.")
print(f"Target index mapping: {scenario.solar_tower.target_name_to_index}.")
print(f"The first heliostat is {group.names[0]} at {group.positions[0].tolist()}.")

# Activate the single heliostat once (a mask value of k duplicates it k times,
# which is how calibration samples are batched).
active_heliostats_mask = np.array([1], dtype=np.int32)
active = hg.gather_active(
    group, hg.active_indices_from_mask(active_heliostats_mask)
)

# Aim at target area 0 with the sun in the south.
target_area_indices = jnp.zeros(1, dtype=jnp.int32)
incident_ray_directions = jnp.asarray([[0.0, 1.0, 0.0, 0.0]], dtype=jnp.float32)
aim_points = get_centers_of_target_areas(scenario.solar_tower, target_area_indices)

# Align: inverse kinematics solves the motor positions, forward kinematics
# orients the surface.
points, normals, orientations, motor_positions = (
    hg.align_surfaces_with_incident_ray_directions(
        active, aim_points, incident_ray_directions
    )
)
print(f"Solved motor positions: {np.asarray(motor_positions)}")

# Sample sun distortions and trace.
sun = scenario.light_sources[0]
distortions_u, distortions_e = sun.get_distortions(
    jax.random.PRNGKey(7), points.shape[1], 1
)
flux, intercept, on_target, blocking = trace_rays(
    tower=scenario.solar_tower,
    aligned_surface_points=points,
    aligned_surface_normals=normals,
    incident_ray_directions=incident_ray_directions,
    target_area_indices=target_area_indices,
    distortions_u=distortions_u,
    distortions_e=distortions_e,
    config=RenderConfig(bitmap_resolution=(256, 256)),
)
print(
    f"Total flux {float(jnp.sum(flux)):.1f}, intercept factor "
    f"{float(intercept[0]):.3f}, on-target factor {float(on_target[0]):.3f}"
)

try:
    import matplotlib.pyplot as plt

    output = pathlib.Path("/tmp/artist_tpu_tutorials/flux_01.png")
    output.parent.mkdir(parents=True, exist_ok=True)
    plt.imshow(np.asarray(flux[0]), cmap="inferno")
    plt.title(f"Flux of {group.names[0]}")
    plt.colorbar()
    plt.savefig(output, dpi=150)
    print(f"Flux image saved to {output}.")
except ImportError:
    pass
