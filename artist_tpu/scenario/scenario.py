"""Scenario: runtime scene root loaded from scenario HDF5 files.

TPU-native re-design of the reference Scenario
(reference: artist/scenario/scenario.py:86-439) and HeliostatField loading
(reference: artist/field/heliostat_field.py:80-435,
artist/io/h5_scenario_parser.py:12-723):

- The HDF5 schema is identical, so reference scenario files load unchanged.
- Loading happens host-side in numpy; device state is a pytree of
  :class:`~artist_tpu.field.heliostat_group.HeliostatGroupState` per
  (kinematics, actuator) group plus a :class:`~artist_tpu.field.solar_tower.SolarTower`.
- Surface points/normals are sampled from the NURBS at load time via the
  jitted TPU evaluation.
"""

from __future__ import annotations

import logging
import pathlib
from collections import defaultdict
from dataclasses import dataclass, field as dataclass_field

import h5py
import jax.numpy as jnp
import numpy as np

from artist_tpu.field.heliostat_group import HeliostatGroupState
from artist_tpu.field.solar_tower import SolarTower
from artist_tpu.geometry.rotations import rotation_angle_and_axis
from artist_tpu.nurbs import create_nurbs_evaluation_grid, evaluate_nurbs_surfaces
from artist_tpu.nurbs.utils import create_planar_nurbs_control_points
from artist_tpu.scene.sun import Sun
from artist_tpu.util import constants, indices

log = logging.getLogger("artist_tpu.scenario")


@dataclass
class Scenario:
    """Runtime scene root.

    reference: artist/scenario/scenario.py:25-103.
    """

    power_plant_position: np.ndarray  # [3] float64 WGS84
    solar_tower: SolarTower
    light_sources: list[Sun]
    heliostat_groups: list[HeliostatGroupState]
    heliostat_group_names: list[str] = dataclass_field(default_factory=list)

    @property
    def number_of_heliostat_groups(self) -> int:
        return len(self.heliostat_groups)

    def index_mapping(
        self,
        heliostat_group: HeliostatGroupState,
        string_mapping: list[tuple[str, str, np.ndarray]] | None = None,
        single_incident_ray_direction: np.ndarray | None = None,
        single_target_area_index: int = 0,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Heliostat/target/incident-direction mapping -> batched arrays.

        Host-side (numpy): produces the multiplicity mask, per-sample target
        indices and incident ray directions, ordered by heliostat position in
        the group. reference: artist/scenario/scenario.py:261-419.

        Returns
        -------
        tuple of np.ndarray
            (active_heliostats_mask [H] int32, target_area_indices [M] int32,
            incident_ray_directions [M, 4] float32).
        """
        if single_incident_ray_direction is None:
            single_incident_ray_direction = np.array(
                [0.0, 1.0, 0.0, 0.0], dtype=np.float32
            )
        single_incident_ray_direction = np.asarray(
            single_incident_ray_direction, dtype=np.float32
        )
        total_number_of_target_areas = self.solar_tower.number_of_target_areas

        if string_mapping is None:
            if (
                single_incident_ray_direction.shape != (4,)
                or abs(single_incident_ray_direction[3]) > 1e-8
                or abs(np.linalg.norm(single_incident_ray_direction[:3]) - 1.0) > 1e-5
            ):
                raise ValueError(
                    "The specified single incident ray direction is invalid. "
                    "Please provide a normalized 4D tensor with last element 0.0."
                )
            if single_target_area_index >= total_number_of_target_areas:
                raise ValueError(
                    f"The specified single target area index is invalid. Only "
                    f"{total_number_of_target_areas} target areas exist in this scenario."
                )
            num = heliostat_group.number_of_heliostats
            return (
                np.ones(num, dtype=np.int32),
                np.full(num, single_target_area_index, dtype=np.int32),
                np.broadcast_to(single_incident_ray_direction, (num, 4)).copy(),
            )

        name_to_index = self.solar_tower.target_name_to_index
        filtered = [m for m in string_mapping if m[0] in heliostat_group.names]
        errors = []
        for i, (_, target_name, light_direction) in enumerate(filtered):
            light_direction = np.asarray(light_direction, dtype=np.float32)
            if target_name not in name_to_index:
                errors.append(
                    f"Invalid target '{target_name}' (Found at index {i} of provided "
                    f"mapping) not found in this scenario."
                )
            if (
                light_direction.shape != (4,)
                or abs(light_direction[3]) > 1e-2
                or abs(np.linalg.norm(light_direction) - 1.0) > 1e-3
            ):
                errors.append(
                    f"Invalid incident ray direction (Found at index {i} of provided "
                    f"mapping). This must be a normalized 4D tensor with last element 0.0."
                )
        if errors:
            raise ValueError(" ".join(errors))

        heliostat_name_to_index = {
            name: i for i, name in enumerate(heliostat_group.names)
        }
        mask = np.zeros(heliostat_group.number_of_heliostats, dtype=np.int32)
        data_per_heliostat = defaultdict(list)
        for heliostat_name, target_name, light_direction in filtered:
            mask[heliostat_name_to_index[heliostat_name]] += 1
            data_per_heliostat[heliostat_name].append(
                (name_to_index[target_name], np.asarray(light_direction, np.float32))
            )
        target_area_indices = np.empty(len(filtered), dtype=np.int32)
        incident_ray_directions = np.empty((len(filtered), 4), dtype=np.float32)
        index = 0
        for name in heliostat_group.names:
            for target_index, direction in data_per_heliostat.get(name, []):
                target_area_indices[index] = target_index
                incident_ray_directions[index] = direction
                index += 1
        return mask, target_area_indices, incident_ray_directions


def get_number_of_heliostat_groups_from_hdf5(scenario_path: pathlib.Path) -> int:
    """reference: artist/scenario/scenario.py:86-102."""
    with h5py.File(scenario_path) as scenario_file:
        return int(scenario_file[constants.number_of_heliostat_groups][()])


def _load_solar_tower(scenario_file: h5py.File) -> SolarTower:
    """reference: artist/field/solar_tower.py:104-127 and the two
    TowerTargetAreas*.from_hdf5 loaders."""
    planar_names, planar_centers, planar_normals, planar_dims = [], [], [], []
    if constants.target_area_planar_key in scenario_file:
        for name, group in scenario_file[constants.target_area_planar_key].items():
            planar_names.append(name)
            planar_centers.append(
                np.asarray(group[constants.target_area_position_center][()], np.float32)
            )
            planar_normals.append(
                np.asarray(
                    group[constants.target_area_normal_vector][()], np.float32
                ).reshape(-1)[:4]
            )
            planar_dims.append(
                [
                    float(group[constants.target_area_plane_e][()]),
                    float(group[constants.target_area_plane_u][()]),
                ]
            )

    cyl_names, cyl_centers, cyl_axes, cyl_normals = [], [], [], []
    cyl_radii, cyl_heights, cyl_angles = [], [], []
    if constants.target_area_cylindrical_key in scenario_file:
        for name, group in scenario_file[constants.target_area_cylindrical_key].items():
            cyl_names.append(name)
            cyl_centers.append(
                np.asarray(group[constants.target_area_cylinder_center][()], np.float32)
            )
            cyl_axes.append(
                np.asarray(group[constants.target_area_cylinder_axis][()], np.float32)
            )
            cyl_normals.append(
                np.asarray(group[constants.target_area_cylinder_normal][()], np.float32)
            )
            cyl_radii.append(float(group[constants.target_area_cylinder_radius][()]))
            cyl_heights.append(float(group[constants.target_area_cylinder_height][()]))
            cyl_angles.append(
                float(group[constants.target_area_cylinder_opening_angle][()])
            )

    def arr(x, shape):
        return (
            jnp.asarray(np.stack(x), dtype=jnp.float32)
            if x
            else jnp.zeros(shape, dtype=jnp.float32)
        )

    return SolarTower(
        planar_centers=arr(planar_centers, (0, 4)),
        planar_normals=arr(planar_normals, (0, 4)),
        planar_dimensions=arr(planar_dims, (0, 2)),
        cylindrical_centers=arr(cyl_centers, (0, 4)),
        cylindrical_axes=arr(cyl_axes, (0, 4)),
        cylindrical_normals=arr(cyl_normals, (0, 4)),
        cylindrical_radii=arr(cyl_radii, (0,)),
        cylindrical_heights=arr(cyl_heights, (0,)),
        cylindrical_opening_angles=arr(cyl_angles, (0,)),
        planar_names=tuple(planar_names),
        cylindrical_names=tuple(cyl_names),
    )


def _load_light_sources(scenario_file: h5py.File) -> list[Sun]:
    """reference: artist/scene/light_source_array.py + artist/scene/sun.py:121-197."""
    from artist_tpu.util.type_registry import light_source_type_mapping

    sources = []
    for name, group in scenario_file[constants.light_source_key].items():
        light_source_type = group[constants.light_source_type][()].decode("utf-8")
        if light_source_type not in light_source_type_mapping:
            raise ValueError(f"Unknown light source type: {light_source_type}")
        light_source_cls = light_source_type_mapping[light_source_type]
        params = {
            constants.light_source_distribution_type: group[
                constants.light_source_distribution_parameters
            ][constants.light_source_distribution_type][()].decode("utf-8")
        }
        dist_group = group[constants.light_source_distribution_parameters]
        if constants.light_source_mean in dist_group:
            params[constants.light_source_mean] = float(
                dist_group[constants.light_source_mean][()]
            )
        if constants.light_source_covariance in dist_group:
            params[constants.light_source_covariance] = float(
                dist_group[constants.light_source_covariance][()]
            )
        sources.append(
            light_source_cls(
                number_of_rays=int(group[constants.light_source_number_of_rays][()]),
                distribution_parameters=params,
            )
        )
    return sources


def _load_surface_config(facets_group: h5py.Group) -> dict:
    """Per-facet arrays from a surface HDF5 group.

    reference: artist/io/h5_scenario_parser.py:12-76.
    """
    control_points, degrees, translations, cantings = [], None, [], []
    for facet_name in facets_group.keys():
        facet = facets_group[facet_name]
        control_points.append(
            np.asarray(facet[constants.facet_control_points][()], np.float32)
        )
        degrees = np.asarray(facet[constants.facet_degrees][()], np.int32)
        translations.append(
            np.asarray(facet[constants.facets_translation_vector][()], np.float32)
        )
        cantings.append(np.asarray(facet[constants.facets_canting][()], np.float32))
    return {
        "control_points": np.stack(control_points),  # [F, Cu, Cv, 3]
        "degrees": degrees,  # [2]
        "translations": np.stack(translations),  # [F, 4]
        "canting": np.stack(cantings),  # [F, 2, 4]
    }


def _load_kinematics(kinematics_group: h5py.Group, owner: str = "prototype") -> dict:
    """Kinematics type, initial orientation, packed deviations.

    reference: artist/io/h5_scenario_parser.py:79-371. Missing deviation
    entries default to zero with a per-key warning naming the owning
    heliostat (or "prototype"), mirroring the reference's operator-facing
    diagnostics.
    """
    kinematics_type = kinematics_group[constants.kinematics_type][()].decode("utf-8")
    if kinematics_type != constants.rigid_body_key:
        raise ValueError(f"The kinematics type: {kinematics_type} is not yet implemented!")
    initial_orientation = np.asarray(
        kinematics_group[constants.kinematics_initial_orientation][()], np.float32
    )

    translation = np.zeros(
        constants.rigid_body_number_of_translation_deviation_parameters, np.float32
    )
    rotation = np.zeros(
        constants.rigid_body_number_of_rotation_deviation_parameters, np.float32
    )
    deviations = kinematics_group.get(constants.kinematics_deviations)
    translation_keys = [
        constants.first_joint_translation_e,
        constants.first_joint_translation_n,
        constants.first_joint_translation_u,
        constants.second_joint_translation_e,
        constants.second_joint_translation_n,
        constants.second_joint_translation_u,
        constants.concentrator_translation_e,
        constants.concentrator_translation_n,
        constants.concentrator_translation_u,
    ]
    rotation_keys = [
        constants.first_joint_tilt_n,
        constants.first_joint_tilt_u,
        constants.second_joint_tilt_e,
        constants.second_joint_tilt_n,
    ]
    for row, key in enumerate(translation_keys):
        if deviations is not None and key in deviations:
            translation[row] = float(deviations[key][()])
        else:
            log.warning(
                "No kinematics deviation %s for %s set. Using default 0.", key, owner
            )
    for row, key in enumerate(rotation_keys):
        if deviations is not None and key in deviations:
            rotation[row] = float(deviations[key][()])
        else:
            log.warning(
                "No kinematics deviation %s for %s set. Using default 0.", key, owner
            )
    return {
        "type": kinematics_type,
        "initial_orientation": initial_orientation,
        "translation_deviations": translation,
        "rotation_deviations": rotation,
    }


def _initial_angle_compensation() -> float:
    """Initial-angle delta for actuator one: projection on the east axis of
    the rotation from the kinematics standard orientation (south) to the
    sampled-surface orientation (up).

    reference: artist/io/h5_scenario_parser.py:618-642. Evaluates to -pi/2.
    """
    axis, angle = rotation_angle_and_axis(
        np.array([0.0, -1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0, 0.0])
    )
    return float(axis[indices.e] * angle)


def _load_actuators(
    actuator_group: h5py.Group, prototype: bool = False, owner: str = "prototype"
) -> dict:
    """Packed actuator parameter tensors from an actuator HDF5 group.

    reference: artist/io/h5_scenario_parser.py:373-723. Missing linear
    actuator parameters default to zero with a per-key warning naming the
    actuator and owning heliostat, mirroring the reference.
    """
    actuator_names = list(actuator_group.keys())
    number_of_actuators = len(actuator_names)
    if number_of_actuators != constants.rigid_body_number_of_actuators:
        raise ValueError(
            f"This scenario file contains the wrong amount of actuators for this "
            f"heliostat and its kinematics type. Expected "
            f"{constants.rigid_body_number_of_actuators} actuators, found "
            f"{number_of_actuators} actuator(s)."
        )
    types = [
        actuator_group[a][constants.actuator_type_key][()].decode("utf-8")
        for a in actuator_names
    ]
    if len(set(types)) > 1:
        # Distinct messages for prototype vs individual mismatches
        # (reference: artist/io/h5_scenario_parser.py actuator validation,
        # asserted by tests/scenario/test_scenario.py:53-84).
        if prototype:
            raise ValueError("Prototype actuators must all have the same type.")
        raise ValueError(
            "When using the rigid body kinematics, all actuators for a given "
            "heliostat must have the same type."
        )
    actuator_type = types[0]

    if actuator_type == constants.linear_actuator_key:
        non_optimizable = np.zeros((7, number_of_actuators), np.float32)
        optimizable = np.zeros((2, number_of_actuators), np.float32)
        type_int = constants.linear_actuator_int
    elif actuator_type == constants.ideal_actuator_key:
        non_optimizable = np.zeros((4, number_of_actuators), np.float32)
        optimizable = np.zeros((0, 0), np.float32)
        type_int = constants.ideal_actuator_int
    else:
        raise ValueError(f"The actuator type: {actuator_type} is not yet implemented!")

    for column, name in enumerate(actuator_names):
        actuator = actuator_group[name]
        non_optimizable[indices.actuator_type, column] = type_int
        non_optimizable[indices.actuator_clockwise_movement, column] = float(
            bool(actuator[constants.actuator_clockwise_axis_movement][()])
        )
        min_max = actuator[constants.actuator_min_max_motor_positions][()]
        non_optimizable[indices.actuator_min_motor_position, column] = float(
            min_max[indices.data_actuator_min_motor_position]
        )
        non_optimizable[indices.actuator_max_motor_position, column] = float(
            min_max[indices.data_actuator_max_motor_position]
        )
        if actuator_type == constants.linear_actuator_key:
            params = actuator.get(constants.actuator_parameters_key)
            for row, key in (
                (indices.actuator_increment, constants.actuator_increment),
                (indices.actuator_offset, constants.actuator_offset),
                (indices.actuator_pivot_radius, constants.actuator_pivot_radius),
            ):
                if params is not None and key in params:
                    non_optimizable[row, column] = float(params[key][()])
                else:
                    log.warning(
                        "No individual %s set for %s on %s. Using default 0.",
                        key,
                        name,
                        owner,
                    )
            for row, key in (
                (indices.actuator_initial_angle, constants.actuator_initial_angle),
                (
                    indices.actuator_initial_stroke_length,
                    constants.actuator_initial_stroke_length,
                ),
            ):
                if params is not None and key in params:
                    optimizable[row, column] = float(params[key][()])
                else:
                    log.warning(
                        "No individual %s set for %s on %s. Using default 0.",
                        key,
                        name,
                        owner,
                    )

    if actuator_type == constants.linear_actuator_key:
        # Compensate actuator one's initial angle for the surface-up vs
        # kinematics-south orientation difference.
        optimizable[indices.actuator_initial_angle, indices.actuator_one_index] += (
            _initial_angle_compensation()
        )
    return {
        "type": actuator_type,
        "non_optimizable": non_optimizable,
        "optimizable": optimizable,
    }


def sample_surface(
    surface: dict,
    number_of_surface_points_per_facet: tuple[int, int],
) -> tuple[np.ndarray, np.ndarray]:
    """Sample surface points/normals of one heliostat from its NURBS.

    Canting is applied only when the control points are planar (deflectometry-
    fitted control points already embed the facet shape).
    reference: artist/field/surface.py:61-121.

    Returns
    -------
    tuple of np.ndarray
        points [F, P, 4] and normals [F, P, 4].
    """
    control_points = surface["control_points"][None]  # [1, F, Cu, Cv, 3]
    degrees = (int(surface["degrees"][0]), int(surface["degrees"][1]))
    evaluation_points = create_nurbs_evaluation_grid(number_of_surface_points_per_facet)
    is_planar = bool(np.all(surface["control_points"][..., 2] == 0))
    if is_planar:
        points, normals = evaluate_nurbs_surfaces(
            jnp.asarray(control_points),
            degrees,
            evaluation_points,
            canting=jnp.asarray(surface["canting"][None]),
            facet_translations=jnp.asarray(surface["translations"][None]),
        )
    else:
        points, normals = evaluate_nurbs_surfaces(
            jnp.asarray(control_points), degrees, evaluation_points
        )
    return np.asarray(points[0]), np.asarray(normals[0])


def load_scenario_from_hdf5(
    scenario_path: pathlib.Path | str | h5py.File,
    number_of_surface_points_per_facet: tuple[int, int] = (50, 50),
    change_number_of_control_points_per_facet: tuple[int, int] | None = None,
) -> Scenario:
    """Load a full scenario from an HDF5 file.

    reference: artist/scenario/scenario.py:104-259 and
    artist/field/heliostat_field.py:80-435.

    Parameters
    ----------
    scenario_path : path or open h5py.File
        The scenario file.
    number_of_surface_points_per_facet : tuple[int, int]
        Sampling resolution per facet (default (50, 50)).
    change_number_of_control_points_per_facet : tuple[int, int] | None
        If given, replace control points by planar grids of this size
        (only sensible for ideal surfaces).
    """
    own_handle = not isinstance(scenario_path, h5py.File)
    scenario_file = (
        h5py.File(scenario_path, "r") if own_handle else scenario_path
    )
    try:
        log.info(
            "Loading an ARTIST scenario HDF5 file. This scenario file is version %s.",
            scenario_file.attrs.get("version"),
        )
        power_plant_position = np.asarray(
            scenario_file[constants.power_plant_key][constants.power_plant_position][()],
            np.float64,
        )
        solar_tower = _load_solar_tower(scenario_file)
        light_sources = _load_light_sources(scenario_file)

        prototypes = scenario_file[constants.prototype_key]
        prototype_surface = _load_surface_config(
            prototypes[constants.surface_prototype_key][constants.facets_key]
        )
        prototype_kinematics = _load_kinematics(
            prototypes[constants.kinematics_prototype_key]
        )
        prototype_actuators = _load_actuators(
            prototypes[constants.actuators_prototype_key], prototype=True
        )

        grouped = defaultdict(lambda: defaultdict(list))
        surface_cache: dict[bytes, tuple[np.ndarray, np.ndarray]] = {}

        for heliostat_name in scenario_file[constants.heliostat_key].keys():
            heliostat = scenario_file[constants.heliostat_key][heliostat_name]

            if constants.heliostat_surface_key in heliostat:
                surface = _load_surface_config(
                    heliostat[constants.heliostat_surface_key][constants.facets_key]
                )
            else:
                log.info(
                    "Individual surface parameters not provided - loading "
                    "heliostat %s with the surface prototype.",
                    heliostat_name,
                )
                surface = prototype_surface

            if constants.heliostat_kinematics_key in heliostat:
                kinematics = _load_kinematics(
                    heliostat[constants.heliostat_kinematics_key],
                    owner=heliostat_name,
                )
            else:
                log.info(
                    "Individual kinematics configuration not provided - loading "
                    "heliostat %s with the kinematics prototype.",
                    heliostat_name,
                )
                kinematics = prototype_kinematics

            if constants.heliostat_actuator_key in heliostat:
                actuator = _load_actuators(
                    heliostat[constants.heliostat_actuator_key], owner=heliostat_name
                )
            else:
                log.info(
                    "Individual actuator configuration not provided - loading "
                    "heliostat %s with the actuator prototype.",
                    heliostat_name,
                )
                actuator = prototype_actuators

            control_points = surface["control_points"]
            canting = surface["canting"]
            if change_number_of_control_points_per_facet is not None:
                control_points = np.asarray(
                    create_planar_nurbs_control_points(
                        change_number_of_control_points_per_facet,
                        jnp.asarray(canting),
                    )
                )
                surface = dict(surface, control_points=control_points)

            cache_key = (
                surface["control_points"].tobytes()
                + surface["canting"].tobytes()
                + surface["translations"].tobytes()
            )
            if cache_key not in surface_cache:
                surface_cache[cache_key] = sample_surface(
                    surface, number_of_surface_points_per_facet
                )
            points, normals = surface_cache[cache_key]

            group_key = f"{kinematics['type']}_{actuator['type']}"
            g = grouped[group_key]
            g["names"].append(heliostat_name)
            g["positions"].append(
                np.asarray(heliostat[constants.heliostat_position][()], np.float32)
            )
            g["surface_points"].append(points.reshape(-1, 4))
            g["surface_normals"].append(normals.reshape(-1, 4))
            g["canting"].append(canting)
            g["facet_translations"].append(surface["translations"])
            g["control_points"].append(control_points)
            g["degrees"] = surface["degrees"]
            g["initial_orientations"].append(kinematics["initial_orientation"])
            g["translation_deviations"].append(kinematics["translation_deviations"])
            g["rotation_deviations"].append(kinematics["rotation_deviations"])
            g["actuator_non_optimizable"].append(actuator["non_optimizable"])
            g["actuator_optimizable"].append(actuator["optimizable"])
            g["types"] = (kinematics["type"], actuator["type"])

        heliostat_groups = []
        heliostat_group_names = []
        for group_key, g in grouped.items():
            num = len(g["names"])
            kinematics_type, actuator_type = g["types"]
            optimizable = np.stack(g["actuator_optimizable"])
            heliostat_groups.append(
                HeliostatGroupState(
                    positions=jnp.asarray(np.stack(g["positions"])),
                    surface_points=jnp.asarray(np.stack(g["surface_points"])),
                    surface_normals=jnp.asarray(np.stack(g["surface_normals"])),
                    canting=jnp.asarray(np.stack(g["canting"])),
                    facet_translations=jnp.asarray(np.stack(g["facet_translations"])),
                    nurbs_control_points=jnp.asarray(np.stack(g["control_points"])),
                    initial_orientations=jnp.asarray(np.stack(g["initial_orientations"])),
                    translation_deviations=jnp.asarray(
                        np.stack(g["translation_deviations"])
                    ),
                    rotation_deviations=jnp.asarray(np.stack(g["rotation_deviations"])),
                    actuator_non_optimizable=jnp.asarray(
                        np.stack(g["actuator_non_optimizable"])
                    ),
                    actuator_optimizable=jnp.asarray(optimizable),
                    motor_positions=jnp.zeros((num, 2), jnp.float32),
                    names=tuple(g["names"]),
                    kinematics_type=kinematics_type,
                    actuator_type=actuator_type,
                    nurbs_degrees=(int(g["degrees"][0]), int(g["degrees"][1])),
                )
            )
            heliostat_group_names.append(group_key)
            log.info(
                "Added a heliostat group with kinematics type: %s, and actuator "
                "type: %s, to the heliostat field.",
                kinematics_type,
                actuator_type,
            )

        return Scenario(
            power_plant_position=power_plant_position,
            solar_tower=solar_tower,
            light_sources=light_sources,
            heliostat_groups=heliostat_groups,
            heliostat_group_names=heliostat_group_names,
        )
    finally:
        if own_handle:
            scenario_file.close()


def update_surfaces(
    group: HeliostatGroupState,
    number_of_surface_points_per_facet: tuple[int, int] | None = None,
) -> HeliostatGroupState:
    """Re-evaluate NURBS -> refresh canonical surface points/normals.

    reference: artist/field/heliostat_field.py:437-503.
    """
    import math

    if number_of_surface_points_per_facet is None:
        per_facet = group.surface_points.shape[1] // group.number_of_facets_per_heliostat
        side = int(math.sqrt(per_facet))
        number_of_surface_points_per_facet = (side, side)
    evaluation_points = create_nurbs_evaluation_grid(number_of_surface_points_per_facet)
    points, normals = evaluate_nurbs_surfaces(
        jax_stop_gradient(group.nurbs_control_points),
        group.nurbs_degrees,
        evaluation_points,
        canting=group.canting,
        facet_translations=group.facet_translations,
    )
    num = group.number_of_heliostats
    return group.replace(
        surface_points=points.reshape(num, -1, 4),
        surface_normals=normals.reshape(num, -1, 4),
    )


def jax_stop_gradient(x):
    import jax

    return jax.lax.stop_gradient(x)
