"""String -> implementation registries for scenario loading.

reference: artist/util/type_registry.py:7-20. The runtime state is
functional (no classes per kinematics/actuator combination); the registries
map schema type strings onto the module-level implementations so new types
slot in without touching the loaders.
"""

from __future__ import annotations

from artist_tpu.field import kinematics_rigid_body
from artist_tpu.scene.sun import Sun
from artist_tpu.util import constants

# f"{kinematics_type}_{actuator_type}" -> kinematics module implementing the
# forward/inverse solves for that group type.
heliostat_group_type_mapping = {
    f"{constants.rigid_body_key}_{constants.linear_actuator_key}": kinematics_rigid_body,
    f"{constants.rigid_body_key}_{constants.ideal_actuator_key}": kinematics_rigid_body,
}

# Actuator type int (HDF5 schema) -> type string.
actuator_type_mapping = {
    constants.linear_actuator_int: constants.linear_actuator_key,
    constants.ideal_actuator_int: constants.ideal_actuator_key,
}

# Light source type string -> implementation.
light_source_type_mapping = {
    constants.sun_key: Sun,
}
