"""paint-csp mapping-constant shim for the torch reference oracle (tests only).

Values are the PAINT database JSON/HDF5 schema keys, inferable from the
PAINT data files shipped with the reference tests
(tests/data/field_data/*.json, *-deflectometry*.h5).
"""

# Calibration properties JSON.
MOTOR_POS_KEY = "motor_position"
AXIS1_MOTOR_SAVE = "axis_1_motor_position"
AXIS2_MOTOR_SAVE = "axis_2_motor_position"
TARGET_NAME_KEY = "target_name"
SUN_AZIMUTH = "sun_azimuth"
SUN_ELEVATION = "sun_elevation"
FOCAL_SPOT_KEY = "focal_spot"
UTIS_KEY = "UTIS"
HELIOS_KEY = "HeliOS"
CALIBRATION_PROPERTIES_IDENTIFIER = "-calibration-properties.json"
SAVE_CALIBRATION = "Calibration"

# Tower measurements JSON.
POWER_PLANT_KEY = "power_plant_properties"
TOWER_COORDINATES_KEY = "coordinates"
TOWER_NORMAL_VECTOR_KEY = "normal_vector"
TOWER_TYPE_KEY = "type"
CENTER = "center"
UPPER_LEFT = "upper_left"
UPPER_RIGHT = "upper_right"
LOWER_LEFT = "lower_left"
LOWER_RIGHT = "lower_right"

# Heliostat properties JSON.
HELIOSTAT_POSITION_KEY = "heliostat_position"
INITIAL_ORIENTATION_KEY = "initial_orientation"
KINEMATICS_PROPERTIES_KEY = "kinematics_properties"
ACTUATOR_KEY = "actuators"
FIRST_JOINT_TRANSLATION_E_KEY = "joint_translation_e_1"
FIRST_JOINT_TRANSLATION_N_KEY = "joint_translation_n_1"
FIRST_JOINT_TRANSLATION_U_KEY = "joint_translation_u_1"
SECOND_JOINT_TRANSLATION_E_KEY = "joint_translation_e_2"
SECOND_JOINT_TRANSLATION_N_KEY = "joint_translation_n_2"
SECOND_JOINT_TRANSLATION_U_KEY = "joint_translation_u_2"
CONCENTRATOR_TRANSLATION_E_KEY = "concentrator_translation_e"
CONCENTRATOR_TRANSLATION_N_KEY = "concentrator_translation_n"
CONCENTRATOR_TRANSLATION_U_KEY = "concentrator_translation_u"
FACET_PROPERTIES_KEY = "facet_properties"
FACETS_LIST = "facets"
NUM_FACETS = "number_of_facets"
TRANSLATION_VECTOR = "translation_vector"
CANTING_E = "canting_e"
CANTING_N = "canting_n"

# Deflectometry HDF5.
FACET_KEY = "facet"
SURFACE_POINT_KEY = "surface_points"
SURFACE_NORMAL_KEY = "surface_normals"
