from artist_tpu.field.heliostat_group import HeliostatGroupState  # noqa: F401
from artist_tpu.field.solar_tower import SolarTower  # noqa: F401
