from artist_tpu.scene.rays import Rays  # noqa: F401
from artist_tpu.scene.sun import Sun  # noqa: F401
