from artist_tpu.util import config, constants, indices  # noqa: F401
from artist_tpu.util.logging_utils import set_logger_config, track_runtime  # noqa: F401
