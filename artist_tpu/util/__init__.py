from artist_tpu.util import config, constants, indices  # noqa: F401
from artist_tpu.util.logging_utils import (  # noqa: F401
    enable_compilation_cache,
    set_logger_config,
    track_runtime,
)
