from artist_tpu.io.calibration import (  # noqa: F401
    CalibrationData,
    PaintCalibrationDataParser,
    load_flux_from_png,
)
