from artist_tpu.flux.bitmap import (  # noqa: F401
    crop_flux_distributions_around_center,
    get_center_of_mass,
    trapezoid_distribution,
)
