from artist_tpu.geometry import coordinates, rotations, transforms  # noqa: F401
