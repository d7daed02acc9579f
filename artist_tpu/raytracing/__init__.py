from artist_tpu.raytracing.render import RenderConfig, trace_rays  # noqa: F401
