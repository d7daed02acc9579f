"""On-accelerator test lane: kernel + render parity on the real TPU.

Everything else in the suite pins JAX to the virtual CPU mesh, so the Pallas
kernels only ever run in interpret mode under pytest; this module runs them
non-interpreted on the actual chip (mirroring the reference's
device-parametrized fixture, /root/reference/tests/conftest.py:18-49).

Run with::

    ARTIST_TEST_TPU=1 python -m pytest -m tpu tests/test_tpu_lane.py -q

Skipped automatically on CPU-only sessions. Expect remote-compile latency on
the first run (the persistent compilation cache makes re-runs fast).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() == "cpu",
        reason="TPU lane: needs a real accelerator (ARTIST_TEST_TPU=1)",
    ),
]


@pytest.fixture(scope="module", autouse=True)
def _compile_cache(tmp_path_factory):
    from artist_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    yield


def test_splat_kernel_parity_on_device():
    from artist_tpu.raytracing.splatting import bilinear_splat

    key = jax.random.PRNGKey(3)
    ke, ku, kw = jax.random.split(key, 3)
    e = jax.random.uniform(ke, (2, 4096), minval=-1.0, maxval=65.0)
    u = jax.random.uniform(ku, (2, 4096), minval=-1.0, maxval=65.0)
    w = jax.random.uniform(kw, (2, 4096))
    resolution = (64, 64)
    expected = bilinear_splat(e, u, w, resolution, method="scatter")
    pallas = bilinear_splat(e, u, w, resolution, method="pallas")
    np.testing.assert_allclose(
        np.asarray(pallas),
        np.asarray(expected),
        atol=2e-3 * float(jnp.max(expected)),
    )
    windowed = bilinear_splat(e, u, w, resolution, method="pallas", window=64)
    np.testing.assert_allclose(
        np.asarray(windowed), np.asarray(pallas), atol=1e-6
    )
    # Dynamic per-block windows are EXACT (fallback blocks included).
    dynamic = bilinear_splat(
        e, u, w, resolution, method="pallas_fp32", block_window=32
    )
    np.testing.assert_allclose(
        np.asarray(dynamic), np.asarray(expected), atol=1e-5
    )
    # Non-tile-aligned resolution: Mosaic's lane padding of a 100-wide
    # (non-128-multiple) bitmap is exactly where interpret mode and the
    # real lowering can diverge; the CPU suite sweeps more shapes
    # (tests/kernels/test_splat_pallas.py::test_splat_shape_sweep_parity).
    odd = (100, 100)
    e_odd = e * (102.0 / 66.0)
    u_odd = u * (102.0 / 66.0)
    np.testing.assert_allclose(
        np.asarray(bilinear_splat(e_odd, u_odd, w, odd, method="pallas_fp32")),
        np.asarray(bilinear_splat(e_odd, u_odd, w, odd, method="scatter")),
        atol=1e-5,
    )


def test_blocking_kernel_parity_on_device():
    from artist_tpu.raytracing import blocking

    args, kwargs = _blocking_scene()
    dense = blocking.soft_ray_blocking_mask(*args, **kwargs, method="xla")
    flat = blocking.soft_ray_blocking_mask(*args, **kwargs, method="pallas")
    compact = blocking.soft_ray_blocking_mask(
        *args, **kwargs, method="pallas", max_candidates=16
    )
    assert float(jnp.mean(dense)) > 0.05, "scene produced no blocking"
    np.testing.assert_allclose(np.asarray(flat), np.asarray(dense), atol=2e-3)
    np.testing.assert_allclose(np.asarray(compact), np.asarray(dense), atol=2e-3)


def _blocking_scene():
    """Shared small scene where blocking is genuinely active."""
    rng = np.random.default_rng(5)
    heliostats, rays, points = 2, 2, 64
    origins = np.zeros((heliostats, points, 4), np.float32)
    for m in range(heliostats):
        origins[m, :, 0] = np.linspace(-1, 1, points)
        origins[m, :, 1] = 10.0 * m
        origins[m, :, 2] = 1.5
        origins[m, :, 3] = 1.0
    directions = np.zeros((heliostats, rays, points, 4), np.float32)
    directions[..., 1] = -1.0
    directions[..., 2] = -0.02 + 0.01 * rng.standard_normal(
        (heliostats, rays, points)
    )
    directions[..., :3] /= np.linalg.norm(
        directions[..., :3], axis=-1, keepdims=True
    )
    corners = []
    for m in range(heliostats):
        c0 = np.asarray([-1.1, 10.0 * m, 0.4, 1.0], np.float32)
        corners.append(
            np.stack(
                [
                    c0,
                    c0 + [0.0, 0.0, 2.2, 0.0],
                    c0 + [2.2, 0.0, 2.2, 0.0],
                    c0 + [2.2, 0.0, 0.0, 0.0],
                ]
            )
        )
    corners = jnp.asarray(np.stack(corners))
    spans = jnp.stack(
        [corners[:, 1] - corners[:, 0], corners[:, 3] - corners[:, 0]], axis=1
    )
    n3 = np.cross(np.asarray(spans[:, 0, :3]), np.asarray(spans[:, 1, :3]))
    n3 /= np.linalg.norm(n3, axis=-1, keepdims=True)
    normals = jnp.asarray(
        np.concatenate([n3, np.zeros((len(n3), 1), np.float32)], axis=1)
    )
    kwargs = dict(
        intersection_distances_target=jnp.full((heliostats, rays, points), 40.0),
        ray_primitive_indices=jnp.arange(heliostats, dtype=jnp.int32),
    )
    args = (jnp.asarray(origins), jnp.asarray(directions), corners, spans, normals)
    return args, kwargs


def test_blocking_kernel_vjp_on_device():
    """The pair kernels' hand-derived backward vs XLA autodiff, on-chip.

    The most intricate hand-written VJP in the repo
    (kernels/blocking_pallas.py) is otherwise only exercised interpreted;
    this differentiates a blocking-mask loss w.r.t. ray directions AND
    primitive corners through the flat and candidate-compacted Pallas paths
    and compares against the XLA path's autodiff gradients.
    """
    from artist_tpu.raytracing import blocking

    args, kwargs = _blocking_scene()
    origins, directions, corners, spans, normals = args
    # A spatially varying weight makes the per-ray gradients informative.
    weight = 1.0 + 0.1 * jnp.arange(
        directions.shape[0] * directions.shape[1] * directions.shape[2],
        dtype=jnp.float32,
    ).reshape(directions.shape[:3])

    def loss(directions_, corners_, method, max_candidates=None):
        spans_ = jnp.stack(
            [corners_[:, 1] - corners_[:, 0], corners_[:, 3] - corners_[:, 0]],
            axis=1,
        )
        # The production softness (1000) saturates the sigmoid gates and the
        # fp32 gradient underflows to zero for every decisively-in/out ray;
        # a soft setting keeps the VJP everywhere non-trivial so the
        # comparison is informative. The origin offset scales up with the
        # softened gate (sigmoid argument -40 at the self-pair distance) so
        # self-pairs stay suppressed: the dense/flat paths keep whole
        # primitives (per-primitive cull, self-pairs ride the offset gate)
        # while the compacted path hard-excludes self from the candidate
        # list - at a LEAKY offset gate those semantics genuinely diverge.
        mask = blocking.soft_ray_blocking_mask(
            origins,
            directions_,
            corners_,
            spans_,
            normals,
            **kwargs,
            softness=20.0,
            alpha=5.0,
            ray_origin_offset=2.0,
            method=method,
            max_candidates=max_candidates,
        )
        return jnp.sum(mask * weight)

    grad_fn = jax.jit(
        jax.grad(loss, argnums=(0, 1)), static_argnames=("method", "max_candidates")
    )
    xla_dir, xla_corners = grad_fn(directions, corners, method="xla")
    flat_dir, flat_corners = grad_fn(directions, corners, method="pallas")
    compact_dir, compact_corners = grad_fn(
        directions, corners, method="pallas", max_candidates=16
    )
    assert float(jnp.abs(xla_dir).max()) > 0, "gradient is identically zero"
    for mine, theirs, name in [
        (flat_dir, xla_dir, "flat directions"),
        (flat_corners, xla_corners, "flat corners"),
        (compact_dir, xla_dir, "compact directions"),
        (compact_corners, xla_corners, "compact corners"),
    ]:
        scale = float(jnp.abs(theirs).max())
        np.testing.assert_allclose(
            np.asarray(mine) / scale,
            np.asarray(theirs) / scale,
            atol=5e-3,
            err_msg=f"blocking VJP vs XLA autodiff: {name}",
        )


def test_jitted_optimizer_step_on_device():
    """One jitted surface-reconstruction train step runs on-chip.

    Exercises the full optimizer step (NURBS -> align -> trace -> crop ->
    KL + AL constraint + regularizers -> grad -> edge lock -> Adam) with
    the Pallas kernels non-interpreted.
    """
    from artist_tpu.io.calibration import CalibrationData
    from artist_tpu.optim.surface_reconstructor import SurfaceReconstructor
    from artist_tpu.scenario.synthetic import (
        SyntheticCalibrationParser,
        make_synthetic_scenario,
    )
    from artist_tpu.util import constants

    scenario = make_synthetic_scenario(
        number_of_heliostats=2,
        number_of_surface_points_per_facet=(8, 8),
        number_of_rays=4,
    )
    reconstructor = SurfaceReconstructor(
        scenario=scenario,
        data={
            constants.data_parser: SyntheticCalibrationParser(
                samples_per_heliostat=2
            ),
            constants.heliostat_data_mapping: [],
        },
        optimization_configuration={
            constants.optimization: {
                constants.initial_learning_rate: 1e-4,
                constants.tolerance: 0.0,
                constants.max_epoch: 2,
                constants.batch_size: 8,
                constants.log_step: 1,
                constants.early_stopping_delta: 1.0,
                constants.early_stopping_patience: 50,
                constants.early_stopping_window: 50,
            },
            constants.scheduler: {
                constants.scheduler_type: constants.exponential,
                constants.gamma: 0.99,
            },
            constants.constraints: {
                constants.rho_flux_integral: 1.0,
                constants.energy_tolerance: 0.01,
                constants.weight_smoothness: 0.005,
                constants.weight_ideal_surface: 0.005,
            },
        },
        number_of_surface_points=(8, 8),
        bitmap_resolution=(64, 64),
    )
    final_loss, results = reconstructor.reconstruct_surfaces("kl_divergence")
    assert len(results) == 1
    history = results[0].loss_history["total_loss"]
    assert len(history) >= 2
    assert np.isfinite(history).all()
    del CalibrationData  # imported for the parser's return type only


def test_render_parity_on_device():
    """End-to-end render: Pallas splat + compact blocking vs the XLA paths."""
    from artist_tpu.field import heliostat_group as hg
    from artist_tpu.field.solar_tower import get_centers_of_target_areas
    from artist_tpu.raytracing import RenderConfig, trace_rays
    from artist_tpu.raytracing.blocking import (
        create_blocking_primitives_rectangles_by_index,
    )
    from artist_tpu.scenario.synthetic import make_synthetic_scenario

    scenario = make_synthetic_scenario(
        number_of_heliostats=4,
        number_of_surface_points_per_facet=(8, 8),
        number_of_rays=8,
    )
    group = scenario.heliostat_groups[0]
    tower = scenario.solar_tower
    num = group.number_of_heliostats
    indices = jnp.arange(num, dtype=jnp.int32)
    targets = jnp.zeros(num, dtype=jnp.int32)
    incident = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0, 0.0], jnp.float32), (num, 4)
    )
    aim = get_centers_of_target_areas(tower, targets)
    active = hg.gather_active(group, indices)
    points, normals, _, _ = hg.align_surfaces_with_incident_ray_directions(
        active, aim, incident
    )
    du, de = scenario.light_sources[0].get_distortions(
        jax.random.PRNGKey(2), points.shape[1], num
    )
    primitives = create_blocking_primitives_rectangles_by_index(points)

    def render(**overrides):
        config = RenderConfig(
            bitmap_resolution=(64, 64), blocking_active=True, **overrides
        )
        flux, intercept, _, blocking_factor = trace_rays(
            tower=tower,
            aligned_surface_points=points,
            aligned_surface_normals=normals,
            incident_ray_directions=incident,
            target_area_indices=targets,
            distortions_u=du,
            distortions_e=de,
            blocking_primitives=primitives,
            ray_primitive_indices=indices,
            config=config,
        )
        return np.asarray(flux), np.asarray(intercept), np.asarray(blocking_factor)

    flux_ref, intercept_ref, blocking_ref = render(
        splat_method="scatter", blocking_method="xla"
    )
    flux_tpu, intercept_tpu, blocking_tpu = render()  # all-Pallas defaults
    scale = max(float(flux_ref.mean()), 1e-6)
    np.testing.assert_allclose(
        flux_tpu, flux_ref, atol=max(0.01 * scale, 1e-6), rtol=0.01
    )
    np.testing.assert_allclose(intercept_tpu, intercept_ref, atol=1e-3)
    np.testing.assert_allclose(blocking_tpu, blocking_ref, atol=1e-3)


def test_flagship_shape_splat_parity_on_device():
    """Splat parity at the PRODUCTION shape the bench sells (32M rays,
    256x256), fwd + all three gradients, for the bf16, fp32, windowed and
    dynamic-window variants - round 4's on-chip regression hid at exactly
    the shapes the toy lane missed."""
    from artist_tpu.raytracing.splatting import bilinear_splat, point_tile_order

    heliostats, rays, points_side = 100, 32, 50
    points = points_side * points_side * 4
    rng = np.random.default_rng(0)
    order = np.asarray(point_tile_order(points_side, points_side, 4, 10))
    pu = (order // (points_side * 2)) / (points_side * 2)
    pv = (order % (points_side * 2)) / (points_side * 2)
    u = 35 + 185 * pu[None, None, :] + 6.0 * rng.standard_normal(
        (heliostats, rays, points)
    )
    e = 35 + 185 * pv[None, None, :] + 6.0 * rng.standard_normal(
        (heliostats, rays, points)
    )
    w = rng.random((heliostats, rays, points))
    e, u, w = (
        jnp.asarray(x.reshape(heliostats, -1), jnp.float32) for x in (e, u, w)
    )
    resolution = (256, 256)

    reference = bilinear_splat(
        e, u, w, resolution, flip_up_down=False, method="scatter"
    )
    scale = float(jnp.max(reference))
    for kwargs, atol in [
        (dict(method="pallas"), 2e-3 * scale),
        (dict(method="pallas_fp32"), 1e-5 * scale),
        (dict(method="pallas_fp32", block_window=96), 1e-5 * scale),
        (dict(method="pallas", block_window=96), 2e-3 * scale),
    ]:
        got = bilinear_splat(e, u, w, resolution, flip_up_down=False, **kwargs)
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(reference),
            atol=atol,
            err_msg=f"forward {kwargs}",
        )

    # Gradients at the same shape (sum-loss cotangent).
    def loss(kwargs, e_, u_, w_):
        return jnp.sum(
            bilinear_splat(e_, u_, w_, resolution, flip_up_down=False, **kwargs)
        )

    ref_grads = jax.grad(loss, argnums=(1, 2, 3))(dict(method="scatter"), e, u, w)
    for variant in (
        dict(method="pallas_fp32"),
        dict(method="pallas_fp32", block_window=96),
    ):
        got_grads = jax.grad(loss, argnums=(1, 2, 3))(variant, e, u, w)
        for name, mine, theirs in zip(("de", "du", "dw"), got_grads, ref_grads):
            gscale = max(float(jnp.abs(theirs).max()), 1e-9)
            np.testing.assert_allclose(
                np.asarray(mine) / gscale,
                np.asarray(theirs) / gscale,
                atol=1e-5,
                err_msg=f"{variant} gradient {name} at flagship shape",
            )


def test_compacted_blocking_optimizer_epoch_on_device():
    """Two aim-point epochs with candidate-compacted blocking ON, on-chip:
    the configuration the aim-point optimizer actually ships (tanh reparam,
    3 AL constraints, compacted pair kernels) survives jit + real Mosaic."""
    from artist_tpu.optim.aim_point_optimizer import AimPointOptimizer
    from artist_tpu.scenario.synthetic import make_synthetic_scenario
    from artist_tpu.util import constants

    scenario = make_synthetic_scenario(
        number_of_heliostats=8,
        number_of_surface_points_per_facet=(8, 8),
        number_of_rays=4,
    )
    optimizer = AimPointOptimizer(
        scenario=scenario,
        optimization_configuration={
            constants.optimization: {
                constants.initial_learning_rate: 1e-3,
                constants.tolerance: 1e-9,
                constants.max_epoch: 2,
                constants.batch_size: 8,
                constants.log_step: 0,
                constants.early_stopping_delta: 1.0,
                constants.early_stopping_patience: 5,
                constants.early_stopping_window: 40,
            },
            constants.scheduler: {
                constants.scheduler_type: constants.exponential,
                constants.gamma: 0.99,
            },
            constants.constraints: {
                constants.rho_flux_integral: 1.0,
                constants.rho_intercept: 1.0,
                constants.rho_local_flux: 1.0,
                constants.max_flux_density: 1e6,
            },
        },
        incident_ray_direction=np.array([0.0, 1.0, 0.0, 0.0], np.float32),
        target_area_index=0,
        ground_truth=np.ones((64, 64), np.float32),
        dni=1000.0,
        bitmap_resolution=(64, 64),
        blocking_candidates=4,
    )
    loss, history, _, _, _ = optimizer.optimize("kl_divergence")
    assert len(history["total_loss"]) >= 2
    assert np.isfinite(history["total_loss"]).all()
