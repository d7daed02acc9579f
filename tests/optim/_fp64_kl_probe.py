"""Subprocess body of the fp64 full-KL gradient gate (run via pytest wrapper).

``jax_enable_x64`` and ``torch.set_default_dtype`` are process-global, so
the fp64 leg runs in its own interpreter: this script computes the FULL
production KL objective's gradient (NURBS -> align -> trace -> CoM crop ->
KL) at float64 in BOTH frameworks on bitwise-shared inputs and prints one
JSON line with the cosines; tests/optim/test_full_objective_gradient_parity.py
asserts on it.

Measured bisection (recorded round 5, this probe):
- fp32, matched inputs: full-objective cosine ~0.9990+ (the gated test);
  with independently parsed inputs the 1/(q+eps) KL boundary terms
  amplify ~1e-7 input noise into cosine ~0.14.
- fp64, matched inputs, RAW-flux KL (no crop): cosine 0.99996, loss rel
  diff 1.2e-6 - the trace chain itself is algorithmically equivalent.
- fp64, matched inputs, full objective WITH the CoM-following crop:
  cosine 0.99897, loss rel diff 5e-5 - the crop's zoom amplifies a
  stable ~5e-5 forward flux difference ~40x through the KL boundary
  terms. The residual is a deterministic implementation difference
  (crop resampling of near-zero boundary pixels), NOT surviving fp32
  noise: it does not shrink from fp32 to fp64.

reference: artist/optim/surface_reconstructor.py:593-747 (objective),
artist/flux/bitmap.py:121-245 (crop).
"""

from __future__ import annotations

import json
import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REPO = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

# Import the repo's tests package FIRST: /root/reference/tests is a regular
# package that would shadow it once the reference joins sys.path.
from tests.optim.test_convergence_parity import (  # noqa: E402
    SCENARIO,
    _InjectedSun,
    _heliostat_data_mapping,
)
from tests.optim.test_full_objective_gradient_parity import (  # noqa: E402
    _cosine,
    _our_cropped_flux,
)

REFERENCE = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else pathlib.Path(
    "/root/reference"
)
sys.path[:0] = [str(REPO / "tests" / "_shims"), str(REFERENCE)]

import h5py  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

import artist.io  # noqa: E402,F401  (breaks the reference's import cycle)

torch.set_default_dtype(torch.float64)

import jax.numpy as jnp  # noqa: E402

SCENARIO_DIR = REFERENCE / "tests" / "data" / "scenarios"
FIELD_DIR = REFERENCE / "tests" / "data" / "field_data"
SURFACE_POINTS = (8, 8)
BITMAP = (64, 64)


def deep_double(obj, seen=None) -> None:
    """Recursively cast floating torch.Tensor attributes to float64.

    The reference's scenario objects are plain classes (not nn.Modules),
    so ``.double()`` has to walk their attribute trees by hand."""
    if seen is None:
        seen = set()
    if id(obj) in seen or isinstance(
        obj, (str, bytes, int, float, bool, type(None))
    ):
        return
    seen.add(id(obj))
    if isinstance(obj, torch.Tensor):
        return
    if isinstance(obj, (list, tuple)):
        for item in obj:
            deep_double(item, seen)
        return
    if isinstance(obj, dict):
        for key, value in list(obj.items()):
            if isinstance(value, torch.Tensor) and value.is_floating_point():
                obj[key] = value.double()
            else:
                deep_double(value, seen)
        return
    attributes = getattr(obj, "__dict__", None)
    if attributes is None or not type(obj).__module__.startswith("artist"):
        return
    for key, value in list(attributes.items()):
        if isinstance(value, torch.Tensor) and value.is_floating_point():
            attributes[key] = value.double()
        elif isinstance(value, (list, tuple)):
            new = []
            for item in value:
                if isinstance(item, torch.Tensor) and item.is_floating_point():
                    new.append(item.double())
                else:
                    deep_double(item, seen)
                    new.append(item)
            attributes[key] = type(value)(new)
        else:
            deep_double(value, seen)


def main() -> None:
    from artist.flux import bitmap as oracle_bitmap
    from artist.io import PaintCalibrationDataParser as OracleParser
    from artist.nurbs import NURBSSurfaces
    from artist.nurbs.utils import create_nurbs_evaluation_grid
    from artist.optim import training as oracle_training
    from artist.optim.loss import KLDivergenceLoss
    from artist.raytracing import HeliostatRayTracer
    from artist.scenario import Scenario

    device = torch.device("cpu")
    with h5py.File(SCENARIO_DIR / SCENARIO) as f:
        oracle_scenario = Scenario.load_scenario_from_hdf5(
            scenario_file=f,
            number_of_surface_points_per_facet=torch.tensor(
                list(SURFACE_POINTS)
            ),
            device=device,
        )
    deep_double(oracle_scenario)
    oracle_group = next(
        g
        for g in oracle_scenario.heliostat_field.heliostat_groups
        if "AA39" in g.names
    )
    flux, spots, incident, motors, mask, targets = (
        OracleParser().parse_data_for_reconstruction(
            heliostat_data_mapping=_heliostat_data_mapping(FIELD_DIR),
            heliostat_group=oracle_group,
            scenario=oracle_scenario,
            bitmap_resolution=torch.tensor(list(BITMAP)),
            device=device,
        )
    )
    split = oracle_training.train_test_split(
        active_heliostats_mask=mask,
        flux_measured=flux.double(),
        focal_spots_measured=spots.double(),
        incident_ray_directions=incident.double(),
        motor_positions=motors.double(),
        target_area_indices=targets,
        device=device,
    )

    # --- oracle forward at double, cropped and raw ------------------------
    with h5py.File(SCENARIO_DIR / SCENARIO) as f:
        fresh = Scenario.load_scenario_from_hdf5(
            scenario_file=f,
            number_of_surface_points_per_facet=torch.tensor(
                list(SURFACE_POINTS)
            ),
            device=device,
        )
    deep_double(fresh)
    group = next(
        g for g in fresh.heliostat_field.heliostat_groups if "AA39" in g.names
    )
    control_points = group.nurbs_control_points.requires_grad_()
    group.activate_heliostats(
        active_heliostats_mask=split.active_heliostats_mask_train, device=device
    )
    evaluation_points = create_nurbs_evaluation_grid(
        number_of_evaluation_points=torch.tensor(list(SURFACE_POINTS)),
        device=device,
    )[None, None].expand(2, group.active_canting.shape[1], -1, -1)
    nurbs = NURBSSurfaces(
        degrees=group.nurbs_degrees,
        control_points=group.active_nurbs_control_points,
        device=device,
    )
    points, normals = nurbs.calculate_surface_points_and_normals(
        evaluation_points=evaluation_points,
        canting=group.active_canting,
        facet_translations=group.active_facet_translations,
        device=device,
    )
    group.active_surface_points = points.reshape(2, -1, 4)
    group.active_surface_normals = normals.reshape(2, -1, 4)
    group.align_surfaces_with_incident_ray_directions(
        aim_points=fresh.solar_tower.get_centers_of_target_areas(
            target_area_indices=split.target_area_indices_train, device=device
        ),
        incident_ray_directions=split.incident_ray_directions_train,
        active_heliostats_mask=split.active_heliostats_mask_train,
        device=device,
    )
    tracer = HeliostatRayTracer(
        scenario=fresh,
        heliostat_group=group,
        blocking_active=False,
        batch_size=30,
        random_seed=0,
        bitmap_resolution=torch.tensor(list(BITMAP)),
    )
    oracle_flux, _, _, _ = tracer.trace_rays(
        incident_ray_directions=split.incident_ray_directions_train,
        active_heliostats_mask=split.active_heliostats_mask_train,
        target_area_indices=split.target_area_indices_train,
        device=device,
    )
    oracle_cropped = oracle_bitmap.crop_flux_distributions_around_center(
        flux_distributions=oracle_flux,
        solar_tower=fresh.solar_tower,
        target_area_indices=split.target_area_indices_train,
        device=device,
    )

    def oracle_grad_of(prediction):
        control_points.grad = None
        loss = (
            KLDivergenceLoss()(
                prediction=prediction,
                ground_truth=split.flux_measured_train,
                target_area_indices=split.target_area_indices_train,
                reduction_dimensions=(1, 2),
                device=device,
            )
        ).mean()
        loss.backward(retain_graph=True)
        return float(loss), control_points.grad.detach().numpy()

    oracle_loss_cropped, oracle_grad_cropped = oracle_grad_of(oracle_cropped)
    oracle_loss_raw, oracle_grad_raw = oracle_grad_of(oracle_flux)

    # --- our side at float64, bitwise-shared inputs -----------------------
    from artist_tpu.optim import losses
    from artist_tpu.scenario import load_scenario_from_hdf5

    number_of_points = SURFACE_POINTS[0] * SURFACE_POINTS[1] * 4
    by_sample_count = {}
    for count in (1, 2):
        du, de = oracle_scenario.light_sources.light_source_list[
            0
        ].get_distortions(
            number_of_points=number_of_points,
            number_of_active_heliostats=count,
            random_seed=0,
        )
        by_sample_count[count] = (du.numpy(), de.numpy())

    scenario = load_scenario_from_hdf5(
        SCENARIO_DIR / SCENARIO,
        number_of_surface_points_per_facet=SURFACE_POINTS,
    )
    number_of_rays = scenario.light_sources[0].number_of_rays
    scenario.light_sources[0] = _InjectedSun(by_sample_count, number_of_rays)
    group_index = next(
        i for i, g in enumerate(scenario.heliostat_groups) if "AA39" in g.names
    )
    measured = jnp.asarray(
        np.asarray(split.flux_measured_train), jnp.float64
    )
    cp64 = scenario.heliostat_groups[group_index].nurbs_control_points.astype(
        jnp.float64
    )

    def full_loss(cp):
        cropped = _our_cropped_flux(scenario, split, by_sample_count, cp)
        return jnp.mean(losses.kl_divergence_loss(cropped, measured))

    our_loss_cropped, our_grad_cropped = jax.jit(
        jax.value_and_grad(full_loss)
    )(cp64)

    from artist_tpu.flux.bitmap import crop_flux_distributions_around_center
    from artist_tpu.field import heliostat_group as hg  # noqa: F401

    # Raw-flux variant: reuse _our_cropped_flux minus the crop by
    # re-deriving from the cropped helper's building blocks would duplicate
    # it; instead invert nothing - trace directly.
    from artist_tpu.field.solar_tower import get_centers_of_target_areas
    from artist_tpu.nurbs import (
        create_nurbs_evaluation_grid as our_grid,
        evaluate_nurbs_surfaces,
    )
    from artist_tpu.raytracing import RenderConfig, trace_rays

    group_l = scenario.heliostat_groups[group_index]
    mask_train = np.asarray(split.active_heliostats_mask_train)
    active_indices = hg.active_indices_from_mask(mask_train)
    incident_l = jnp.asarray(
        np.asarray(split.incident_ray_directions_train), jnp.float64
    )
    targets_l = jnp.asarray(
        np.asarray(split.target_area_indices_train).astype(np.int32)
    )
    aim_l = get_centers_of_target_areas(scenario.solar_tower, targets_l)
    du_l, de_l = (jnp.asarray(x) for x in by_sample_count[2])

    def raw_flux(cp):
        active = hg.gather_active(
            group_l.replace(nurbs_control_points=cp), active_indices
        )
        pts, nrm = evaluate_nurbs_surfaces(
            active.nurbs_control_points,
            group_l.nurbs_degrees,
            our_grid(SURFACE_POINTS),
            canting=active.canting,
            facet_translations=active.facet_translations,
        )
        active = active.replace(
            surface_points=pts.reshape(2, -1, 4),
            surface_normals=nrm.reshape(2, -1, 4),
        )
        ap, an, _, _ = hg.align_surfaces_with_incident_ray_directions(
            active, aim_l, incident_l
        )
        traced, _, _, _ = trace_rays(
            tower=scenario.solar_tower,
            aligned_surface_points=ap,
            aligned_surface_normals=an,
            incident_ray_directions=incident_l,
            target_area_indices=targets_l,
            distortions_u=du_l,
            distortions_e=de_l,
            config=RenderConfig(bitmap_resolution=BITMAP),
        )
        return traced

    def raw_loss(cp):
        return jnp.mean(losses.kl_divergence_loss(raw_flux(cp), measured))

    our_loss_raw, our_grad_raw = jax.jit(jax.value_and_grad(raw_loss))(cp64)
    del crop_flux_distributions_around_center  # imported for parity of API

    print(
        json.dumps(
            {
                "cosine_full": _cosine(
                    np.asarray(our_grad_cropped), oracle_grad_cropped
                ),
                "cosine_raw": _cosine(np.asarray(our_grad_raw), oracle_grad_raw),
                "loss_rel_diff_full": abs(
                    float(our_loss_cropped) - oracle_loss_cropped
                )
                / oracle_loss_cropped,
                "loss_rel_diff_raw": abs(float(our_loss_raw) - oracle_loss_raw)
                / oracle_loss_raw,
            }
        )
    )


if __name__ == "__main__":
    main()
