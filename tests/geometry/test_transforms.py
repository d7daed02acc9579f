"""Parity tests: geometry transforms vs the torch reference oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from artist_tpu.geometry import transforms


@pytest.fixture(scope="module")
def torch_transforms(reference_artist):
    from artist.geometry import transforms as t

    return t


def _np(x):
    return np.asarray(x)


class TestRotations:
    def test_rotate_e_n_u_translate(self, torch_transforms):
        import torch

        angles = np.random.RandomState(0).uniform(-np.pi, np.pi, size=7).astype(np.float32)
        for name in ("rotate_e", "rotate_n", "rotate_u"):
            ours = getattr(transforms, name)(jnp.asarray(angles))
            theirs = getattr(torch_transforms, name)(
                torch.from_numpy(angles), device=torch.device("cpu")
            )
            np.testing.assert_allclose(_np(ours), theirs.numpy(), atol=1e-6)

        e, n, u = [np.random.RandomState(i).randn(7).astype(np.float32) for i in (1, 2, 3)]
        ours = transforms.translate_enu(jnp.asarray(e), jnp.asarray(n), jnp.asarray(u))
        theirs = torch_transforms.translate_enu(
            torch.from_numpy(e), torch.from_numpy(n), torch.from_numpy(u),
            device=torch.device("cpu"),
        )
        np.testing.assert_allclose(_np(ours), theirs.numpy(), atol=1e-6)

    def test_rotate_distortions_matches(self, torch_transforms):
        import torch

        rng = np.random.RandomState(42)
        e = rng.normal(0, 2e-3, size=(2, 3, 5)).astype(np.float32)
        u = rng.normal(0, 2e-3, size=(2, 3, 5)).astype(np.float32)
        ours = transforms.rotate_distortions(jnp.asarray(e), jnp.asarray(u))
        theirs = torch_transforms.rotate_distortions(
            e=torch.from_numpy(e), u=torch.from_numpy(u), device=torch.device("cpu")
        )
        np.testing.assert_allclose(_np(ours), theirs.numpy(), atol=1e-6)

    def test_apply_distortion_rotation_fused_equals_matrix(self):
        rng = np.random.RandomState(3)
        e = jnp.asarray(rng.normal(0, 1e-2, size=(2, 4, 6)).astype(np.float32))
        u = jnp.asarray(rng.normal(0, 1e-2, size=(2, 4, 6)).astype(np.float32))
        d = rng.randn(2, 1, 6, 4).astype(np.float32)
        d[..., 3] = 0.0
        d = jnp.asarray(d)
        mats = transforms.rotate_distortions(e, u)  # [2,4,6,4,4]
        expected = jnp.einsum("hrpij,hspj->hrpi", mats, d)
        fused = transforms.apply_distortion_rotation(e, u, jnp.broadcast_to(d, (2, 4, 6, 4)))
        np.testing.assert_allclose(_np(fused), _np(expected), atol=1e-6)

    def test_perform_canting(self, torch_transforms):
        import torch

        rng = np.random.RandomState(11)
        canting = rng.randn(2, 4, 2, 4).astype(np.float32)
        canting[..., 3] = 0.0
        data = rng.randn(2, 4, 9, 4).astype(np.float32)
        for inverse in (False, True):
            ours = transforms.perform_canting(
                jnp.asarray(canting), jnp.asarray(data), inverse=inverse
            )
            theirs = torch_transforms.perform_canting(
                canting_angles=torch.from_numpy(canting),
                data=torch.from_numpy(data),
                inverse=inverse,
                device=torch.device("cpu"),
            )
            np.testing.assert_allclose(_np(ours), theirs.numpy(), atol=1e-5)


class TestDecomposeRotations:
    def test_matches_reference(self, reference_artist):
        import torch
        from artist.geometry import rotations as torch_rotations

        from artist_tpu.geometry import rotations

        rng = np.random.RandomState(5)
        initial = rng.randn(6, 4).astype(np.float32)
        initial[:, 3] = 0.0
        target = np.array([0.0, -1.0, 0.0, 0.0], dtype=np.float32)
        ours = rotations.decompose_rotations(jnp.asarray(initial), jnp.asarray(target))
        theirs = torch_rotations.decompose_rotations(
            initial_vector=torch.from_numpy(initial),
            target_vector=torch.from_numpy(target),
        )
        for o, t in zip(ours, theirs):
            np.testing.assert_allclose(_np(o), t.numpy(), atol=1e-6)
