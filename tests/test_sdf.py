"""Golden-value tests for the primitive SDF kernels against analytic
distances and reference formulas (geometry.py:87-507 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpinets_tpu.kernels import sdf
from mpinets_tpu.geom.scene import SceneSet, empty_scene


def _ident_quats(shape):
    q = np.zeros(shape + (4,), np.float32)
    q[..., 0] = 1.0
    return jnp.asarray(q)


def test_sphere_sdf_analytic():
    centers = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
    radii = jnp.asarray([[[0.5], [0.25]]])
    pts = jnp.asarray([[[2.0, 0.0, 0.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
    out = np.asarray(sdf.sphere_sdf(pts, centers, radii))
    # point (2,0,0): min(dist-0.5=1.5, dist-0.25=0.75) = 0.75
    np.testing.assert_allclose(out[0], [0.75, -0.5, -0.25], atol=1e-6)


def test_sphere_zero_radius_masked():
    centers = jnp.asarray([[[0.0, 0.0, 0.0]]])
    radii = jnp.zeros((1, 1, 1))
    pts = jnp.asarray([[[1.0, 2.0, 3.0]]])
    out = np.asarray(sdf.sphere_sdf(pts, centers, radii))
    assert np.isinf(out).all()


def test_cuboid_sdf_axis_aligned():
    centers = jnp.zeros((1, 1, 3))
    dims = jnp.asarray([[[2.0, 4.0, 6.0]]])
    quats = _ident_quats((1, 1))
    pts = jnp.asarray(
        [[[0.0, 0.0, 0.0],   # inside: max(-1,-2,-3) = -1
          [2.0, 0.0, 0.0],   # outside along x: 1
          [2.0, 3.0, 0.0],   # corner-ish: sqrt(1+1)
          [0.5, 0.0, 0.0]]]  # inside: max(-0.5, -2, -3) = -0.5
    )
    out = np.asarray(sdf.cuboid_sdf(pts, centers, dims, quats))
    np.testing.assert_allclose(
        out[0], [-1.0, 1.0, np.sqrt(2.0), -0.5], atol=1e-6
    )


def test_cuboid_sdf_rotated():
    # 90 deg about z: local x <- world y
    quats = jnp.asarray([[[np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)]]])
    centers = jnp.zeros((1, 1, 3))
    dims = jnp.asarray([[[2.0, 0.5, 0.5]]])  # long axis now along world y
    pts = jnp.asarray([[[0.0, 0.9, 0.0], [0.9, 0.0, 0.0]]])
    out = np.asarray(sdf.cuboid_sdf(pts, centers, dims, quats))
    np.testing.assert_allclose(out[0], [-0.1, 0.65], atol=1e-5)


def test_cylinder_sdf_analytic():
    centers = jnp.zeros((1, 1, 3))
    radii = jnp.asarray([[[1.0]]])
    heights = jnp.asarray([[[2.0]]])
    quats = _ident_quats((1, 1))
    pts = jnp.asarray(
        [[[0.0, 0.0, 0.0],   # inside: max(-1, -1) = -1
          [2.0, 0.0, 0.0],   # radial outside: 1
          [0.0, 0.0, 2.0],   # axial outside: 1
          [2.0, 0.0, 2.0]]]  # corner: sqrt(2)
    )
    out = np.asarray(sdf.cylinder_sdf(pts, centers, radii, heights, quats))
    np.testing.assert_allclose(out[0], [-1.0, 1.0, 1.0, np.sqrt(2.0)], atol=1e-6)


def test_min_over_primitives_and_masking():
    centers = jnp.asarray([[[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]]])
    dims = jnp.asarray([[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]])  # 2nd is padding
    quats = _ident_quats((1, 2))
    pts = jnp.asarray([[[5.0, 0.0, 0.0]]])  # on top of the masked cuboid
    out = np.asarray(sdf.cuboid_sdf(pts, centers, dims, quats))
    np.testing.assert_allclose(out[0], [4.5], atol=1e-6)


def test_scene_sdf_composes():
    scene = SceneSet(
        cuboid_centers=jnp.asarray([[[0.0, 0.0, 0.0]]]),
        cuboid_dims=jnp.asarray([[[1.0, 1.0, 1.0]]]),
        cuboid_quats=_ident_quats((1, 1)),
        cylinder_centers=jnp.asarray([[[3.0, 0.0, 0.0]]]),
        cylinder_radii=jnp.asarray([[[1.0]]]),
        cylinder_heights=jnp.asarray([[[2.0]]]),
        cylinder_quats=_ident_quats((1, 1)),
    )
    pts = jnp.asarray([[[2.5, 0.0, 0.0]]])
    out = np.asarray(sdf.scene_sdf(pts, scene))
    # cuboid sdf = 2.0, cylinder sdf = -0.5
    np.testing.assert_allclose(out[0], [-0.5], atol=1e-6)


def test_scene_sdf_empty_is_inf():
    scene = empty_scene(batch_shape=(2,))
    pts = jnp.zeros((2, 5, 3))
    out = np.asarray(sdf.scene_sdf(pts, scene))
    assert np.isinf(out).all()


def test_scene_sdf_sequence_matches_flat():
    key = jax.random.PRNGKey(0)
    scene = SceneSet(
        cuboid_centers=jax.random.normal(key, (2, 3, 3)),
        cuboid_dims=jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (2, 3, 3))) + 0.1,
        cuboid_quats=_ident_quats((2, 3)),
        cylinder_centers=jax.random.normal(jax.random.fold_in(key, 2), (2, 2, 3)),
        cylinder_radii=jnp.abs(jax.random.normal(jax.random.fold_in(key, 3), (2, 2, 1))) + 0.1,
        cylinder_heights=jnp.abs(jax.random.normal(jax.random.fold_in(key, 4), (2, 2, 1))) + 0.1,
        cylinder_quats=_ident_quats((2, 2)),
    )
    pts = jax.random.normal(jax.random.fold_in(key, 5), (2, 4, 6, 3))
    seq = np.asarray(sdf.scene_sdf_sequence(pts, scene))
    for t in range(4):
        flat = np.asarray(sdf.scene_sdf(pts[:, t], scene))
        np.testing.assert_allclose(seq[:, t], flat, atol=1e-6)


def test_cuboid_sdf_gradient_finite_inside():
    """Points exactly at a cuboid center must not produce NaN gradients
    (the reference's known caveat, geometry.py:278-279)."""
    centers = jnp.zeros((1, 1, 3))
    dims = jnp.asarray([[[1.0, 1.0, 1.0]]])
    quats = _ident_quats((1, 1))

    def f(p):
        return jnp.sum(sdf.cuboid_sdf(p, centers, dims, quats))

    g = jax.grad(f)(jnp.zeros((1, 1, 3)))
    assert np.isfinite(np.asarray(g)).all()
