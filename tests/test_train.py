"""Training-step tests: loss semantics, single-device learning signal, and
data-parallel equivalence on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mpinets_tpu.data.synthetic import training_batch
from mpinets_tpu.geom.assembly import PointCloudSizes
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.train import learner
from mpinets_tpu.train.loss import collision_loss, point_match_loss
from mpinets_tpu.geom.scene import empty_scene
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: run via `pytest -m ''`

TINY_SIZES = PointCloudSizes(robot=128, obstacle=192, target=32)
TINY_MODEL = dict(sa_npoints=(64, 16), sa_nsamples=(32, 16))


def _tiny_setup(batch_size=8):
    batch = jax.jit(
        lambda k: training_batch(k, batch_size, TINY_SIZES)
    )(jax.random.PRNGKey(0))
    model = MotionPolicyNetwork(**TINY_MODEL)
    state = learner.init_state(model, jax.random.PRNGKey(1), batch)
    return model, state, batch


def test_point_match_loss_zero_for_identical():
    pc = jnp.ones((2, 16, 3))
    assert float(point_match_loss(pc, pc)) == 0.0


def test_collision_loss_empty_scene_zero():
    pc = jnp.zeros((2, 16, 3))
    assert float(collision_loss(pc, empty_scene(batch_shape=(2,)))) == 0.0


def test_collision_loss_hinge_margin():
    # A unit cuboid at origin; a point 1cm outside pays margin - 0.01.
    scene = empty_scene(batch_shape=(1,))._replace(
        cuboid_dims=jnp.full((1, 1, 3), 1.0),
    )
    pc = jnp.asarray([[[0.51, 0.0, 0.0]]])
    val = float(collision_loss(pc, scene))
    np.testing.assert_allclose(val, 0.02, atol=1e-6)
    # Deep inside: margin + depth
    pc_in = jnp.asarray([[[0.0, 0.0, 0.0]]])
    val_in = float(collision_loss(pc_in, scene))
    np.testing.assert_allclose(val_in, 0.03 + 0.5, atol=1e-6)


def test_train_step_reduces_loss():
    model, state, batch = _tiny_setup()
    step = learner.make_train_step(model)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["val_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_batch_shapes():
    _, _, batch = _tiny_setup()
    assert batch["xyz"].shape == (8, TINY_SIZES.total, 4)
    assert batch["configuration"].shape == (8, 7)
    assert np.abs(np.asarray(batch["configuration"])).max() <= 1.0 + 1e-5
    assert np.abs(np.asarray(batch["supervision"])).max() <= 1.0 + 1e-5


def test_data_parallel_step_matches_single_device():
    model, state, batch = _tiny_setup(batch_size=8)
    single = learner.make_train_step(model)
    # Executing CPU collectives needs one schedulable thread per participant;
    # cap mesh size at the physical core count (this box has 2) to keep the
    # XLA rendezvous from timing out. Full 8-device sharding is still
    # compile-checked by test_graft_entry / dryrun_multichip.
    import os

    n_dev = max(2, min(len(jax.devices()), os.cpu_count() or 2))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    dp = learner.make_data_parallel_step(model, mesh)

    s1, m1 = single(state, batch)
    sharded_batch = learner.shard_batch(batch, mesh)
    s8, m8 = dp(state, sharded_batch)

    # Loss metrics agree (mean over shards == global mean for equal shards).
    np.testing.assert_allclose(
        float(m1["point_match_loss"]), float(m8["point_match_loss"]), rtol=2e-4
    )
    # Parameters after one step agree.
    flat1 = jax.tree.leaves(s1.params)
    flat8 = jax.tree.leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_hinge_fires_on_near_collision_configs():
    """bc_losses' collision hinge + activation diagnostic must FIRE when the
    predicted configuration puts the robot near scene geometry (VERDICT r3
    #4: verify the loss is live before blaming the data distribution)."""
    import jax

    from mpinets_tpu.geom.scene import empty_scene
    from mpinets_tpu.kernels import kinematics
    from mpinets_tpu.robot import franka
    from mpinets_tpu.train.loss import bc_losses
    from mpinets_tpu.utils.normalization import normalize_franka_joints

    q = jnp.asarray(franka.NEUTRAL_Q, jnp.float32)[None]
    qn = normalize_franka_joints(q)
    # wall right through the neutral-pose end effector
    _, eff = kinematics.eff_pose(q[0])
    scene = empty_scene(batch_shape=(1,))._replace(
        cuboid_dims=jnp.full((1, 1, 3), 0.2),
        cuboid_centers=eff[None, None, :],
        cuboid_quats=jnp.asarray([[[1.0, 0.0, 0.0, 0.0]]]),
    )
    coll, pm, active = jax.jit(bc_losses)(qn, qn, scene)
    assert float(coll) > 0.0, "collision hinge did not fire near a wall"
    assert float(active) > 0.0
    assert float(pm) == 0.0

    # far-away wall: hinge silent
    far = scene._replace(
        cuboid_centers=jnp.asarray([[[5.0, 5.0, 5.0]]])
    )
    coll2, _, active2 = jax.jit(bc_losses)(qn, qn, far)
    assert float(coll2) == 0.0
    assert float(active2) == 0.0

    # and its gradient pushes the configuration (nonzero wrt y_hat)
    g = jax.grad(lambda y: bc_losses(y, qn, scene)[0])(qn)
    assert float(jnp.abs(g).max()) > 0.0
