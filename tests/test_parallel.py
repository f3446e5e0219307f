"""Sharding-layer tests on the 8-device virtual CPU mesh (SURVEY.md §4:
multi-host logic tested device-count-agnostically)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: run via `pytest -m ''`

from mpinets_tpu.data.synthetic import random_problem_batch, training_batch
from mpinets_tpu.geom.assembly import PointCloudSizes
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.parallel import (
    make_mesh,
    make_sharded_rollout,
    make_sharded_success_stats,
    pad_to_multiple,
)
from mpinets_tpu.train import learner

SIZES = PointCloudSizes(robot=32, obstacle=48, target=16)


def tiny_model():
    return MotionPolicyNetwork(
        sa_npoints=(16, 8), sa_nsamples=(8, 8), sa_radii=(0.05, 0.3)
    )


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_pad_to_multiple():
    assert pad_to_multiple(13, 8) == 16
    assert pad_to_multiple(16, 8) == 16
    assert pad_to_multiple(1, 8) == 8


def test_sharded_rollout_matches_single_device(mesh):
    model = tiny_model()
    rng = jax.random.PRNGKey(0)
    problems = random_problem_batch(jax.random.fold_in(rng, 1), 8)
    params = model.init(
        rng, jnp.zeros((1, SIZES.total, 4)), jnp.zeros((1, 7))
    )

    from mpinets_tpu.rollout.engine import make_rollout_fn

    kwargs = dict(max_steps=3, sizes=SIZES, stop_on_success=True)
    single = make_rollout_fn(model, **kwargs)
    sharded = make_sharded_rollout(model, mesh, **kwargs)

    key = jax.random.fold_in(rng, 2)
    res_sharded = sharded(params, problems, key)

    # The shard_map body on device d runs the plain rollout on its problem
    # slice with fold_in(key, d); replaying exactly that per shard on one
    # device must reproduce the sharded result (same shapes, same RNG
    # streams, same ops).
    shard = 8 // 8  # 8 problems over 8 devices
    for d in range(8):
        sl = slice(d * shard, (d + 1) * shard)
        res_d = single(
            params,
            jax.tree_util.tree_map(lambda x: x[sl], problems),
            jax.random.fold_in(key, d),
        )
        np.testing.assert_allclose(
            np.asarray(res_sharded.trajectories[sl]),
            np.asarray(res_d.trajectories),
            atol=1e-6,
            err_msg=f"shard {d} trajectories diverge",
        )
        np.testing.assert_array_equal(
            np.asarray(res_sharded.num_steps[sl]), np.asarray(res_d.num_steps)
        )
        np.testing.assert_array_equal(
            np.asarray(res_sharded.success[sl]), np.asarray(res_d.success)
        )
    np.testing.assert_array_equal(
        np.asarray(res_sharded.trajectories[:, 0]), np.asarray(problems.q0)
    )


def test_sharded_success_stats(mesh):
    model = tiny_model()
    rng = jax.random.PRNGKey(3)
    problems = random_problem_batch(jax.random.fold_in(rng, 1), 16)
    params = model.init(rng, jnp.zeros((1, SIZES.total, 4)), jnp.zeros((1, 7)))
    stats_fn = make_sharded_success_stats(
        model, mesh, sizes=SIZES, max_steps=2
    )
    stats = stats_fn(params, problems, jax.random.fold_in(rng, 2))
    assert set(stats) == {"success_rate", "mean_steps", "mean_final_pos_err"}
    for v in stats.values():
        assert np.isfinite(np.asarray(v))
    assert 0.0 <= float(stats["success_rate"]) <= 1.0


def test_dp_step_matches_single_device_step(mesh):
    """The psum-mean DP step must match the unsharded step numerically."""
    model = tiny_model()
    rng = jax.random.PRNGKey(7)
    batch = training_batch(jax.random.fold_in(rng, 1), 8, sizes=SIZES)

    state0 = learner.init_state(model, rng, batch)
    single_step = learner.make_train_step(model)
    dp_step = learner.make_data_parallel_step(model, mesh)

    state_a, metrics_a = single_step(state0, batch)
    state_b, metrics_b = dp_step(state0, learner.shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(metrics_a["val_loss"]), float(metrics_b["val_loss"]),
        rtol=1e-4,
    )
    flat_a = jax.tree_util.tree_leaves(state_a.params)
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-6
        )
