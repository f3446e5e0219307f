"""Round-5 training-stack additions: LR schedule, parameter EMA, success
metrics in validation, and the real-scene DAgger collector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpinets_tpu.data.synthetic import min_jerk_trajectory, training_batch
from mpinets_tpu.geom.assembly import PointCloudSizes
from mpinets_tpu.geom.scene import empty_scene
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.robot import franka
from mpinets_tpu.train import learner, validate
from mpinets_tpu.train.actor import make_real_dagger_collector

pytestmark = pytest.mark.slow  # compile-heavy

TINY_SIZES = PointCloudSizes(robot=128, obstacle=192, target=32)
TINY_MODEL = dict(sa_npoints=(64, 16), sa_nsamples=(32, 16))


def _tiny_setup(batch_size=4, ema=False, optimizer=None):
    batch = jax.jit(
        lambda k: training_batch(k, batch_size, TINY_SIZES)
    )(jax.random.PRNGKey(0))
    model = MotionPolicyNetwork(**TINY_MODEL)
    state = learner.init_state(
        model, jax.random.PRNGKey(1), batch, optimizer, ema=ema
    )
    return model, state, batch


def test_schedule_optimizer_trains():
    opt = learner.make_optimizer(
        1e-3, 1.0, warmup_steps=2, decay_steps=10
    )
    model, state, batch = _tiny_setup(optimizer=opt)
    step = learner.make_train_step(model, opt)
    l0 = None
    for _ in range(6):
        state, metrics = step(state, batch)
        l0 = l0 or float(metrics["val_loss"])
    assert np.isfinite(float(metrics["val_loss"]))


def test_ema_tracks_params():
    opt = learner.make_optimizer(1e-3, 1.0)
    model, state, batch = _tiny_setup(ema=True, optimizer=opt)
    assert state.ema_params is not None
    step = learner.make_train_step(model, opt, ema_decay=0.5)
    p0 = state.params
    for _ in range(3):
        state, _ = step(state, batch)
    # EMA lags params: it stays strictly between init and current params on
    # moving leaves, and is NOT equal to either.
    leaf = lambda t: jax.tree_util.tree_leaves(t)[0]
    assert not np.allclose(np.asarray(leaf(state.ema_params)),
                           np.asarray(leaf(state.params)))
    assert not np.allclose(np.asarray(leaf(state.ema_params)),
                           np.asarray(leaf(p0)))


def test_ema_disabled_is_none():
    _, state, _ = _tiny_setup(ema=False)
    assert state.ema_params is None


def test_validation_reports_success_metrics():
    from mpinets_tpu.data.synthetic import random_problem_batch

    model, state, _ = _tiny_setup()
    fn = validate.make_validation_fn(model, 3, TINY_SIZES, fused=False)
    problems = random_problem_batch(jax.random.PRNGKey(5), 4)
    out = jax.device_get(fn(state.params, problems, jax.random.PRNGKey(6)))
    for k in ("val_success", "val_success_free", "pct_within_1cm",
              "pct_within_5cm", "avg_orient_error_deg", "pct_flip_orient"):
        assert k in out
        assert np.isfinite(float(out[k]))
    assert 0.0 <= float(out["val_success"]) <= 1.0


def test_real_dagger_collector_end_to_end():
    model, state, _ = _tiny_setup()
    b, t = 4, 10
    neutral = jnp.asarray(franka.NEUTRAL_Q, jnp.float32)
    from mpinets_tpu.utils.normalization import clamp_to_limits

    q0 = clamp_to_limits(
        jnp.tile(neutral, (b, 1)) + 0.1 * jax.random.normal(
            jax.random.PRNGKey(7), (b, 7)
        )
    )
    qg = clamp_to_limits(
        jnp.tile(neutral, (b, 1)) + 0.2 * jax.random.normal(
            jax.random.PRNGKey(8), (b, 7)
        )
    )
    expert = min_jerk_trajectory(q0, qg, t)             # [B, T, 7]
    scene = empty_scene((b,))
    problem_batch = {
        "expert": expert,
        "raw_configuration": q0,
        "raw_goal": qg,
        "cuboid_centers": scene.cuboid_centers,
        "cuboid_dims": scene.cuboid_dims,
        "cuboid_quats": scene.cuboid_quats,
        "cylinder_centers": scene.cylinder_centers,
        "cylinder_radii": scene.cylinder_radii,
        "cylinder_heights": scene.cylinder_heights,
        "cylinder_quats": scene.cylinder_quats,
    }
    collect = make_real_dagger_collector(
        model, rollout_steps=3, sizes=TINY_SIZES, opt_steps=10
    )
    batch, info = collect(state.params, jax.random.PRNGKey(9), problem_batch)
    assert batch["xyz"].shape == (b, TINY_SIZES.total, 4)
    assert batch["configuration"].shape == (b, 7)
    assert batch["supervision"].shape == (b, 7)
    accept = float(info["dagger_accept_frac"])
    # empty scene: most relabels accepted (the untrained policy can still
    # wander into self-colliding states, which are correctly rejected and
    # fall back to stored expert steps)
    assert accept >= 0.5
    # supervision stays in normalized range
    assert np.abs(np.asarray(batch["supervision"])).max() <= 1.0 + 1e-5
    # learner consumes the batch unchanged
    step = learner.make_train_step(model)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["val_loss"]))
