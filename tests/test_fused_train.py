"""The differentiable fused train path (model/fused_train.py): parameter
gradients through the Pallas forward + saved-index VJP must match the flax
``model.apply`` gradients (reference training semantics,
``/root/reference/mpinets/model.py:185-240``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpinets_tpu.model.fused_train import make_fused_train_apply
from mpinets_tpu.model.policy import MotionPolicyNetwork

pytestmark = pytest.mark.slow  # interpret-mode Pallas on CPU is heavy

NPOINTS = (16, 8)


def _setup():
    model = MotionPolicyNetwork(sa_npoints=NPOINTS)
    key = jax.random.PRNGKey(11)
    pc = jnp.concatenate(
        [
            jax.random.uniform(key, (2, 256, 3), minval=-0.7, maxval=0.7),
            jax.random.randint(key, (2, 256, 1), 0, 3).astype(jnp.float32),
        ],
        axis=-1,
    )
    q = jax.random.uniform(
        jax.random.fold_in(key, 1), (2, 7), minval=-1, maxval=1
    )
    variables = model.init(jax.random.fold_in(key, 2), pc, q)
    # Perturb off the freshly-initialized point: flax init has ALL-ZERO
    # biases, which puts many pre-activations and max-pool inputs at exact
    # numerical ties; jnp.max/maximum split tie cotangents evenly, and the
    # kernel's algebraically folded recentring (x@W - c.W[:3] vs (x-c)@W)
    # perturbs those exact equalities at the 1e-7 level, selecting a
    # DIFFERENT (equally valid) subgradient. At any non-degenerate
    # parameter point the two paths' gradients agree to ~1e-5 relative.
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    ks = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    leaves = [l + 0.01 * jax.random.normal(k, l.shape)
              for l, k in zip(leaves, ks)]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    return model, variables, pc, q


def test_fused_train_value_and_grads_match_flax():
    model, variables, pc, q = _setup()
    fused = make_fused_train_apply(
        compute_dtype=jnp.float32, interpret=True, sa_npoints=NPOINTS
    )

    def loss_ref(v):
        return jnp.sum(jnp.sin(model.apply(v, pc, q)))

    def loss_fused(v):
        return jnp.sum(jnp.sin(fused(v, pc, q)))

    v_ref, g_ref = jax.value_and_grad(loss_ref)(variables)
    v_fused, g_fused = jax.value_and_grad(loss_fused)(variables)
    np.testing.assert_allclose(
        float(v_fused), float(v_ref), atol=1e-5, rtol=1e-4
    )

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, a), b in zip(flat_ref, flat_fused):
        name = jax.tree_util.keystr(path)
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5 + 1e-4 * scale,
            err_msg=f"grad mismatch at {name}",
        )


def test_fused_train_step_tracks_xla_step():
    """Optimizer steps through the fused train path must track the plain
    XLA train step's loss trajectory (same data, same init) step by step."""
    from mpinets_tpu.data.synthetic import training_batch
    from mpinets_tpu.geom.assembly import PointCloudSizes
    from mpinets_tpu.train import learner

    sizes = PointCloudSizes(robot=128, obstacle=112, target=16)
    model = MotionPolicyNetwork(sa_npoints=NPOINTS)
    rng = jax.random.PRNGKey(0)
    batch = training_batch(rng, 2, sizes=sizes)
    apply_fn = make_fused_train_apply(
        compute_dtype=jnp.float32, interpret=True, sa_npoints=NPOINTS
    )
    trajectories = {}
    for name, fn in (("xla", None), ("fused", apply_fn)):
        state = learner.init_state(model, rng, batch)
        step = learner.make_train_step(model, apply_fn=fn)
        losses = []
        for _ in range(6):
            state, metrics = step(state, batch)
            losses.append(float(metrics["val_loss"]))
        trajectories[name] = np.asarray(losses)
    assert np.isfinite(trajectories["fused"]).all()
    # The all-zero-bias init picks different (equally valid) subgradients at
    # exact max/relu ties (see _setup); 6 compounding Adam steps amplify
    # that to ~20% relative late in the transient where the loss is small,
    # so the tolerance carries an absolute floor.
    np.testing.assert_allclose(
        trajectories["fused"], trajectories["xla"], rtol=0.2, atol=0.02,
        err_msg="fused train step diverged from the XLA step trajectory",
    )
