"""Expert-trajectory synthesis and verification, batched in JAX.

The reference's expert pipeline (``/root/reference/mpinets/data_pipeline/
gen_data.py``) plans with OMPL AIT* + NVIDIA Lula geometric fabrics — CPU
C++ libraries that are deliberately not rebuilt here (SURVEY.md §2.2: the
published datasets are pregenerated). What *is* rebuilt, TPU-native, is
everything around the planner that defines the data contract:

* **candidate path synthesis** — smooth configuration-space paths between
  candidate pairs (direct + via-waypoint minimum-jerk families), batched;
* **verification** (``gen_data.py:327-430``): target miss > 5 cm, jerk
  > 0.15, self-collision, environment collision, joint limits — all five
  predicates evaluated on device over whole batches of trajectories;
* **constant-velocity retiming to 50 steps** (``gen_data.py:310-324``).

Any planner (including an external OMPL run) can be slotted in as a
trajectory source; the verification + retiming + writing path is shared.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpinets_tpu.geom.scene import SceneSet  # noqa: F401  (type reference)
from mpinets_tpu.kernels import kinematics, sdf
from mpinets_tpu.robot import franka

SEQUENCE_LENGTH = 50      # gen_data.py:77
MAX_JERK = 0.15           # gen_data.py:80
MISS_TOLERANCE = 0.05     # 5 cm, gen_data.py verification
#: Dense sample count used for collision checking before retiming.
DENSE_STEPS = 150


class VerifyResult(NamedTuple):
    """Per-trajectory failure predicates (gen_data.py:91-103 error codes)."""

    valid: jnp.ndarray           # [...]
    miss: jnp.ndarray            # [...] final EE position error (m)
    max_jerk: jnp.ndarray        # [...] max |third difference|
    has_self_collision: jnp.ndarray  # [...]
    has_env_collision: jnp.ndarray   # [...]
    within_limits: jnp.ndarray       # [...]


def min_jerk_interp(q_a: jnp.ndarray, q_b: jnp.ndarray, length: int) -> jnp.ndarray:
    """Minimum-jerk time scaling of the straight segment a->b: [..., length, 7]."""
    s = jnp.linspace(0.0, 1.0, length)
    s = 10 * s**3 - 15 * s**4 + 6 * s**5
    return q_a[..., None, :] + s[:, None] * (q_b - q_a)[..., None, :]


def via_point_path(
    q_a: jnp.ndarray, q_via: jnp.ndarray, q_b: jnp.ndarray, length: int
) -> jnp.ndarray:
    """Two blended minimum-jerk segments a->via->b with continuous velocity
    (the second half starts where the first ends), [..., length, 7]."""
    h = length // 2
    first = min_jerk_interp(q_a, q_via, h + 1)
    second = min_jerk_interp(q_via, q_b, length - h)
    return jnp.concatenate([first[..., :-1, :], second], axis=-2)


def constant_velocity_retime(
    traj: jnp.ndarray, length: int = SEQUENCE_LENGTH
) -> jnp.ndarray:
    """Resample a path to ``length`` steps at constant configuration-space
    speed (``gen_data.py:310-324``): uniform positions along cumulative arc
    length, linear interpolation between input supports.

    traj: [T, 7] -> [length, 7]
    """
    seg = jnp.linalg.norm(jnp.diff(traj, axis=0), axis=-1)  # [T-1]
    cum = jnp.concatenate([jnp.zeros((1,), traj.dtype), jnp.cumsum(seg)])
    total = jnp.maximum(cum[-1], 1e-9)
    s_new = jnp.linspace(0.0, 1.0, length) * total
    idx = jnp.clip(jnp.searchsorted(cum, s_new, side="right") - 1, 0,
                   traj.shape[0] - 2)
    s0 = cum[idx]
    s1 = cum[idx + 1]
    w = jnp.where(s1 > s0, (s_new - s0) / jnp.maximum(s1 - s0, 1e-12), 0.0)
    return traj[idx] + w[:, None] * (traj[idx + 1] - traj[idx])


def trajectory_max_jerk(traj: jnp.ndarray) -> jnp.ndarray:
    """Max |third finite difference| over steps and joints
    (the reference's jerk cutoff operates on the retimed 50-step
    trajectory, ``gen_data.py:80,396-430``). traj: [..., T, 7] -> [...]."""
    jerk = jnp.diff(traj, n=3, axis=-2)
    return jnp.max(jnp.abs(jerk), axis=(-2, -1))


def env_collision_any(traj: jnp.ndarray, scene) -> jnp.ndarray:
    """True when any collision sphere penetrates the scene at any step.

    traj: [T, 7]; scene unbatched -> bool []
    """
    centers = kinematics.scene_collision_spheres(traj)  # [T, 56, 3]
    radii = jnp.asarray(franka.SCENE_SPHERE_RADII, traj.dtype)
    d = sdf.scene_sdf(centers.reshape(-1, 3)[None], scene)[0]
    d = d.reshape(traj.shape[0], -1)
    return jnp.any(d < radii, axis=(0, 1))


def verify_trajectory(
    traj: jnp.ndarray,
    target_rot: jnp.ndarray,
    target_trans: jnp.ndarray,
    scene,
) -> VerifyResult:
    """All five reference failure predicates on one trajectory
    (``gen_data.py:396-430``). traj: [T, 7]; vmap for batches."""
    _, trans = kinematics.eff_pose(traj[-1])
    miss = jnp.linalg.norm(trans - target_trans, axis=-1)
    jerk = trajectory_max_jerk(traj)
    self_c = jnp.any(kinematics.self_collision(traj))
    env_c = env_collision_any(traj, scene)
    # The reference verifies against the tighter empirical FrankaRealRobot
    # limits (gen_data.py:391), not the published table (advisor finding r1).
    limits = jnp.all(kinematics.within_limits(traj, use_real_constraints=True))
    valid = (
        (miss <= MISS_TOLERANCE)
        & (jerk <= MAX_JERK)
        & ~self_c
        & ~env_c
        & limits
    )
    return VerifyResult(valid, miss, jerk, self_c, env_c, limits)


def _severity(res: VerifyResult) -> jnp.ndarray:
    """Scalar badness of a verified trajectory (lower is better): number of
    failed predicates dominates, miss/jerk magnitudes break ties. Used to
    keep the best *attempted* trajectory when no restart is valid, so that
    failure-code tallies diagnose a real trajectory — the reference
    attributes error codes to the actual failed trajectory
    (``gen_data.py:419-430``), never to a placeholder."""
    fails = (
        (res.miss > MISS_TOLERANCE).astype(jnp.float32)
        + (res.max_jerk > MAX_JERK)
        + res.has_self_collision
        + res.has_env_collision
        + (~res.within_limits)
    )
    return 100.0 * fails + res.miss + res.max_jerk


class PlanResult(NamedTuple):
    trajectory: jnp.ndarray  # [SEQUENCE_LENGTH, 7]
    valid: jnp.ndarray       # [] bool
    which: jnp.ndarray       # [] int32: index of the accepted candidate path
    score: jnp.ndarray       # [] f32 severity of the returned trajectory


@functools.partial(jax.jit, static_argnames=())
def plan_pair(
    q_start: jnp.ndarray,
    q_goal: jnp.ndarray,
    target_rot: jnp.ndarray,
    target_trans: jnp.ndarray,
    scene,
) -> PlanResult:
    """Plan one candidate pair: try a family of smooth paths, verify each on
    the dense sampling, and keep the first valid one retimed to 50 steps.

    The family plays the role of the reference's AIT* + fabric pipeline at
    the scale this environment supports: direct minimum-jerk, via the
    neutral posture, and via two lifted blends of start/goal with the
    neutral elbow. vmap over pairs for batch planning.
    """
    neutral = jnp.asarray(franka.NEUTRAL_Q, q_start.dtype)
    mid = (q_start + q_goal) / 2
    candidates = jnp.stack(
        [
            min_jerk_interp(q_start, q_goal, DENSE_STEPS),
            via_point_path(q_start, neutral, q_goal, DENSE_STEPS),
            via_point_path(q_start, 0.5 * mid + 0.5 * neutral, q_goal,
                           DENSE_STEPS),
            via_point_path(q_start, 0.75 * mid + 0.25 * neutral, q_goal,
                           DENSE_STEPS),
        ]
    )  # [C, T, 7]

    results = jax.vmap(
        lambda t: verify_trajectory(t, target_rot, target_trans, scene)
    )(candidates)
    # Jerk is checked on the *retimed* trajectory below; for selection use
    # the collision/limit/miss predicates on the dense path.
    ok_dense = (
        (results.miss <= MISS_TOLERANCE)
        & ~results.has_self_collision
        & ~results.has_env_collision
        & results.within_limits
    )
    which = jnp.argmax(ok_dense)  # first True (argmax of bools)
    traj = constant_velocity_retime(candidates[which])
    final = verify_trajectory(traj, target_rot, target_trans, scene)
    return PlanResult(
        traj, jnp.any(ok_dense) & final.valid, which.astype(jnp.int32),
        _severity(final),
    )


def plan_pairs_batch(
    q_starts: jnp.ndarray,
    q_goals: jnp.ndarray,
    target_rots: jnp.ndarray,
    target_transs: jnp.ndarray,
    scene,
) -> PlanResult:
    """vmap of :func:`plan_pair` over a batch sharing one scene."""
    return jax.vmap(plan_pair, in_axes=(0, 0, 0, 0, None))(
        q_starts, q_goals, target_rots, target_transs, scene
    )


# ---------------------------------------------------------------------------
# Scene-aware trajectory optimization (the batched planner)
# ---------------------------------------------------------------------------
# The smooth candidate family above cannot route around clutter. This is a
# CHOMP-style trajectory optimizer playing the role of the reference's
# AIT* + fabric pipeline (gen_data.py:106-307) in a TPU-native form: the
# whole path is a decision variable, the collision cost is the 57-sphere
# model against the scene SDF, and jax.grad differentiates through batched
# FK -- so THOUSANDS of (start, goal) pairs optimize in lockstep under vmap.

#: collision clearance margin for the optimizer's hinge cost (m)
OPT_MARGIN = 0.02
OPT_STEPS = 120
OPT_PATH_LEN = 50


def _path_cost(
    interior: jnp.ndarray,   # [T-2, 7] free waypoints
    q_start: jnp.ndarray,
    q_goal: jnp.ndarray,
    scene,
    collision_weight: float = 40.0,
    smooth_weight: float = 4.0,
) -> jnp.ndarray:
    traj = jnp.concatenate(
        [q_start[None], interior, q_goal[None]], axis=0
    )  # [T, 7]
    # smoothness: squared second differences (CHOMP's prior)
    acc = traj[2:] - 2.0 * traj[1:-1] + traj[:-2]
    smooth = jnp.sum(acc * acc)
    # collision: hinge on sphere clearance along the whole path
    centers = kinematics.scene_collision_spheres(traj)      # [T, 56, 3]
    radii = jnp.asarray(franka.SCENE_SPHERE_RADII, traj.dtype)
    d = sdf.scene_sdf(centers.reshape(-1, 3)[None], scene)[0]
    pen = jnp.maximum(radii[None, :] + OPT_MARGIN
                      - d.reshape(traj.shape[0], -1), 0.0)
    collision = jnp.sum(pen * pen)
    # joint-limit barrier
    lim = jnp.asarray(franka.REAL_JOINT_LIMITS, traj.dtype)
    over = jnp.maximum(traj - lim[:, 1], 0.0) + jnp.maximum(lim[:, 0] - traj, 0.0)
    limits = jnp.sum(over * over)
    return (
        smooth_weight * smooth
        + collision_weight * collision
        + 100.0 * limits
    )


@functools.partial(jax.jit, static_argnames=("steps",))
def optimize_trajectory(
    q_start: jnp.ndarray,
    q_goal: jnp.ndarray,
    scene,
    init: jnp.ndarray | None = None,
    steps: int = OPT_STEPS,
    lr: float = 0.02,
) -> jnp.ndarray:
    """Gradient trajectory optimization from start to goal (single problem;
    vmap for batches). Returns a [OPT_PATH_LEN, 7] limit-clamped path."""
    if init is None:
        init = min_jerk_interp(q_start, q_goal, OPT_PATH_LEN)
    interior0 = init[1:-1]
    grad_fn = jax.grad(_path_cost)
    # shrink the clamp range slightly: waypoints clamped EXACTLY to a limit
    # would fail the strict within-limits verification predicate
    lim = jnp.asarray(franka.REAL_JOINT_LIMITS, q_start.dtype)
    lim = lim.at[:, 0].add(1e-4).at[:, 1].add(-1e-4)

    def body(carry, _):
        interior, m = carry
        g = grad_fn(interior, q_start, q_goal, scene)
        m = 0.9 * m + g                       # heavy-ball momentum
        interior = interior - lr * m
        interior = jnp.clip(interior, lim[:, 0], lim[:, 1])
        return (interior, m), None

    (interior, _), _ = jax.lax.scan(
        body, (interior0, jnp.zeros_like(interior0)), None, length=steps
    )
    return jnp.concatenate([q_start[None], interior, q_goal[None]], axis=0)


def _via_init(q_start, via, q_goal):
    """Two-segment min-jerk seed through a via configuration."""
    half = OPT_PATH_LEN // 2 + 1
    a = min_jerk_interp(q_start, via, half)
    b = min_jerk_interp(via, q_goal, OPT_PATH_LEN - half + 1)
    return jnp.concatenate([a, b[1:]], axis=0)


#: sampled-via global stage (r4): candidate count and survivors
VIA_SAMPLES = 48
VIA_KEEP = 2


def sample_via_configs(
    key: jax.Array,
    q_start: jnp.ndarray,
    q_goal: jnp.ndarray,
    scene,
    n_samples: int = VIA_SAMPLES,
    n_keep: int = VIA_KEEP,
) -> jnp.ndarray:
    """Coarse batched global stage feeding the optimizer (the TPU-native
    stand-in for a sampling-based planner's exploration, VERDICT r3 #5):
    sample random via configurations (half uniform in the joint limits,
    half Gaussian around the start/goal midpoint), filter by 57-sphere
    scene clearance, rank by the collision+length cost of the two-segment
    path through each via, and return the best ``n_keep`` as optimizer
    seeds. Fully vmappable — thousands of pairs run this in lockstep.

    Returns [n_keep, 7] via configurations (infeasible scenes still return
    the least-bad vias; the downstream optimizer + verifier reject them).
    """
    from mpinets_tpu.kernels import ik as ik_mod

    lim = jnp.asarray(franka.REAL_JOINT_LIMITS, q_start.dtype)
    span = lim[:, 1] - lim[:, 0]
    ku, kn = jax.random.split(key)
    n_u = n_samples // 2
    vias_u = lim[:, 0] + jax.random.uniform(
        ku, (n_u, 7), dtype=q_start.dtype
    ) * span
    mid = 0.5 * (q_start + q_goal)
    vias_m = mid + jax.random.normal(
        kn, (n_samples - n_u, 7), dtype=q_start.dtype
    ) * (0.25 * span)
    vias = jnp.clip(
        jnp.concatenate([vias_u, vias_m], axis=0), lim[:, 0], lim[:, 1]
    )                                                       # [K, 7]

    free = ik_mod.franka_free_space(vias, scene, margin=0.01)  # [K]

    paths = jax.vmap(
        lambda v: via_point_path(q_start, v, q_goal, 24)
    )(vias)                                                 # [K, 24, 7]
    centers = kinematics.scene_collision_spheres(
        paths.reshape(-1, 7)
    )                                                       # [K*24, 56, 3]
    radii = jnp.asarray(franka.SCENE_SPHERE_RADII, q_start.dtype)
    d = sdf.scene_sdf(centers.reshape(-1, 3)[None], scene)[0]
    pen = jnp.maximum(
        radii[None, :] + OPT_MARGIN - d.reshape(centers.shape[0], -1), 0.0
    )
    pen_per_path = jnp.sum(
        (pen * pen).reshape(n_samples, -1), axis=-1
    )
    length = jnp.sum(
        jnp.linalg.norm(jnp.diff(paths, axis=1), axis=-1), axis=-1
    )
    score = 100.0 * pen_per_path + length + jnp.where(free, 0.0, 1e6)
    _, top = jax.lax.top_k(-score, n_keep)
    return vias[top]                                        # [n_keep, 7]


# ---------------------------------------------------------------------------
# Lazy-PRM global stage (r5)
# ---------------------------------------------------------------------------
# The r4 dresser A/B proved local optimizer restarts are SATURATED: blocked
# drawer-to-drawer transfers need graph search, not more seeds. This is the
# reference's sampling-based global planner (AIT*, gen_data.py:106-153)
# re-designed as fixed-shape batched linear algebra: sample a node set,
# validate nodes and k-NN edges with the 57-sphere/SDF model, run min-plus
# (Bellman-Ford) iterations over the dense cost matrix, and backtrack a
# bounded-hop path — everything vmappable over thousands of pairs in
# lockstep, no data-dependent control flow.

#: PRM node count (excluding start/goal), edge fan-out, interior edge
#: samples, max path hops, edge length cap (rad, 7-D L2).
PRM_NODES = 126
PRM_KNN = 14
PRM_EDGE_SAMPLES = 6
PRM_MAX_HOPS = 12
PRM_EDGE_CAP = 2.8
PRM_MARGIN = 0.01


def prm_waypoints(
    key: jax.Array,
    q_start: jnp.ndarray,
    q_goal: jnp.ndarray,
    scene,
    n_nodes: int = PRM_NODES,
    knn: int = PRM_KNN,
    n_edge_samples: int = PRM_EDGE_SAMPLES,
    max_hops: int = PRM_MAX_HOPS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shortest collision-free waypoint chain from start to goal over a
    sampled roadmap. Returns (waypoints [max_hops + 2, 7], found bool[]).

    Waypoints are padded by repeating the goal; when no path exists,
    ``found`` is False and the waypoints are the straight a->b chain (the
    caller's optimizer seed degrades to the existing behavior).
    """
    lim = jnp.asarray(franka.REAL_JOINT_LIMITS, q_start.dtype)
    span = lim[:, 1] - lim[:, 0]
    ku, kn, km = jax.random.split(key, 3)
    n_u = n_nodes // 2
    nodes_u = lim[:, 0] + jax.random.uniform(
        ku, (n_u, 7), dtype=q_start.dtype
    ) * span
    mid = 0.5 * (q_start + q_goal)
    anchors = jnp.stack([q_start, q_goal, mid])
    pick = jax.random.randint(km, (n_nodes - n_u,), 0, 3)
    nodes_n = anchors[pick] + jax.random.normal(
        kn, (n_nodes - n_u, 7), dtype=q_start.dtype
    ) * (0.22 * span)
    nodes = jnp.concatenate(
        [q_start[None], q_goal[None],
         jnp.clip(jnp.concatenate([nodes_u, nodes_n]), lim[:, 0], lim[:, 1])]
    )                                                        # [V, 7]
    v = nodes.shape[0]

    from mpinets_tpu.kernels import ik as ik_mod

    node_free = ik_mod.franka_free_space(nodes, scene, margin=PRM_MARGIN)
    # Start/goal are given as feasible (they passed candidate IK); keep them
    # usable even if the margin'd check is borderline at the contact pose.
    node_free = node_free.at[0].set(True).at[1].set(True)

    dist = jnp.linalg.norm(
        nodes[:, None, :] - nodes[None, :, :], axis=-1
    )                                                        # [V, V]
    # k-NN candidate edges per node (excluding self via +inf diagonal).
    dist_ = dist + jnp.where(jnp.eye(v, dtype=bool), jnp.inf, 0.0)
    _, nbr = jax.lax.top_k(-dist_, knn)                      # [V, knn]

    # Interior samples of every candidate edge. Checked in knn-axis chunks
    # via lax.map: one flat [V*knn*S] free-space batch fuses into a
    # [pairs, V*knn*S, 56 spheres, prims, 3] intermediate that OOMs HBM on
    # 40-primitive dresser scenes (18.5 GB measured); per-chunk it peaks
    # ~1 GB at the same math.
    t = jnp.linspace(0.0, 1.0, n_edge_samples + 2)[1:-1]     # [S]
    a = nodes[:, None, None, :]                              # [V, 1, 1, 7]
    b = nodes[nbr][:, :, None, :]                            # [V, knn, 1, 7]
    pts = a + t[None, None, :, None] * (b - a)               # [V, knn, S, 7]

    def _edge_chunk(p):                                      # [V, S, 7]
        return ik_mod.franka_free_space(
            p.reshape(-1, 7), scene, margin=PRM_MARGIN
        ).reshape(v, n_edge_samples)

    free = jnp.moveaxis(
        jax.lax.map(_edge_chunk, jnp.moveaxis(pts, 1, 0)), 0, 1
    )                                                        # [V, knn, S]
    edge_len = jnp.take_along_axis(dist_, nbr, axis=1)       # [V, knn]
    edge_ok = (
        jnp.all(free, axis=-1)
        & node_free[:, None]
        & node_free[nbr]
        & (edge_len <= PRM_EDGE_CAP)
    )

    # Dense symmetric cost matrix from the k-NN edges.
    w = jnp.full((v, v), jnp.inf, q_start.dtype)
    rows = jnp.broadcast_to(jnp.arange(v)[:, None], (v, knn))
    w = w.at[rows, nbr].min(jnp.where(edge_ok, edge_len, jnp.inf))
    w = jnp.minimum(w, w.T)

    # Min-plus relaxation: D[v] = shortest distance from start.
    d0 = jnp.full((v,), jnp.inf, q_start.dtype).at[0].set(0.0)

    def relax(d, _):
        return jnp.minimum(d, jnp.min(d[:, None] + w, axis=0)), None

    d, _ = jax.lax.scan(relax, d0, None, length=max_hops)
    found = jnp.isfinite(d[1])

    # Greedy backtrack from the goal: prev(v) = argmin_u d[u] + w[u, v].
    def back(carry, _):
        cur = carry
        prev = jnp.argmin(d + w[:, cur])
        # stop moving once at the start
        nxt = jnp.where(cur == 0, 0, prev)
        return nxt, cur

    _, rev = jax.lax.scan(back, jnp.asarray(1), None, length=max_hops + 2)
    # rev = [goal, ..., start, start, ...]; reverse into start->goal order.
    path_idx = rev[::-1]                                     # [H+2]
    # left-padded with start repeats; fine for a polyline seed.
    waypoints = nodes[path_idx]
    straight = jnp.concatenate(
        [q_start[None],
         min_jerk_interp(q_start, q_goal, max_hops), q_goal[None]]
    )
    waypoints = jnp.where(found, waypoints, straight)
    return waypoints, found


def prm_seed(
    key: jax.Array,
    q_start: jnp.ndarray,
    q_goal: jnp.ndarray,
    scene,
) -> jnp.ndarray:
    """Optimizer seed from the PRM path: the waypoint polyline resampled to
    ``OPT_PATH_LEN`` at constant speed (duplicate padding nodes collapse —
    zero-length segments get zero arc-length weight)."""
    waypoints, _ = prm_waypoints(key, q_start, q_goal, scene)
    return constant_velocity_retime(waypoints, OPT_PATH_LEN)


def _try_optimized(q_start, q_goal, target_rot, target_trans, scene, init,
                   opt_steps: int = OPT_STEPS):
    """One optimizer restart: optimize, dense-verify, retime, final-verify.
    Returns (traj [SEQUENCE_LENGTH, 7], valid, severity score)."""
    opt = optimize_trajectory(q_start, q_goal, scene, init=init,
                              steps=opt_steps)
    t = jnp.linspace(0.0, OPT_PATH_LEN - 1.0, DENSE_STEPS)
    lo = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, OPT_PATH_LEN - 2)
    frac = (t - lo)[:, None]
    dense_opt = opt[lo] * (1.0 - frac) + opt[lo + 1] * frac
    res = verify_trajectory(dense_opt, target_rot, target_trans, scene)
    ok = (
        (res.miss <= MISS_TOLERANCE)
        & ~res.has_self_collision
        & ~res.has_env_collision
        & res.within_limits
    )
    traj = constant_velocity_retime(dense_opt)
    final = verify_trajectory(traj, target_rot, target_trans, scene)
    return traj, ok & final.valid, _severity(final)


@functools.partial(
    jax.jit, static_argnames=("opt_steps", "n_vias", "n_prm")
)
def plan_pair_optimized(
    q_start: jnp.ndarray,
    q_goal: jnp.ndarray,
    target_rot: jnp.ndarray,
    target_trans: jnp.ndarray,
    scene,
    key: jax.Array | None = None,
    opt_steps: int = OPT_STEPS,
    n_vias: int = VIA_KEEP,
    n_prm: int = 0,
) -> PlanResult:
    """Full planning attempt: smooth family first, then MULTI-RESTART
    SDF-cost optimization (straight-line seed plus two via-configuration
    seeds). The via restarts stand in for the reference's sampling-based
    global planner on scenes where the straight-line basin is blocked --
    e.g. cubby pocket-to-pocket transfers, which must retract out of the
    start pocket before re-entering (r3 at-scale measurement: cubby
    valid-rate was 26.8% with the single straight-line seed,
    env-collision-dominated). vmap over pairs for batched generation.

    When NO attempt is valid, the returned trajectory is the best *attempted*
    one (lowest :func:`_severity` across the family pick and all optimizer
    restarts) — never a placeholder — so downstream failure-code tallies
    diagnose a real failure mode (reference convention
    ``gen_data.py:419-430``; r3's zeros placeholder made the at-scale
    miss/self-collision/limits columns an artifact)."""
    family = plan_pair(q_start, q_goal, target_rot, target_trans, scene)

    neutral = jnp.asarray(franka.NEUTRAL_Q, q_start.dtype)
    retract = 0.5 * (q_start + q_goal)
    # a retract via: shoulder/elbow pulled toward neutral, wrist averaged
    retract = retract.at[1].set(neutral[1]).at[3].set(neutral[3])
    if key is None:
        # deterministic per-pair key derived from the endpoint configs
        key = jax.random.fold_in(
            jax.random.PRNGKey(0x5EED),
            jnp.sum(q_start * 1e4 + q_goal * 1e3).astype(jnp.int32),
        )
    sampled_vias = sample_via_configs(key, q_start, q_goal, scene,
                                      n_keep=n_vias)
    seeds = [
        min_jerk_interp(q_start, q_goal, OPT_PATH_LEN),
        _via_init(q_start, neutral, q_goal),
        _via_init(q_start, retract, q_goal),
    ] + [
        _via_init(q_start, sampled_vias[i], q_goal)
        for i in range(sampled_vias.shape[0])
    ] + [
        # r5 global stage: lazy-PRM shortest paths as optimizer seeds
        # (independent roadmaps per seed).
        prm_seed(jax.random.fold_in(key, 1000 + i), q_start, q_goal, scene)
        for i in range(n_prm)
    ]
    valid_opt = jnp.asarray(False)
    which_opt = jnp.asarray(99, jnp.int32)
    traj_opt = jnp.zeros((SEQUENCE_LENGTH, q_start.shape[-1]), q_start.dtype)
    # best-attempt fallback, seeded with the family's chosen candidate
    best_traj = family.trajectory
    best_score = family.score
    best_which = family.which
    for i, seed in enumerate(seeds):
        traj_i, ok_i, score_i = _try_optimized(
            q_start, q_goal, target_rot, target_trans, scene, seed,
            opt_steps=opt_steps,
        )
        take = ok_i & ~valid_opt
        traj_opt = jnp.where(take, traj_i, traj_opt)
        which_opt = jnp.where(take, 99 + i, which_opt)
        valid_opt = valid_opt | ok_i
        better = score_i < best_score
        best_traj = jnp.where(better, traj_i, best_traj)
        best_score = jnp.where(better, score_i, best_score)
        best_which = jnp.where(better, 99 + i, best_which)

    use_family = family.valid
    valid = family.valid | valid_opt
    traj = jnp.where(
        use_family, family.trajectory, jnp.where(valid_opt, traj_opt, best_traj)
    )
    which = jnp.where(
        use_family, family.which, jnp.where(valid_opt, which_opt, best_which)
    )
    score = jnp.where(valid, 0.0, best_score)
    return PlanResult(traj, valid, which.astype(jnp.int32), score)
