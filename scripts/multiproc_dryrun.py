"""True multi-PROCESS data-parallel dry run on CPU (VERDICT r3 #8).

The 8-device dryrun (`__graft_entry__.dryrun_multichip`) is a single-process
virtual mesh; this script exercises the DCN-path code for real: it spawns
N >= 2 actual OS processes, each with its own local CPU devices, joins them
through ``jax.distributed.initialize`` (the rendezvous the reference's DDP
multi-node leg performs via torch/NCCL, ``run_training.py:71-77``), builds
the GLOBAL mesh, feeds each process only its ``process_local_slice`` of the
batch via ``jax.make_array_from_process_local_data``, and runs DP training
steps whose gradient pmean crosses the process boundary.

Writes MULTIPROC_r04.json at the repo root:
    {"n_processes": 2, "devices_per_process": 2, "global_devices": 4,
     "steps": 2, "val_loss": ..., "cross_process_agreement": true, "ok": true}

Usage:  python scripts/multiproc_dryrun.py            # parent: spawns workers
        (workers are re-invocations with --process-id)
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROCESSES = 2
DEVICES_PER_PROCESS = 2
PORT = 29517


def worker(process_id: int) -> None:
    import jax

    # The axon plugin chooses the TPU backend even under JAX_PLATFORMS=cpu;
    # force CPU through jax.config like tests/conftest.py does.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from mpinets_tpu.parallel.mesh import (
        make_mesh, multihost_init, process_local_slice,
    )
    from mpinets_tpu.data.synthetic import training_batch
    from mpinets_tpu.geom.assembly import PointCloudSizes
    from mpinets_tpu.model.policy import MotionPolicyNetwork
    from mpinets_tpu.train import learner
    from jax.sharding import NamedSharding, PartitionSpec as P

    multihost_init(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROCESSES,
        process_id=process_id,
    )
    assert jax.process_count() == N_PROCESSES, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == N_PROCESSES * DEVICES_PER_PROCESS, n_global
    assert len(jax.local_devices()) == DEVICES_PER_PROCESS

    mesh = make_mesh()  # all GLOBAL devices on the data axis
    sizes = PointCloudSizes(robot=128, obstacle=112, target=16)
    model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16, sa_npoints=(32, 16))
    rng = jax.random.PRNGKey(0)

    # Same global batch on every process; each host materializes ONLY its
    # process_local_slice, the global array is assembled across processes.
    global_batch_size = n_global
    full = training_batch(rng, global_batch_size, sizes=sizes)
    sl = process_local_slice(global_batch_size)
    sharding = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.make_array_from_process_local_data(sharding, v[sl])
        for k, v in {k: jax.device_get(v) for k, v in full.items()}.items()
    }

    state = learner.init_state(model, rng, full)
    step = learner.make_data_parallel_step(model, mesh)
    for _ in range(2):
        state, metrics = step(state, batch)
    val = float(jax.device_get(metrics["val_loss"]))
    # pmean-ed metrics must agree bit-for-bit across processes; print for
    # the parent to cross-check.
    print(json.dumps({"process_id": process_id, "val_loss": val,
                      "global_devices": n_global,
                      "process_count": jax.process_count()}), flush=True)
    jax.distributed.shutdown()


def parent() -> None:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROCESS} "
        + env.get("XLA_FLAGS", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--process-id", str(i)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(N_PROCESSES)
    ]
    reports = []
    ok = True
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            ok = False
            print(f"-- worker {i} rc={p.returncode}\n{err[-3000:]}",
                  file=sys.stderr)
            continue
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        reports.append(json.loads(line))
    agreement = (
        len(reports) == N_PROCESSES
        and len({r["val_loss"] for r in reports}) == 1
        and all(r["process_count"] == N_PROCESSES for r in reports)
    )
    record = {
        "n_processes": N_PROCESSES,
        "devices_per_process": DEVICES_PER_PROCESS,
        "global_devices": reports[0]["global_devices"] if reports else 0,
        "steps": 2,
        "val_loss": reports[0]["val_loss"] if reports else None,
        "cross_process_agreement": agreement,
        "ok": ok and agreement,
    }
    with open(os.path.join(REPO, "MULTIPROC_r04.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    sys.exit(0 if record["ok"] else 1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()
    if args.process_id is None:
        parent()
    else:
        worker(args.process_id)
