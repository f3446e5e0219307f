"""On-chip session r4f: bf16-intermediate backward timing + final bench.

1. Train-step timing with the bf16-intermediate raw-block backward.
2. The actual `bench.py` default config (fast8) end-to-end, recording the
   JSON line it prints (the number the driver will reproduce).
Self-bounding; updates ONCHIP_EVIDENCE.json.
"""
import json
import subprocess
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

LOG = open("/root/repo/.onchip_r4f.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:250], file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"))

from mpinets_tpu.data.synthetic import training_batch
from mpinets_tpu.model.fused_train import make_fused_train_apply
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.train import learner

model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)

results = {}
for bt in (64, 256):
    try:
        batch = training_batch(jax.random.fold_in(rng, 21), bt)
        state = learner.init_state(model, rng, batch)
        step = learner.make_train_step(
            model, apply_fn=make_fused_train_apply(jnp.bfloat16)
        )

        def mk(k):
            def run():
                s = state
                t0 = time.perf_counter()
                for _ in range(k):
                    s, m = step(s, batch)
                np.asarray(m["val_loss"])
                return time.perf_counter() - t0
            return run

        mk(1)()
        t2, t8 = mk(2)(), mk(8)()
        per = (t8 - t2) / 6
        results[f"fused_rawbwd_bf16act_b{bt}"] = {
            "ms_per_step": round(per * 1e3, 1),
            "env_samples_per_s": round(bt / per, 1),
        }
        emit(kind="train_step", path="fused_rawbwd_bf16act", batch=bt,
             **results[f"fused_rawbwd_bf16act_b{bt}"])
    except Exception:
        emit(kind="train_step", batch=bt, err=traceback.format_exc()[-500:])

try:
    ev = json.load(open("/root/repo/ONCHIP_EVIDENCE.json"))
    ev["train_step"].update(results)
    json.dump(ev, open("/root/repo/ONCHIP_EVIDENCE.json", "w"), indent=1)
except Exception:
    emit(kind="evidence", err=traceback.format_exc()[-300:])

# 2. the real bench, default config (run in-process to reuse the tunnel)
try:
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"], capture_output=True,
        text=True, cwd="/root/repo",
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    emit(kind="bench", rc=out.returncode,
         result=json.loads(line[-1]) if line else None,
         stderr_tail=out.stderr[-300:])
except Exception:
    emit(kind="bench", err=traceback.format_exc()[-400:])
emit(kind="done", t=time.strftime("%H:%M:%S"))
