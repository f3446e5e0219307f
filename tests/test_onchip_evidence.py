"""Committed on-chip evidence (VERDICT r3 #6): ONCHIP_EVIDENCE.json is the
in-tree record of what was measured on real TPU hardware — compile gate,
full-shape fused-vs-flax parity, the 150-step rollout drift curve, and the
exact-vs-fast metric table. This test pins its invariants so a regression
in any future chip session (or a stale artifact) fails CI visibly.

Skips when the artifact is absent (fresh clones before any chip session).
Produced by scripts/onchip_r4c.py.
"""

import json
from pathlib import Path

import pytest

ARTIFACT = Path(__file__).resolve().parent.parent / "ONCHIP_EVIDENCE.json"


@pytest.fixture(scope="module")
def evidence():
    if not ARTIFACT.exists():
        pytest.skip("no on-chip evidence artifact committed yet")
    return json.loads(ARTIFACT.read_text())


def test_compile_gate_passed(evidence):
    assert evidence["compile_gate"]["ok"] is True


def test_full_shape_parity_vs_flax(evidence):
    parity = evidence["parity_f32_vs_flax_B8"]
    # exact paths: f32 fused forward within float-accumulation noise of
    # model.apply at full reference shapes (SURVEY §7 tolerance ladder)
    for cfg in ("v5", "v8"):
        assert parity[cfg]["max_abs_vs_flax"] < 1e-4, (cfg, parity[cfg])
    # relaxed paths may differ, but must stay in a sane range (same policy,
    # different neighbor truncation)
    for cfg in ("fast16", "fast12", "fast8"):
        if cfg in parity:
            assert parity[cfg]["max_abs_vs_flax"] < 0.5, (cfg, parity[cfg])


def test_deep_rollout_drift_bounded(evidence):
    curve = evidence["drift_fused_bf16_vs_flax_bf16_150step_max_absq"]
    # bf16 fused vs bf16 flax over 150 compounding closed-loop steps:
    # normalized-config drift stays bounded (no divergence blow-up)
    assert float(curve["150"]) < 0.5, curve


def test_exact_vs_fast_table_present(evidence):
    table = evidence["exact_vs_fast_metrics_ckpt13650_B128"]
    assert "exact_v8" in table
    assert any(k.startswith("fast") for k in table)
    for cfg, row in table.items():
        assert 0.0 <= row["collision_rate"] <= 1.0, (cfg, row)
