"""Scale observability under excitation + full-sequence hard-fixture gates.

Round 3 established (docs/ACCURACY.md) that the smooth default synthetic
genuinely carries little metric-scale information, and that TUM-VI-style
high-frequency excitation closes the se3/sim3 gap. Round 4 fixed the PGBA
re-adoption chain (honest base-event marginal, unseeded ratchet, anchored
cadence) and diagnosed the remaining chaotic basin to tracking noise in
the wiggle band of this brutally hard operating point (192x256, accel 0.8
+ excite 2.0) — see ACCURACY.md "Round 4".

The XLA:CPU device count changes codegen and thereby the chaotic basin
(CLAUDE.md), so this file gates BOTH environments: the suite's own
8-virtual-device env in-process, and the 1-device env via a subprocess
worker (tools/accuracy_probe.py). Gates are per-env measured values with
margin — locking each basin against regression, not claiming parity.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def _probe_env(devcount: int, seed: int, excite: float, frames: int = 48):
    """Run one pipeline configuration in a subprocess with its own XLA
    device count; returns the worker's JSON record."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["DMVIO_XLA_CACHE"] = "off"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={devcount}"])
    r = subprocess.run(
        [sys.executable, "-m", "dmvio_tpu.tools.accuracy_probe",
         "worker=1", f"seed={seed}", f"excite={excite}",
         f"frames={frames}", f"devcount={devcount}"],
        capture_output=True, text=True, env=env, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_vio_scale_observable_excited_1dev():
    """Excited data makes metric scale observable: se3 ~= sim3 (1-device
    basin; measured se3 2.4-3.1% on seeds 3/5/7, gated ~1.5x)."""
    rec = _probe_env(devcount=1, seed=3, excite=2.0)
    assert rec["phase"] == 2, rec
    assert rec["adopt"] >= 1, rec       # PGBA re-adoption fired
    assert rec["se3_full"] < 4.5, rec
    assert rec["sim3_full"] < 4.0, rec


@pytest.mark.slow
def test_vio_excited_suite_env():
    """The suite env's (8-device) excited basin: the coarse init lands on
    wiggle-band-noise-biased inputs (ACCURACY.md round-4 diagnosis), so
    the gate here locks the measured level (se3 12.1%) against
    regression; sim3 must stay tight and adoption must fire."""
    rec = _probe_env(devcount=8, seed=3, excite=2.0)
    assert rec["phase"] == 2, rec
    assert rec["adopt"] >= 1, rec
    assert rec["sim3_full"] < 5.0, rec
    assert rec["se3_full"] < 15.0, rec


@pytest.mark.slow
@pytest.mark.parametrize("seed", [5, 7])
def test_vio_hard_fixture_full_sequence_se3(seed):
    """FULL-sequence (frame 0 on) se3 gate on the hard batch fixture in
    the suite env — the worst measured operating point of round 3
    (~12.5%) had no direct gate; after the round-4 adoption-chain fixes
    it measures 3.5-3.9% on seeds 3/5/7 (gated ~2x)."""
    rec = _probe_env(devcount=8, seed=seed, excite=0.0)
    assert rec["phase"] == 2, rec
    assert rec["se3_full"] < 8.0, rec
    assert rec["sim3_full"] < 4.0, rec
