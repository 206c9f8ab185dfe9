"""Checkpoint / resume of the full odometry state.

The reference has NO checkpointing (SURVEY.md §5.4 — runs restart from
scratch); this is a deliberate capability addition: the sliding window,
marginalization priors, immature pool, IMU side-state and host metadata are
O(MB) and serialize to a single .npz + pickle blob. A resumed system
continues processing frames as if never stopped (modulo the tracker
reference pyramid, which is rebuilt from the stored keyframe pyramids).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save(fs, path: str) -> None:
    """Serialize a FullSystem to `path` (pickle)."""
    state: Dict[str, Any] = {
        "cfg": fs.cfg,
        "calib_vec": np.asarray(fs.calib.as_vec()),
        "h": fs.h, "w": fs.w,
        "frames": _to_host(fs.win.frames),
        "points": _to_host(fs.win.points),
        "pair_mask": np.asarray(fs.win.pair_mask),
        "images": np.asarray(fs.win.images),
        "pyramids": [None if p is None else [np.asarray(l) for l in p]
                     for p in fs.win.pyramids],
        "HM": np.asarray(fs.win.HM), "bM0": np.asarray(fs.win.bM0),
        "prior_diag": np.asarray(fs.win.prior_diag),
        "calib0": np.asarray(fs.win.calib0),
        "slot_frame_id": list(fs.win.slot_frame_id),
        "kf_count": fs.win.kf_count,
        "imm": _to_host(fs.imm),
        "initialized": fs.initialized,
        "frame_id": fs.frame_id, "first_id": fs.first_id,
        "shells": fs.shells, "kf_poses": fs.kf_poses,
        "ref_kf_slot": fs.ref_kf_slot, "ref_kf_id": fs.ref_kf_id,
        "ref_pose_np": fs.ref_pose_np, "ref_aff_np": fs.ref_aff_np,
        "T_last_ref": fs.T_last_ref, "motion": fs.motion,
        "last_rho": fs.last_rho, "last_b": fs.last_b,
        "track_energy_ref": fs.track_energy_ref,
        "_n_active": fs._n_active,
        "stats_kf": fs.stats_kf,
        "stats_lost_frames": fs.stats_lost_frames,
    }
    if fs.imu is not None:
        imu = fs.imu
        state["imu"] = {
            "calib": imu.calib, "phase": imu.phase,
            "states": None if imu.states is None else _to_host(imu.states),
            "pairs": [tuple(_to_host(x) for x in tup) for tup in imu.pairs],
            "HM": imu.HM, "bM0": imu.bM0,
            "prior_diag": None if imu.prior_diag is None
            else np.asarray(imu.prior_diag),
            "coarse": imu.coarse,
            "s_log": imu.s_log, "g2": imu.g2,
            "init_result": None if imu.init_result is None
            else _to_host(imu.init_result),
            # In-flight measurement buffers: without these a resumed run
            # silently drops every sample since the last keyframe,
            # corrupting the next KF-to-KF preintegration pair.
            "kf_acc": [np.asarray(a) for a in imu._kf_acc],
            "kf_gyr": [np.asarray(g) for g in imu._kf_gyr],
            "kf_dts": [np.asarray(d) for d in imu._kf_dts],
            "kf_fids": list(imu._kf_fids),
            # Coarse-init rolling window.
            "init_poses": imu._init_poses,
            "init_pres": [_to_host(p) for p in imu._init_pres],
            "init_fids": list(imu._init_fids),
            "init_dts": list(imu._init_dts),
            "init_sigs": list(imu._init_sigs),
            "acc_sum": imu._acc_sum, "acc_n": imu._acc_n,
            "last_frame_pre": None if imu.last_frame_pre is None
            else _to_host(imu.last_frame_pre),
            "last_frame_pre_np": imu.last_frame_pre_np,
            # Delayed-marginalization log + PGBA bookkeeping (host numpy;
            # pickles directly).
            "delayed_log": imu.delayed_log,
            "kf_since_pgba": imu.kf_since_pgba,
            "best_pgba_var": imu.best_pgba_var,
            "pgba_adopted_once": getattr(imu, "_pgba_adopted_once", False),
            "scale_fixed": getattr(imu, "scale_fixed", False),
            "s_hist": getattr(imu, "_s_hist", []),
            "last_init_decent": getattr(imu, "_last_init_decent", False),
        }
    with open(path, "wb") as f:
        pickle.dump(state, f)


def load(path: str):
    """Restore a FullSystem from `path`."""
    from dmvio_tpu.models import full_system
    from dmvio_tpu.models.imu_system import IMUSystem
    from dmvio_tpu.utils.camera import Calib

    with open(path, "rb") as f:
        st = pickle.load(f)

    calib = Calib.from_vec(jnp.asarray(st["calib_vec"]))
    imu_state = st.get("imu")
    fs = full_system.FullSystem(
        calib, st["h"], st["w"], st["cfg"],
        imu_calib=imu_state["calib"] if imu_state else None)

    dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    w = fs.win
    w.frames = dev(st["frames"])
    w.points = dev(st["points"])
    w.pair_mask = jnp.asarray(st["pair_mask"])
    w.images = jnp.asarray(st["images"])
    w.pyramids = [None if p is None else tuple(jnp.asarray(l) for l in p)
                  for p in st["pyramids"]]
    w.HM = np.asarray(st["HM"], np.float64)
    w.bM0 = np.asarray(st["bM0"], np.float64)
    w.prior_diag = jnp.asarray(st["prior_diag"])
    w.calib0 = jnp.asarray(st["calib0"])
    w.slot_frame_id = list(st["slot_frame_id"])
    w.kf_count = st["kf_count"]
    fs.imm = dev(st["imm"])
    for k in ("initialized", "frame_id", "first_id", "shells", "kf_poses",
              "ref_kf_slot", "ref_kf_id", "ref_pose_np", "ref_aff_np",
              "T_last_ref", "motion", "last_rho", "last_b",
              "track_energy_ref", "_n_active", "stats_kf",
              "stats_lost_frames"):
        setattr(fs, k, st[k])
    fs.calib = calib

    if imu_state is not None:
        imu = fs.imu
        imu.phase = imu_state["phase"]
        imu.states = None if imu_state["states"] is None \
            else dev(imu_state["states"])
        imu.pairs = [
            (tup[0], tup[1], dev(tup[2])) + tuple(tup[3:])
            for tup in imu_state["pairs"]]
        imu.HM = imu_state["HM"]
        imu.bM0 = imu_state["bM0"]
        imu.prior_diag = None if imu_state["prior_diag"] is None \
            else jnp.asarray(imu_state["prior_diag"])
        imu.coarse = imu_state["coarse"]
        imu.s_log = imu_state["s_log"]
        imu.g2 = imu_state["g2"]
        imu._kf_acc = [np.asarray(a, np.float32)
                       for a in imu_state.get("kf_acc", [])]
        imu._kf_gyr = [np.asarray(g, np.float32)
                       for g in imu_state.get("kf_gyr", [])]
        imu._kf_dts = [np.asarray(d, np.float32)
                       for d in imu_state.get("kf_dts", [])]
        imu._kf_fids = list(imu_state.get(
            "kf_fids", [-1] * len(imu._kf_dts)))
        imu._init_poses = list(imu_state.get("init_poses", []))
        imu._init_pres = [dev(p) for p in imu_state.get("init_pres", [])]
        imu._init_fids = list(imu_state.get("init_fids", []))
        imu._init_dts = list(imu_state.get("init_dts", []))
        imu._init_sigs = list(imu_state.get(
            "init_sigs", [(0.0, 0.0)] * len(imu._init_fids)))
        imu._acc_sum = imu_state.get("acc_sum", np.zeros(3))
        imu._acc_n = imu_state.get("acc_n", 0)
        lfp = imu_state.get("last_frame_pre")
        imu.last_frame_pre = None if lfp is None else dev(lfp)
        imu.last_frame_pre_np = imu_state.get("last_frame_pre_np")
        if imu_state.get("delayed_log") is not None:
            imu.delayed_log = imu_state["delayed_log"]
        imu.kf_since_pgba = imu_state.get("kf_since_pgba", 0)
        imu.best_pgba_var = imu_state.get("best_pgba_var", float("inf"))
        imu._pgba_adopted_once = imu_state.get("pgba_adopted_once", False)
        imu.scale_fixed = imu_state.get("scale_fixed", False)
        imu._s_hist = list(imu_state.get("s_hist", []))
        imu._last_init_decent = imu_state.get("last_init_decent", False)

    # Rebuild the tracker reference from the stored window.
    if fs.initialized and fs.ref_kf_slot >= 0 \
            and w.pyramids[fs.ref_kf_slot] is not None:
        fs._set_tracker_ref(fs.ref_kf_slot, fs.ref_kf_id)
        # _set_tracker_ref resets the motion model; restore it.
        fs.T_last_ref = st["T_last_ref"]
        fs.motion = st["motion"]
        fs.last_rho = st["last_rho"]
        fs.last_b = st["last_b"]
        fs.ref_kf_id = st["ref_kf_id"]
    return fs
