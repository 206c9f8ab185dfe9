"""Pose Graph Bundle Adjustment over the delayed window.

TPU-native re-design of PoseGraphBundleAdjustment
(src/IMUInitialization/PoseGraphBundleAdjustment.{h,cpp}): clone the
delayed log, inject relinearizable IMU factors + the active visual Hessian
factor, and LM-optimize scale, gravity, velocities, biases AND POSES
jointly over the whole delayed history (optimize :59-100, buildGraph
:210-283, insertIMUFactorsAndValues :284). Freeing the poses is what makes
scale strongly observable — the coarse init and the sliding window both
treat poses as (noisy) constants and inherit their gauge drift.

Implementation: host float64 LM. The problem is small (tens of keyframes,
C = 3 + 17K <= ~800) and runs once every several keyframes; numeric-exact
float64 beats another f32-conditioning fight (the same trade as the coarse
filter and the prior algebra).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from dmvio_tpu.models import vio_coarse as vc
from dmvio_tpu.models.delayed import (DelayedLog, GDIM, KDIM, KFState,
                                      MargEvent, SymbolicPair,
                                      _left_jac_np, _linearize_pair,
                                      _state_delta)


@dataclasses.dataclass
class PGBAResult:
    ok: bool
    s_log: float
    g2: np.ndarray
    states: Dict[int, KFState]
    s_var: float
    energy: float
    n_kfs: int


def _assemble_quadratics(log: DelayedLog, extra_events: List[MargEvent],
                         fids: List[int], fej: Dict[int, KFState],
                         s_log0: float, g20: np.ndarray):
    """Scatter tail + events into one (H, b0) over the PGBA layout, with b
    transported to the common `fej`."""
    off = {f: GDIM + k * KDIM for k, f in enumerate(fids)}
    C = GDIM + len(fids) * KDIM
    H = np.zeros((C, C))
    b = np.zeros(C)

    def scatter(Hs, bs, src_fids, src_fej, src_s0, src_g20):
        keep = [f for f in src_fids if f in off]
        if len(keep) != len(src_fids):
            return  # references a fid outside the PGBA window; skip
        src_off = {f: GDIM + k * KDIM for k, f in enumerate(src_fids)}
        idx = np.concatenate(
            [np.arange(GDIM)] + [off[f] + np.arange(KDIM) for f in src_fids])
        sidx = np.concatenate(
            [np.arange(GDIM)] +
            [src_off[f] + np.arange(KDIM) for f in src_fids])
        Hsub = Hs[np.ix_(sidx, sidx)]
        delta = np.zeros(len(sidx))
        delta[0] = s_log0 - src_s0
        delta[1:3] = np.asarray(g20) - np.asarray(src_g20)
        for k, f in enumerate(src_fids):
            if f in fej and f in src_fej:
                delta[GDIM + k * KDIM: GDIM + (k + 1) * KDIM] = \
                    _state_delta(fej[f], src_fej[f])
        H[np.ix_(idx, idx)] += Hsub
        b[idx] += bs[sidx] + Hsub @ delta

    if log.tail_H is not None:
        scatter(log.tail_H, log.tail_b0, log.tail_fids, log.tail_fej,
                log.tail_s0, log.tail_g20)
    for ev in list(log.events) + extra_events:
        scatter(ev.H, ev.b0, ev.fids, ev.fej, ev.s_log0, ev.g20)
    return H, b, off


def run(log: DelayedLog,
        window_states: Dict[int, KFState],
        active_event: Optional[MargEvent],
        s_log0: float, g20: np.ndarray,
        iters: int = 12,
        max_kfs: int = 100) -> Optional[PGBAResult]:
    """LM over [s, g2, per-KF (xi, aff, v, bg, ba)].

    window_states: current-window keyframe states (their visual info enters
    via `active_event`, the active DSO Hessian factor — getActiveDSOFactor
    parity, BAGTSAMIntegration.cpp:473-481).
    """
    fids = log.delayed_fids()
    for f in window_states:
        if f not in fids:
            fids.append(f)
    fids = sorted(fids)[-max_kfs:]
    if len(fids) < 6:
        return None

    # Initial states: window (current) where available, else event FEJ.
    fej: Dict[int, KFState] = {}
    for ev in list(log.events):
        for f, st in ev.fej.items():
            if f in fids:
                fej.setdefault(f, st)
    for f, st in log.tail_fej.items():
        if f in fids:
            fej.setdefault(f, st)
    for f, st in window_states.items():
        if f in fids:
            fej[f] = st
    if any(f not in fej for f in fids):
        return None

    H_quad, b_quad0, off = _assemble_quadratics(
        log, [active_event] if active_event is not None else [],
        fids, fej, s_log0, g20)
    C = GDIM + len(fids) * KDIM
    # Gauge anchor: pin the oldest keyframe's pose + affine.
    o0 = off[fids[0]]
    anchor = np.zeros(C)
    anchor[o0:o0 + 8] = 1e8
    H_quad[np.arange(C), np.arange(C)] += anchor

    pairs = [p for p in log.pairs
             if p.fid_i in off and p.fid_j in off]
    if len(pairs) < 4:
        return None

    # LM state: deltas relative to `fej` (poses retracted on accept).
    cur: Dict[int, KFState] = {f: dataclasses.replace(st)
                               for f, st in fej.items()}
    s_log = float(s_log0)
    g2 = np.asarray(g20, np.float64).copy()
    lam = 1e-4

    def delta_vec():
        d = np.zeros(C)
        d[0] = s_log - s_log0
        d[1:3] = g2 - g20
        for f in fids:
            d[off[f]:off[f] + KDIM] = _state_delta(cur[f], fej[f])
        return d

    R_cb, t_cb = log.R_cb, log.t_cb

    def pair_system():
        H = np.zeros((C, C))
        b = np.zeros(C)
        for p in pairs:
            Hp, bp, idx = _linearize_pair(p, cur, off, s_log, g2,
                                          R_cb, t_cb)
            H[np.ix_(idx, idx)] += Hp
            b[idx] += bp
        return H, b

    def pair_energy(sl, gg, states):
        e = 0.0
        for p in pairs:
            r = _pair_residual_np(p, states, sl, gg, R_cb, t_cb)
            e += float(r @ r)
        return e

    def quad_energy(d):
        return float(d @ (H_quad @ d) + 2.0 * b_quad0 @ d)

    d0 = delta_vec()
    e_cur = pair_energy(s_log, g2, cur) + quad_energy(d0)

    for it in range(iters):
        Hp, bp = pair_system()
        d = delta_vec()
        H = Hp + H_quad
        b = bp + b_quad0 + H_quad @ d
        Hl = H + lam * np.diag(np.diag(H)) + 1e-9 * np.eye(C)
        try:
            dx = np.linalg.solve(Hl, -b)
        except np.linalg.LinAlgError:
            return None
        # Propose.
        s_n = float(np.clip(s_log + dx[0], s_log0 - 3, s_log0 + 3))
        g_n = g2 + dx[1:3]
        nxt: Dict[int, KFState] = {}
        for f in fids:
            o = off[f]
            st = cur[f]
            xi = dx[o:o + 6]
            dR = vc._exp_so3(xi[3:6])
            V = _left_jac_np(xi[3:6])
            nxt[f] = KFState(
                R_cw=dR @ st.R_cw, t_cw=dR @ st.t_cw + V @ xi[0:3],
                aff=st.aff + dx[o + 6:o + 8], v=st.v + dx[o + 8:o + 11],
                bg=st.bg + dx[o + 11:o + 14], ba=st.ba + dx[o + 14:o + 17])
        d_n = np.zeros(C)
        d_n[0] = s_n - s_log0
        d_n[1:3] = g_n - g20
        for f in fids:
            d_n[off[f]:off[f] + KDIM] = _state_delta(nxt[f], fej[f])
        e_n = pair_energy(s_n, g_n, nxt) + quad_energy(d_n)
        if np.isfinite(e_n) and e_n < e_cur:
            cur, s_log, g2, e_cur = nxt, s_n, g_n, e_n
            lam = max(lam * 0.25, 1e-8)
        else:
            lam *= 4.0
            if lam > 1e6:
                break

    # Scale marginal variance.
    Hp, _ = pair_system()
    H = Hp + H_quad
    try:
        s_var = float(np.linalg.inv(
            H + 1e-9 * np.eye(C))[0, 0])
    except np.linalg.LinAlgError:
        s_var = float("inf")

    ok = np.isfinite(e_cur) and np.isfinite(s_var)
    return PGBAResult(ok=ok, s_log=s_log, g2=g2, states=cur,
                      s_var=s_var, energy=e_cur, n_kfs=len(fids))


def _pair_residual_np(p: SymbolicPair, states: Dict[int, KFState],
                      s_log: float, g2: np.ndarray,
                      R_cb: np.ndarray, t_cb: np.ndarray) -> np.ndarray:
    """Weighted 15-dim residual of one pair at given states (host f64),
    through the camera-IMU extrinsic chain (imu_factors residual)."""
    from dmvio_tpu.models import imu_factors
    from dmvio_tpu.models.delayed import pair_weights

    r, _J = imu_factors.linearize_pair(
        states[p.fid_i], states[p.fid_j], p.pre, s_log, np.asarray(g2),
        R_cb, t_cb)
    W9, Wb = pair_weights(p.pre)
    return np.concatenate([W9 @ r[:9], Wb @ r[9:]])
