"""Delayed marginalization: a replayable log of marginalization events.

TPU-native re-design of DelayedMarginalization
(src/GTSAMIntegration/DelayedMarginalization.{h,cpp}): the reference keeps
a SECOND factor graph whose marginalizations run `delay` keyframes behind
the main one, so the recent history stays un-marginalized and can be
re-optimized (PGBA) before being folded into a prior.

Here the same capability is a DATA-STRUCTURE: every keyframe
marginalization appends an event capturing exactly what the main prior
absorbed — the dense visual/prior quadratic (at its FEJ) and the IMU pair
factors (kept SYMBOLIC: preintegrated measurements + frame ids, so PGBA can
relinearize them with poses free, the crucial property the reference gets
from keeping nonlinear factors in the delayed graph). Events older than the
delay are "advanced": their victim's coordinates are Schur-eliminated into
a tail prior (the FIFO replay of readvanceUntilDelay,
DelayedMarginalization.cpp:212-253). All algebra is host float64 (see
vio_ba.schur_out_np rationale).

Per-keyframe coordinate layout used by events, the tail, and PGBA:
    [xi(6), aff(2) -- visual | v(3), bg(3), ba(3) -- inertial]  (17)
plus global [s_log, g2x, g2y] (3).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Deque, Dict, List, Optional, Tuple

import numpy as np

KDIM = 17          # per-keyframe coords
GDIM = 3           # global scale + gravity coords


@dataclasses.dataclass
class KFState:
    """Host snapshot of one keyframe's linearization state."""

    R_cw: np.ndarray
    t_cw: np.ndarray
    aff: np.ndarray
    v: np.ndarray
    bg: np.ndarray
    ba: np.ndarray


@dataclasses.dataclass
class MargEvent:
    victim: int                      # keyframe id being marginalized
    fids: List[int]                  # involved keyframe ids (window at event)
    H: np.ndarray                    # [n*17+3, n*17+3] float64 quadratic
    b0: np.ndarray                   # gradient at `fej`
    fej: Dict[int, KFState]          # linearization states per involved fid
    s_log0: float
    g20: np.ndarray


@dataclasses.dataclass
class SymbolicPair:
    """A relinearizable IMU preintegration factor between two keyframes."""

    fid_i: int
    fid_j: int
    pre: dict                        # host float64 preint (preintegrate_np
                                     # fields or device fetch)


class DelayedLog:
    """Bounded FIFO of marginalization events + symbolic IMU pairs."""

    def __init__(self, delay: int = 48):
        self.delay = delay
        self.events: Deque[MargEvent] = deque()
        self.pairs: List[SymbolicPair] = []
        # Tail prior over retired keyframes' still-referenced coords.
        self.tail_fids: List[int] = []
        self.tail_H: Optional[np.ndarray] = None
        self.tail_b0: Optional[np.ndarray] = None
        self.tail_fej: Dict[int, KFState] = {}
        self.tail_s0: float = 0.0
        self.tail_g20: np.ndarray = np.zeros(2)

    # -- recording ---------------------------------------------------------
    def record_event(self, ev: MargEvent,
                     pairs: List[SymbolicPair]) -> None:
        self.events.append(ev)
        self.pairs.extend(pairs)
        while len(self.events) > self.delay:
            self._advance(self.events.popleft())

    # -- fifo advance ------------------------------------------------------
    def _coords(self, fids: List[int]) -> Dict[int, int]:
        return {f: GDIM + k * KDIM for k, f in enumerate(fids)}

    def _advance(self, ev: MargEvent) -> None:
        """Fold an expired event into the tail and eliminate its victim
        (the FIFO replay step)."""
        # Union coordinate system: tail fids + event fids.
        fids = list(dict.fromkeys(self.tail_fids + ev.fids))
        off = self._coords(fids)
        C = GDIM + len(fids) * KDIM
        H = np.zeros((C, C))
        b = np.zeros(C)
        fej: Dict[int, KFState] = dict(self.tail_fej)
        for f, st in ev.fej.items():
            fej.setdefault(f, st)

        def scatter(Hs, bs, src_fids, src_fej):
            src_off = {f: GDIM + k * KDIM for k, f in enumerate(src_fids)}
            idx = np.concatenate(
                [np.arange(GDIM)] +
                [off[f] + np.arange(KDIM) for f in src_fids])
            sidx = np.concatenate(
                [np.arange(GDIM)] +
                [src_off[f] + np.arange(KDIM) for f in src_fids])
            H[np.ix_(idx, idx)] += Hs[np.ix_(sidx, sidx)]
            # Transport b to the UNION fej: where the union fej differs
            # from the source fej, shift b by H * delta.
            delta = np.zeros(len(sidx))
            for k, f in enumerate(src_fids):
                if f in fej and f in src_fej:
                    d = _state_delta(fej[f], src_fej[f])
                    delta[GDIM + k * KDIM: GDIM + (k + 1) * KDIM] = d
            b[idx] += bs[sidx] + Hs[np.ix_(sidx, sidx)] @ delta

        if self.tail_H is not None:
            scatter(self.tail_H, self.tail_b0, self.tail_fids, self.tail_fej)
        scatter(ev.H, ev.b0, ev.fids, ev.fej)

        # Linearize + fold expired symbolic pairs touching the victim.
        keep_pairs = []
        for p in self.pairs:
            if p.fid_i == ev.victim or p.fid_j == ev.victim:
                if p.fid_i in off and p.fid_j in off:
                    Hp, bp, idx = _linearize_pair(
                        p, fej, off, ev.s_log0, ev.g20)
                    H[np.ix_(idx, idx)] += Hp
                    b[idx] += bp
            else:
                keep_pairs.append(p)
        self.pairs = keep_pairs

        # Schur-eliminate the victim's coords.
        from dmvio_tpu.models.vio_ba import schur_out_np

        if ev.victim in off:
            m = np.zeros(C, bool)
            m[off[ev.victim] + np.arange(KDIM)] = True
            H, b = schur_out_np(H, b, m)
        keep = [f for f in fids if f != ev.victim]
        kidx = np.concatenate(
            [np.arange(GDIM)] + [off[f] + np.arange(KDIM) for f in keep])
        self.tail_H = H[np.ix_(kidx, kidx)]
        self.tail_b0 = b[kidx]
        self.tail_fids = keep
        self.tail_fej = {f: fej[f] for f in keep if f in fej}
        self.tail_s0 = ev.s_log0
        self.tail_g20 = np.asarray(ev.g20)

    # -- marginalization replacement ---------------------------------------
    def rebuild_prior(self, window_fids: List[int],
                      target_fej: Dict[int, "KFState"],
                      relin: Dict[int, "KFState"],
                      s_log: float, g2: np.ndarray):
        """Re-derive the main marginalization prior from the full logged
        history at a better linearization point — the reference's
        marginalization replacement (prepareGraphForMainOptimization
        readvances the delayed graph to delay 0 and swaps it in as the main
        graph, PoseGraphBundleAdjustment.cpp:508;
        DelayedMarginalization.cpp:212-264).

        window_fids: keyframes that stay as free variables (current window).
        target_fej:  their linearization states (the window's FEJ) — the
                     returned prior's gradient is expressed there.
        relin:       refined states (PGBA result) used to (re)linearize the
                     symbolic IMU pairs and as the elimination point for
                     retired keyframes.
        s_log, g2:   adopted global values = the new global FEJ.

        Returns (H, b0) over [s, g2 | window_fids x 17] (float64), or None
        when the log cannot cover the window."""
        fids = list(dict.fromkeys(
            self.tail_fids
            + [f for ev in self.events for f in ev.fids]
            + [f for p in self.pairs for f in (p.fid_i, p.fid_j)]
            + list(window_fids)))
        off = self._coords(fids)
        C = GDIM + len(fids) * KDIM
        H = np.zeros((C, C))
        b = np.zeros(C)

        # Elimination/relinearization point: refined states everywhere we
        # have them; window FEJ for window fids; event fej as fallback.
        point: Dict[int, KFState] = {}
        for ev in self.events:
            for f, st in ev.fej.items():
                point.setdefault(f, st)
        for f, st in self.tail_fej.items():
            point.setdefault(f, st)
        point.update(relin)
        for f in window_fids:
            if f in target_fej:
                point[f] = target_fej[f]
        if any(f not in point for f in fids):
            return None

        def scatter(Hs, bs, src_fids, src_fej, src_s0, src_g20):
            src_off = {f: GDIM + k * KDIM for k, f in enumerate(src_fids)}
            idx = np.concatenate(
                [np.arange(GDIM)] +
                [off[f] + np.arange(KDIM) for f in src_fids])
            sidx = np.concatenate(
                [np.arange(GDIM)] +
                [src_off[f] + np.arange(KDIM) for f in src_fids])
            Hsub = Hs[np.ix_(sidx, sidx)]
            delta = np.zeros(len(sidx))
            delta[0] = s_log - src_s0
            delta[1:3] = np.asarray(g2) - np.asarray(src_g20)
            for k, f in enumerate(src_fids):
                if f in src_fej:
                    delta[GDIM + k * KDIM: GDIM + (k + 1) * KDIM] = \
                        _state_delta(point[f], src_fej[f])
            H[np.ix_(idx, idx)] += Hsub
            b[idx] += bs[sidx] + Hsub @ delta

        if self.tail_H is not None:
            scatter(self.tail_H, self.tail_b0, self.tail_fids,
                    self.tail_fej, self.tail_s0, self.tail_g20)
        for ev in self.events:
            scatter(ev.H, ev.b0, ev.fids, ev.fej, ev.s_log0, ev.g20)
        # Relinearize every logged IMU pair at the refined states — the
        # whole point of the delay: these factors re-enter the prior with
        # Jacobians at the adopted scale/gravity.
        for p in self.pairs:
            Hp, bp, idx = _linearize_pair(p, point, off, s_log,
                                          np.asarray(g2))
            H[np.ix_(idx, idx)] += Hp
            b[idx] += bp

        # Eliminate everything outside the window in one Schur step.
        from dmvio_tpu.models.vio_ba import schur_out_np

        gone = [f for f in fids if f not in window_fids]
        if gone:
            m = np.zeros(C, bool)
            for f in gone:
                m[off[f] + np.arange(KDIM)] = True
            H, b = schur_out_np(H, b, m)
        kidx = np.concatenate(
            [np.arange(GDIM)] +
            [off[f] + np.arange(KDIM) for f in window_fids])
        return H[np.ix_(kidx, kidx)], b[kidx]

    # -- queries -----------------------------------------------------------
    def delayed_fids(self) -> List[int]:
        """All keyframe ids with un-marginalized (replayable) state,
        including tail-prior variables (they still carry information)."""
        out: List[int] = list(self.tail_fids)
        for ev in self.events:
            for f in ev.fids:
                if f not in out:
                    out.append(f)
        for p in self.pairs:
            for f in (p.fid_i, p.fid_j):
                if f not in out:
                    out.append(f)
        return sorted(out)


def _state_delta(cur: KFState, ref: KFState) -> np.ndarray:
    """[17] delta = cur (-) ref in the event coordinate convention."""
    from dmvio_tpu.models.vio_coarse import _log_so3

    dR = cur.R_cw @ ref.R_cw.T
    w = _log_so3(dR)
    # left-increment translation component: t_cur - dR t_ref has rotation
    # part folded; use exact se3 log via small-angle (host, float64).
    V = _left_jac_np(w)
    dt = cur.t_cw - dR @ ref.t_cw
    vpart = np.linalg.solve(V, dt)
    return np.concatenate([
        vpart, w, cur.aff - ref.aff, cur.v - ref.v,
        cur.bg - ref.bg, cur.ba - ref.ba])


def _left_jac_np(w):
    t = np.linalg.norm(w)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if t < 1e-8:
        return np.eye(3) + 0.5 * W + W @ W / 6.0
    return (np.eye(3) + (1 - np.cos(t)) / (t * t) * W
            + (t - np.sin(t)) / (t ** 3) * W @ W)


def _linearize_pair(p: SymbolicPair, fej: Dict[int, KFState],
                    off: Dict[int, int], s_log: float, g2: np.ndarray):
    """Host float64 linearization of one IMU pair at the given states.

    Returns (H [30+3 x ...], b, global index array) over
    [s,g2 | i-block 17 | j-block 17] mapped through `off` (aff columns are
    zero — IMU factors do not touch brightness)."""
    from dmvio_tpu.models import vio_coarse as vc
    from dmvio_tpu.ops import preint as P

    sti = fej[p.fid_i]
    stj = fej[p.fid_j]
    pre = p.pre
    g_vec = np.array([0.0, 0.0, -P.GRAVITY])
    infl = np.diag(np.concatenate([
        np.full(3, 1e-3 ** 2), np.full(3, 0.01 ** 2),
        np.full(3, 0.003 ** 2)]))
    W9 = np.linalg.inv(np.linalg.cholesky(
        np.asarray(pre["cov"]) + infl + 1e-14 * np.eye(9)))
    dt = float(pre["dt"])
    Wb = np.diag(np.concatenate([
        np.full(3, 1.0 / (P.NOISE.sigma_gyro_walk * np.sqrt(max(dt, 1e-6)))),
        np.full(3, 1.0 / (P.NOISE.sigma_acc_walk * np.sqrt(max(dt, 1e-6))))]))

    def resid(z):
        # z = [ds, dg2(2), xi_i(6), dv_i, dbg_i, dba_i, xi_j(6), dv_j,...]
        s = s_log + z[0]
        g2z = np.asarray(g2, np.float64) + z[1:3]
        R_g = vc._exp_so3(np.array([g2z[0], g2z[1], 0.0]))

        def apply(st: KFState, o):
            xi = z[o:o + 6]
            dR = vc._exp_so3(xi[3:6])
            V = _left_jac_np(xi[3:6])
            R = dR @ st.R_cw
            t = dR @ st.t_cw + V @ xi[0:3]
            return R, t

        R_i, t_i = apply(sti, 3)
        R_j, t_j = apply(stj, 18)
        v_i = sti.v + z[9:12]
        v_j = stj.v + z[24:27]
        bg_i = sti.bg + z[12:15]
        ba_i = sti.ba + z[15:18]
        bg_j = stj.bg + z[27:30]
        ba_j = stj.ba + z[30:33]
        Rb_i, pb_i = vc.dso_to_body_np(R_i, t_i, np.exp(s), R_g,
                                       np.eye(3), np.zeros(3))
        Rb_j, pb_j = vc.dso_to_body_np(R_j, t_j, np.exp(s), R_g,
                                       np.eye(3), np.zeros(3))
        dbg = bg_i - pre["bias_lin"][:3]
        dba = ba_i - pre["bias_lin"][3:6]
        dR = np.asarray(pre["dR"]) @ vc._exp_so3(
            np.asarray(pre["dR_dbg"]) @ dbg)
        dv = np.asarray(pre["dv"]) + pre["dv_dbg"] @ dbg + \
            pre["dv_dba"] @ dba
        dp = np.asarray(pre["dp"]) + pre["dp_dbg"] @ dbg + \
            pre["dp_dba"] @ dba
        r_R = vc._log_so3(dR.T @ Rb_i.T @ Rb_j)
        r_v = Rb_i.T @ (v_j - v_i - g_vec * dt) - dv
        r_p = Rb_i.T @ (pb_j - pb_i - v_i * dt
                        - 0.5 * g_vec * dt ** 2) - dp
        rb = np.concatenate([bg_j - bg_i, ba_j - ba_i])
        return np.concatenate([W9 @ np.concatenate([r_R, r_v, r_p]),
                               Wb @ rb])

    dim = 33
    r0 = resid(np.zeros(dim))
    J = np.zeros((15, dim))
    eps = 1e-6
    for k in range(dim):
        z = np.zeros(dim)
        z[k] = eps
        J[:, k] = (resid(z) - r0) / eps

    H = J.T @ J
    b = J.T @ r0
    # Map local [s,g2, i(15: xi6+v3+b6), j(15)] to the 17-dim blocks
    # (skip aff columns).
    idx = np.concatenate([
        np.arange(GDIM),
        off[p.fid_i] + np.concatenate([np.arange(6), 8 + np.arange(9)]),
        off[p.fid_j] + np.concatenate([np.arange(6), 8 + np.arange(9)]),
    ])
    return H, b, idx
