"""Device-side victim selection parity with the host heuristic
(flagFramesForMarginalization distance scoring,
FullSystemMarginalize.cpp:61; fused keyframe tail, ba.marg_fused)."""

import jax.numpy as jnp
import numpy as np

from dmvio_tpu.models import ba
from dmvio_tpu.ops.residuals import BAFrames


def _frames(ts, occ):
    F = len(occ)
    R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (F, 1, 1))
    t = jnp.asarray(ts, jnp.float32)
    z = jnp.zeros((F, 2), jnp.float32)
    return BAFrames(R_cw=R, t_cw=t, aff=z, R0_cw=R, t0_cw=t, aff0=z,
                    mask=jnp.asarray(occ))


def _host_victims(ts, slots, newest, n_drop):
    eligible = slots[:-2]
    scores = []
    for s in eligible:
        dists = [np.linalg.norm(ts[s] - ts[j]) for j in slots if j != s]
        d_latest = np.linalg.norm(ts[s] - ts[newest])
        scores.append(-np.sqrt(d_latest) * sum(
            1.0 / (1e-5 + d) for d in dists))
    return sorted(eligible[i] for i in np.argsort(scores)[:n_drop])


def test_select_victims_matches_host():
    rng = np.random.default_rng(7)
    F = 8
    for trial in range(20):
        n_occ = int(rng.integers(4, F + 1))
        slots = list(rng.permutation(F)[:n_occ])
        ts = np.zeros((F, 3), np.float32)
        occ = np.zeros(F, bool)
        for s in slots:
            ts[s] = rng.normal(0, 1.0, 3)
            occ[s] = True
        newest = slots[-1]
        n_drop = int(rng.integers(1, min(3, n_occ - 2)))
        age_rank = np.full(F, -1, np.int32)
        for r, s in enumerate(slots):
            age_rank[s] = r

        vlist = np.asarray(ba.select_victims(
            _frames(ts, occ), jnp.asarray(age_rank),
            jnp.asarray(n_drop, jnp.int32), newest))
        got = sorted(int(s) for s in vlist if s >= 0)
        want = _host_victims(ts, slots, newest, n_drop)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_select_victims_none():
    ts = np.random.default_rng(0).normal(0, 1, (8, 3)).astype(np.float32)
    occ = np.ones(8, bool)
    age = np.arange(8, dtype=np.int32)
    vlist = np.asarray(ba.select_victims(
        _frames(ts, occ), jnp.asarray(age), jnp.asarray(0, jnp.int32), 7))
    assert (vlist == -1).all()
