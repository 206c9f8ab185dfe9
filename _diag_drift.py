import sys
sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
from dmvio_tpu.models import full_system, window
from dmvio_tpu.utils import synthetic
H, W = 256, 320
seq = synthetic.generate_vio_sequence(
    n_frames=120, h=H, w=W, accel_scale=0.35, rot_scale=0.25, seed=4,
    imu_noise=False)
calib = seq["calib"]
scene = synthetic.room_scene(depth=2.0)
cfg = window.Config()   # defaults like the CLI preset 0 w/o overrides
cfg.i_max = 1536; cfg.p_max = 2048; cfg.max_frames = 7; cfg.ba_iters = 6
fs = full_system.FullSystem(calib, H, W, cfg)
Rcw = [np.asarray(r) for r in seq["R_dso"]]; tcw = [np.asarray(t) for t in seq["t_dso"]]
last_kf = 0
prev_ids = set()
for i in range(120):
    fs.add_frame(seq["images"][i], float(seq["timestamps"][i]))
    if not fs.initialized or fs.stats_kf == last_kf:
        continue
    last_kf = fs.stats_kf
    w = fs.win
    pts = jax.device_get(w.points)
    m = np.asarray(pts.mask)
    if m.sum() < 30: continue
    host = np.asarray(pts.host)
    u = np.asarray(pts.u); v = np.asarray(pts.v); d_est = np.asarray(pts.idepth)
    ratios = np.full(len(u), np.nan)
    for s_ in range(len(w.slot_frame_id)):
        fid = w.slot_frame_id[s_]
        if fid is None: continue
        sel = m & (host == s_)
        if not sel.any(): continue
        lam = np.asarray(synthetic.ray_depth(scene, jnp.asarray(Rcw[fid]),
              jnp.asarray(tcw[fid]), calib, jnp.asarray(u[sel]), jnp.asarray(v[sel])))
        ratios[sel] = d_est[sel] * lam
    ids = set(np.nonzero(m)[0].tolist())
    # "new" = indices active now but not at the previous KF
    new = np.array(sorted(ids - prev_ids), int)
    old = np.array(sorted(ids & prev_ids), int)
    prev_ids = ids
    rn = np.nanmedian(ratios[new]) if len(new) else float('nan')
    ro = np.nanmedian(ratios[old]) if len(old) else float('nan')
    print(f"f{i} kf={fs.stats_kf} all={np.nanmedian(ratios[m]):.4f} "
          f"old={ro:.4f} new={rn:.4f} n_new={len(new)}", flush=True)
