import sys
sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from dmvio_tpu.models import full_system, imu_system, window
from dmvio_tpu.io import dataset as ds
from dmvio_tpu.utils import synthetic

H, W = 256, 320
seq = synthetic.generate_vio_sequence(n_frames=80, h=H, w=W,
    accel_scale=0.35, rot_scale=0.25, seed=4)
cfg = window.Config(i_max=1536, p_max=2048, max_frames=7, ba_iters=6)
fs = full_system.FullSystem(seq["calib"], H, W, cfg,
                            imu_calib=imu_system.IMUCalib())
spf = seq["steps_per_frame"]
for i in range(80):
    chunk = None
    if i:
        s0, s1 = (i-1)*spf, i*spf
        chunk = (seq["acc"][s0:s1], seq["gyr"][s0:s1],
                 np.full(s1-s0, seq["imu_dt"], np.float32))
    fs.add_frame(seq["images"][i], float(seq["timestamps"][i]), imu_data=chunk)
    imu = fs.imu
    if i % 10 == 9:
        r = imu.init_result
        print(i, "kf", fs.stats_kf, "phase", imu.phase,
              "n_init_poses", len(imu._init_poses),
              ("s_log %.3f s_var %.3f ok %s mean_e %.2f" % (
                  float(r.s_log), float(r.s_var), bool(r.ok),
                  float(r.energy)/(9.0*max(len(imu._init_poses)-1,1))))
              if r is not None else "no result", flush=True)
