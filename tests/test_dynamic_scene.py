"""Dynamic-object rejection on rendered scenes: a large moving sphere in
the room must get its features flagged by movingConsistencyCheck
(estimator.cpp:1965-2008 — the reference added the check exactly for
this) while the static-scene trajectory stays accurate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.config import VinsConfig
from vins_rgbd_fast_tpu.io import stream as io_stream
from vins_rgbd_fast_tpu.io import synthetic as syn
from vins_rgbd_fast_tpu.pipeline import VinsPipeline

W, H = 320, 240
RIG = syn.SyntheticRig(width=W, height=H, fx=230.0, fy=230.0, cx=160.0,
                       cy=120.0, imu_rate=200.0, frame_rate=20.0)


@pytest.mark.slow
def test_moving_object_features_flagged_and_ate_bounded():
    n = 26
    seq = syn.make_trajectory(n, RIG, seed=3, omega_scale=0.12,
                              acc_scale=0.25)
    cfg = VinsConfig(
        imu=True, static_init=True, image_width=W, image_height=H,
        intrinsics=(RIG.fx, RIG.fy, RIG.cx, RIG.cy),
        ric=tuple(seq.ric.ravel().tolist()), tic=tuple(seq.tic.tolist()),
        max_cnt=60, max_features=96, min_dist=16,
        num_grid_rows=4, num_grid_cols=5,
        frontend_freq=0.0, freq=0.0, depth_max_dist=12.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5, max_imu_per_frame=16,
    )
    # big, fast, close sphere crossing the field of view
    deg = syn.SensorDegradation(dyn_radius=0.8, dyn_orbit=2.2, dyn_omega=1.2)

    pipe = VinsPipeline(cfg, dtype=jnp.float32, eager_outputs=False,
                        failure_check_interval=10 ** 9)
    for (t, a, w) in seq.imu:
        pipe.push_imu(t, a, w)
    est = pipe.estimator
    max_dyn = 0
    for (t, img, depth) in syn.frames_degraded(seq, RIG, deg, seed=1):
        pipe.push_image(t, np.asarray(img))
        pipe.push_depth(t, np.asarray(depth))
        pipe.spin_once()
        if est.solver_flag == est.NON_LINEAR:
            max_dyn = max(max_dyn, int(np.asarray(
                jnp.sum(est.state.table.is_dynamic))))
    assert est.solver_flag == est.NON_LINEAR

    # trajectory must stay bounded despite the dynamic object
    traj = est.trajectory
    ate = io_stream.ate_rmse([r["t"] for r in traj], [r["P"] for r in traj],
                             seq.times, seq.P, align=False)
    travelled = np.sum(np.linalg.norm(np.diff(seq.P, axis=0), axis=1))
    assert np.isfinite(ate)
    assert ate < max(0.08 * travelled, 0.12), (ate, travelled)

    # the consistency check must have flagged at least one dynamic feature
    # at some point of the run (sphere features violate static epipolar
    # geometry once the window has parallax on them)
    assert max_dyn > 0, \
        "no feature ever flagged dynamic with a large moving object in view"
