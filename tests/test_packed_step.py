"""The packed host→device entry (`lio_step_packed`) must be numerically
identical to the plain `lio_step` — it only changes the transfer layout
(one H2D buffer + one D2H telemetry vector, vs ~15 RPCs on a tunneled TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from limovelo_tpu import Config
from limovelo_tpu.filter.process import ImuWindow, process_noise_Q
from limovelo_tpu.config import DynParams
from limovelo_tpu.geometry import state as st
from limovelo_tpu.mapping import GridParams, insert, make_map
from limovelo_tpu.step import StepInputs, lio_step, lio_step_packed, pack_host_inputs


def _inputs(n_pts=256, n_imu=8, seed=0):
    cfg = Config(real_time=False, min_dist=0.1, downsample_prec=0.2,
                 map_table_size=1 << 10)
    grid = GridParams.from_config(cfg)
    rng = np.random.default_rng(seed)
    x = st.make_initial(cfg)
    P = st.initial_covariance()

    ts = ((np.arange(n_imu) + 1) * (0.1 / n_imu)).astype(np.float32)
    a = (rng.normal(size=(n_imu, 3)) * 0.1 - np.array(cfg.gravity_vec)).astype(np.float32)
    w = (rng.normal(size=(n_imu, 3)) * 0.05).astype(np.float32)
    imu_mask = np.ones(n_imu, bool)

    pts = rng.uniform(-8, 8, size=(n_pts, 3)).astype(np.float32)
    pts_t = rng.uniform(0, 0.1, n_pts).astype(np.float32)
    pts_mask = np.ones(n_pts, bool)
    pts_mask[-7:] = False

    m = make_map(grid)
    mp = rng.uniform(-10, 10, size=(512, 3)).astype(np.float32)
    m = insert(m, jnp.asarray(mp), jnp.ones(512, bool), grid)

    anchor_a = (-np.array(cfg.gravity_vec)).astype(np.float32)
    anchor_w = np.zeros(3, np.float32)
    host = dict(
        anchor_t=0.0, t_integrated=0.0, t2=0.1,
        anchor_a=anchor_a, anchor_w=anchor_w,
        imu=(ts, a, w, imu_mask),
        pts=pts, pts_t=pts_t, pts_mask=pts_mask,
    )
    return cfg, grid, x, P, m, host


def test_packed_equals_unpacked():
    cfg, grid, x, P, m, h = _inputs()
    Q = process_noise_Q(cfg)
    dyn = DynParams.from_config(cfg)
    static = cfg.static()

    imus = ImuWindow(
        jnp.asarray(h["imu"][0]), jnp.asarray(h["imu"][1]),
        jnp.asarray(h["imu"][2]), jnp.asarray(h["imu"][3]),
    )
    inp = StepInputs(
        anchor=x, anchor_t=jnp.float32(h["anchor_t"]),
        anchor_a=jnp.asarray(h["anchor_a"]), anchor_w=jnp.asarray(h["anchor_w"]),
        x=x, P=P, t_integrated=jnp.float32(h["t_integrated"]),
        imus_filter=imus, imus_path=imus,
        pts=jnp.asarray(h["pts"]), pts_t=jnp.asarray(h["pts_t"]),
        pts_mask=jnp.asarray(h["pts_mask"]),
        t2=jnp.float32(h["t2"]), Q=Q, dyn=dyn,
    )
    out_ref = lio_step(inp, m, static, grid)

    packed = pack_host_inputs(
        h["anchor_t"], h["t_integrated"], h["t2"], h["anchor_a"], h["anchor_w"],
        h["imu"], h["imu"], h["pts"], h["pts_t"], h["pts_mask"],
    )
    # rebuild the map (lio_step donated it)
    _, _, _, _, m2, _ = _inputs()
    out_pk = lio_step_packed(
        jnp.asarray(packed), x, P, x, jnp.float32(h["anchor_t"]), Q, m2, dyn,
        n_pts=len(h["pts"]), n_imu_f=len(h["imu"][0]), n_imu_p=len(h["imu"][0]),
        static_cfg=static, grid=grid,
    )

    np.testing.assert_allclose(out_ref.x.p, out_pk.x.p, rtol=0, atol=1e-6)
    np.testing.assert_allclose(out_ref.x.R, out_pk.x.R, rtol=0, atol=1e-6)
    np.testing.assert_allclose(out_ref.P, out_pk.P, rtol=0, atol=1e-6)
    assert int(out_ref.ds_count) == int(out_pk.ds_count)
    np.testing.assert_allclose(out_ref.telemetry, out_pk.telemetry, atol=1e-6)
    # map contents identical
    np.testing.assert_array_equal(np.asarray(out_ref.map.keys), np.asarray(out_pk.map.keys))
    np.testing.assert_allclose(np.asarray(out_ref.map.pts), np.asarray(out_pk.map.pts))


def test_telemetry_layout():
    cfg, grid, x, P, m, h = _inputs()
    Q = process_noise_Q(cfg)
    dyn = DynParams.from_config(cfg)
    packed = pack_host_inputs(
        h["anchor_t"], h["t_integrated"], h["t2"], h["anchor_a"], h["anchor_w"],
        h["imu"], h["imu"], h["pts"], h["pts_t"], h["pts_mask"],
    )
    out = lio_step_packed(
        jnp.asarray(packed), x, P, x, jnp.float32(h["anchor_t"]), Q, m, dyn,
        n_pts=len(h["pts"]), n_imu_f=len(h["imu"][0]), n_imu_p=len(h["imu"][0]),
        static_cfg=cfg.static(), grid=grid,
    )
    from limovelo_tpu.step import (TELEMETRY_DIM, TEL_DS_COUNT, TEL_EXT_T,
                                   TEL_MAP_DROPPED, TEL_MAP_POINTS, TEL_P,
                                   TEL_R, TEL_UPDATED)

    tele = np.asarray(out.telemetry)
    assert tele.shape == (TELEMETRY_DIM,)
    assert tele[TEL_UPDATED] in (0.0, 1.0)                      # updated flag
    assert tele[TEL_DS_COUNT] == float(np.asarray(out.ds_count))  # ds_count
    R = tele[TEL_R].reshape(3, 3)
    np.testing.assert_allclose(R, np.asarray(out.x.R), atol=1e-7)
    np.testing.assert_allclose(tele[TEL_P], np.asarray(out.x.p), atol=1e-7)
    np.testing.assert_allclose(tele[TEL_EXT_T], np.asarray(out.x.t_LI), atol=1e-7)
    assert tele[TEL_MAP_POINTS] == float(np.sum(np.asarray(out.map.num_points)))
    assert tele[TEL_MAP_DROPPED] >= 0.0
