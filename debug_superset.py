"""Is lio_step bitwise-invariant to padding the path window with pre-anchor
(device-masked) IMU entries?  If not, the depth-K pipeline's superset windows
break determinism."""
import numpy as np
import jax.numpy as jnp

from limovelo_tpu import Config
from limovelo_tpu.config import DynParams
from limovelo_tpu.filter.process import ImuWindow, process_noise_Q
from limovelo_tpu.geometry import state as st
from limovelo_tpu.mapping import GridParams, insert, make_map
from limovelo_tpu.step import StepInputs, lio_step

cfg = Config(real_time=False, min_dist=0.1, downsample_prec=0.2, map_table_size=1 << 10)
grid = GridParams.from_config(cfg)
rng = np.random.default_rng(0)
x = st.make_initial(cfg)
P = st.initial_covariance()
n_pts = 256
pts = rng.uniform(-8, 8, size=(n_pts, 3)).astype(np.float32)
pts_t = rng.uniform(0.5, 0.6, n_pts).astype(np.float32)
mask = np.ones(n_pts, bool)
m = make_map(grid)
mp = rng.uniform(-10, 10, size=(512, 3)).astype(np.float32)
m = insert(m, jnp.asarray(mp), jnp.ones(512, bool), grid)
m2 = insert(make_map(grid), jnp.asarray(mp), jnp.ones(512, bool), grid)

anchor_t = 0.5
# exact path window: imus in (0.5, 0.6]
t_ex = np.array([0.52, 0.54, 0.56, 0.58, 0.6], np.float32)
a_all = (rng.normal(size=(9, 3)) * 0.1 - np.array(cfg.gravity_vec)).astype(np.float32)
w_all = (rng.normal(size=(9, 3)) * 0.05).astype(np.float32)
# superset: 4 pre-anchor entries + the same 5
t_su = np.array([0.42, 0.44, 0.46, 0.48, 0.52, 0.54, 0.56, 0.58, 0.6], np.float32)

def win(ts, a, w, pad_to):
    M = len(ts)
    t_arr = np.zeros(pad_to, np.float32); a_arr = np.zeros((pad_to, 3), np.float32)
    w_arr = np.zeros((pad_to, 3), np.float32); msk = np.zeros(pad_to, bool)
    t_arr[:M] = ts; a_arr[:M] = a; w_arr[:M] = w; msk[:M] = True
    return ImuWindow(jnp.asarray(t_arr), jnp.asarray(a_arr), jnp.asarray(w_arr), jnp.asarray(msk))

imus_f = win(t_ex, a_all[4:], w_all[4:], 8)      # filter window identical in both
imus_ex = win(t_ex, a_all[4:], w_all[4:], 8)
imus_su = win(t_su, a_all, w_all, 16)

def run(imus_p, mm):
    inp = StepInputs(
        anchor=x, anchor_t=jnp.float32(anchor_t),
        anchor_a=jnp.asarray(a_all[4]), anchor_w=jnp.asarray(w_all[4]),
        x=x, P=P, t_integrated=jnp.float32(0.5),
        imus_filter=imus_f, imus_path=imus_p,
        pts=jnp.asarray(pts), pts_t=jnp.asarray(pts_t), pts_mask=jnp.asarray(mask),
        t2=jnp.float32(0.6), Q=process_noise_Q(cfg), dyn=DynParams.from_config(cfg),
    )
    return lio_step(inp, m if mm == 1 else m2, cfg.static(), grid)

o1 = run(imus_ex, 1)
o2 = run(imus_su, 2)
for f in ("p", "v", "R"):
    a1, a2 = np.asarray(getattr(o1.x, f)), np.asarray(getattr(o2.x, f))
    print(f, "exact==superset:", np.array_equal(a1, a2), float(np.max(np.abs(a1 - a2))))
print("tele equal:", np.array_equal(np.asarray(o1.telemetry), np.asarray(o2.telemetry)))
