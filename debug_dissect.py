"""Dissect the dumped window: run predict → deskew → downsample → match at
the PREDICTION and attribute residual bias by true surface."""
import os
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")

import pickle
import numpy as np
import jax.numpy as jnp

import sys
sys.path.insert(0, "tests")
from test_racing import racing_cfg, GRID_LONG

from limovelo_tpu.deskew.compensate import build_path, compensate
from limovelo_tpu.filter.process import ImuWindow, predict_window, process_noise_Q
from limovelo_tpu.filter.update import _match
from limovelo_tpu.geometry.state import NavState
from limovelo_tpu.io.simulate import corridor_trajectory
from limovelo_tpu.mapping import HashGridMap
from limovelo_tpu.ops.voxel import voxel_downsample
from limovelo_tpu.config import DynParams

with open("/tmp/window_dump.pkl", "rb") as f:
    d = pickle.load(f)

import sys as _sys
_planarity = float(_sys.argv[1]) if len(_sys.argv) > 1 else 0.12
cfg = racing_cfg(plane_planarity=_planarity)
dyn = DynParams.from_config(cfg)
static = cfg.static()
grid = GRID_LONG
traj = corridor_trajectory(speed=20.0, weave=0.3, ramp=1.5, hold=0.5)

rebase = d["rebase"]
t2 = d["t2"] - rebase
x = NavState(*(jnp.asarray(v) for v in d["x"]))
anchor = NavState(*(jnp.asarray(v) for v in d["anchor"]))
m = HashGridMap(
    keys=jnp.asarray(d["map_keys"]), pts=jnp.asarray(d["map_pts"]),
    cell_d2=jnp.asarray(d["map_d2"]),
    num_points=jnp.int32(0), num_buckets=jnp.int32(0), dropped=jnp.int32(0),
)
Q = process_noise_Q(cfg)


def pad_imus(imus, t2_abs):
    ts, accs, gyrs = imus
    entries_t = list(ts - rebase)
    entries_a = list(accs)
    entries_w = list(gyrs)
    if len(ts) and ts[-1] < t2_abs:
        entries_t.append(t2_abs - rebase)
        entries_a.append(accs[-1])
        entries_w.append(gyrs[-1])
    M = len(entries_t)
    B = cfg.bucket_for(max(M, 1), cfg.imu_buckets)
    t_arr = np.zeros(B, np.float32); a_arr = np.zeros((B, 3), np.float32)
    w_arr = np.zeros((B, 3), np.float32); msk = np.zeros(B, bool)
    t_arr[:M] = entries_t; a_arr[:M] = entries_a; w_arr[:M] = entries_w; msk[:M] = True
    return ImuWindow(jnp.asarray(t_arr), jnp.asarray(a_arr), jnp.asarray(w_arr), jnp.asarray(msk))


imus_f = pad_imus(d["imu_f"], d["t2"])
imus_p = pad_imus(d["imu_p"], d["t2"])

x_pred, P_pred = predict_window(x, jnp.asarray(d["P"]), imus_f,
                                jnp.float32(d["last_time_integrated"] - rebase), Q)

# ground truth pose at t2
R_gt, p_gt = traj.pose(d["t2"])
print(f"pred pos err: {(np.asarray(x_pred.p) - p_gt) * 1000} mm")

path = build_path(anchor, jnp.float32(d["anchor_t"] - rebase),
                  jnp.asarray(d["anchor_a"]), jnp.asarray(d["anchor_w"]), imus_p)

n = len(d["pts"])
B = cfg.bucket_for(max(n, 1), cfg.point_buckets)
pts_pad = np.zeros((B, 3), np.float32); t_pad = np.zeros(B, np.float32)
msk = np.zeros(B, bool)
pts_pad[:n] = d["pts"]; t_pad[:n] = (d["pts_t"] - rebase); msk[:n] = True

pts_l2 = compensate(path, anchor, jnp.float32(t2), jnp.asarray(pts_pad),
                    jnp.asarray(t_pad), jnp.asarray(msk))
ds = voxel_downsample(pts_l2, jnp.asarray(msk), dyn.downsample_prec)

r, fit, valid = _match(x_pred, m, ds.pts, ds.mask, grid, static, dyn, None)
r = np.asarray(r); valid = np.asarray(valid); nrm = np.asarray(fit.normal)
q_glob = np.asarray(
    jnp.einsum("ij,nj->ni", x_pred.R,
               jnp.einsum("ij,nj->ni", x_pred.R_LI, ds.pts) + x_pred.t_LI) + x_pred.p
)

v = valid
print(f"matches={v.sum()} mean r={r[v].mean()*1000:.2f}mm  "
      f"push=({(r[v]*nrm[v,0]).mean()*1000:.2f},{(r[v]*nrm[v,1]).mean()*1000:.2f},"
      f"{(r[v]*nrm[v,2]).mean()*1000:.2f})mm")

# classify matches by true surface at the query point
length, width, height = 180.0, 8.0, 4.0
q = q_glob
kinds = np.full(len(q), "other", dtype=object)
kinds[np.abs(q[:, 2]) < 0.15] = "floor"
kinds[np.abs(q[:, 2] - height) < 0.15] = "ceiling"
kinds[np.abs(np.abs(q[:, 1]) - width / 2) < 0.15] = "wall"
# pillar faces: |x - k*6| near 0.3 and |y| in [3.3, 4.0]
xm = np.abs((q[:, 0] + 3.0) % 6.0 - 3.0)   # distance to nearest pillar center in x
pill = (xm < 0.45) & (np.abs(q[:, 1]) > 3.3) & (np.abs(q[:, 1]) < 4.1) & \
       (q[:, 2] > 0.15) & (q[:, 2] < height - 0.15)
kinds[pill] = "pillar"
cap = q[:, 0] > length - 0.2
kinds[cap] = "cap"

for kind in ("floor", "ceiling", "wall", "pillar", "cap", "other"):
    sel = v & (kinds == kind)
    if sel.sum() == 0:
        continue
    px = (r[sel] * nrm[sel, 0])
    print(f"{kind:8s} n={sel.sum():4d} mean|r|={np.abs(r[sel]).mean()*1000:7.2f}mm "
          f"mean r={r[sel].mean()*1000:7.2f}mm push_x={px.mean()*1000:7.2f}mm "
          f"mean|n_x|={np.abs(nrm[sel,0]).mean():.3f}")

# for pillar matches: how far is the fit plane from the true pillar face?
sel = v & (kinds == "pillar")
if sel.sum():
    cen = np.asarray(fit.centroid)[sel]
    nn = nrm[sel]
    # which pillar face: x of nearest face
    xc = np.round(q[sel, 0] / 6.0) * 6.0
    face = np.where(q[sel, 0] < xc, xc - 0.3, xc + 0.3)
    # plane-implied x at centroid y,z for x-facing normals
    xish = np.abs(nn[:, 0]) > 0.7
    if xish.sum():
        err = (cen[xish, 0] - face[xish])
        print(f"pillar x-face fits: n={xish.sum()} centroid-x − trueface: "
              f"mean={err.mean()*1000:.2f}mm p95={np.percentile(np.abs(err),95)*1000:.2f}mm")
    # query point distance to the TRUE face plane
    qe = q[sel][xish, 0] - face[xish]
    print(f"pillar query x − trueface: mean={qe.mean()*1000:.2f}mm")

# worst individual x-contributors
contrib = np.abs(r * nrm[:, 0]) * v
idx = np.argsort(-contrib)[:12]
nb_j, sq_j, nbv_j = None, None, None
from limovelo_tpu.mapping import knn as knn_fn
nb_j, sq_j, nbv_j = knn_fn(m, jnp.asarray(q_glob), grid, k=static.NUM_MATCH_POINTS,
                           rings=static.knn_rings, max_buckets=static.knn_max_buckets)
nb_j = np.asarray(nb_j)
print("\nworst x-contributors:")
for i in idx:
    print(f"q=({q[i,0]:7.3f},{q[i,1]:6.3f},{q[i,2]:6.3f}) r={r[i]*1000:7.1f}mm "
          f"n=({nrm[i,0]:5.2f},{nrm[i,1]:5.2f},{nrm[i,2]:5.2f}) kind={kinds[i]}")
    for kk in range(nb_j.shape[1]):
        p3 = nb_j[i, kk]
        print(f"    nb {p3[0]:8.3f} {p3[1]:7.3f} {p3[2]:7.3f}")

print("\nquery-gate sweep:")
for qg in (0.10, 0.05, 0.03, 0.02):
    vv = v & (np.abs(r) < qg)
    px = (r[vv] * nrm[vv, 0])
    sx = np.sum(r[vv] * nrm[vv, 0]); sxx = np.sum(nrm[vv, 0] ** 2)
    print(f"qg={qg:5.2f} matches={vv.sum():4d} push_x={px.mean()*1000:6.2f}mm "
          f"x-dof pull={sx/max(sxx,1e-9)*1000:8.2f}mm  (sum nx2={sxx:.1f})")

# ground-truth surface distances: is the MAP exact? is the QUERY cloud exact?
length, width, height, pillar_every = 180.0, 8.0, 4.0, 6.0
planes_w = [
    (np.array([0.0, 0.0, 1.0]), 0.0),
    (np.array([0.0, 0.0, -1.0]), height),
    (np.array([0.0, 1.0, 0.0]), width / 2),
    (np.array([0.0, -1.0, 0.0]), width / 2),
    (np.array([1.0, 0.0, 0.0]), 10.0),
    (np.array([-1.0, 0.0, 0.0]), length),
]
boxes_w = []
_x, _side = 0.0, 1.0
while _x < length:
    _y = _side * (width / 2 - 0.3)
    boxes_w.append((np.array([_x, _y, height / 2]), np.array([0.3, 0.3, height / 2])))
    _side = -_side
    _x += pillar_every


def surf_dist_w(qq):
    dd = np.min(np.stack([np.abs(qq @ n + off) for n, off in planes_w]), axis=0)
    for c, half in boxes_w:
        g3 = np.abs(qq - c) - half
        outside = np.linalg.norm(np.maximum(g3, 0.0), axis=1)
        inside = np.max(g3, axis=1)
        dd = np.minimum(dd, np.where(inside < 0, -inside, outside))
    return dd


# the filter world frame is offset from sim world by the INITIAL pose
# (filter starts at origin; sim starts at traj.pose(t_init)).  Reconstruct:
R0, p0 = traj.pose(rebase)  # pose at initial_time — the filter's origin
to_world = lambda qq: qq @ R0.T + p0

q_w = to_world(q[v])
d_q = surf_dist_w(q_w)
print(f"\nquery cloud vs TRUE surfaces: mean={d_q.mean()*1000:.2f}mm "
      f"p95={np.percentile(d_q,95)*1000:.2f}mm")

mask_occ = np.isfinite(d["map_d2"].ravel())
mp = d["map_pts"].reshape(-1, 3)[mask_occ]
near = np.abs(mp[:, 0] - (q_w[:, 0].mean() - p0[0])) < 30
mp_w = to_world(mp[near])
d_m = surf_dist_w(mp_w)
print(f"map points (±30 m) vs TRUE surfaces: n={near.sum()} "
      f"mean={d_m.mean()*1000:.2f}mm p95={np.percentile(d_m,95)*1000:.2f}mm")
