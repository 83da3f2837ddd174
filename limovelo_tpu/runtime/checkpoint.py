"""Checkpoint / resume + HD-map save/load.

The reference has NO persistence: map and state die with the process, and
HD-map save/load was an unfinished TODO on its `hdmaps` branch
(`README.md:64-68`, SURVEY.md §5).  Here both are first-class:

- `save_checkpoint`/`load_checkpoint`: full pipeline state (hash-grid map,
  filter state + covariance, time bookkeeping) → one compressed npz.  A
  preempted job resumes exactly.
- `save_map`/`load_map`: the map alone, compacted to the occupied points — an
  HD map.  `LioPipeline.from_hd_map` starts a run localizing against a
  prebuilt map (the reference's unfinished "prelocalization" mode).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..geometry.state import NavState
from ..mapping import EMPTY_KEY, GridParams, HashGridMap, insert, make_map


def _map_to_host(m: HashGridMap) -> dict:
    return {
        "keys": np.asarray(m.keys),
        "pts": np.asarray(m.pts),
        "cell_d2": np.asarray(m.cell_d2),
        "num_points": np.asarray(m.num_points),
        "num_buckets": np.asarray(m.num_buckets),
        "dropped": np.asarray(m.dropped),
    }


def compact_map_points(m: HashGridMap) -> np.ndarray:
    """Extract the occupied map points as a dense (N,3) array (HD map)."""
    pts = np.asarray(m.pts).reshape(-1, 3)
    occ = np.isfinite(np.asarray(m.cell_d2).ravel())
    return pts[occ]


def save_map(path: str, m: HashGridMap, grid: GridParams):
    """Save the compacted HD map (points + grid geometry)."""
    np.savez_compressed(
        path,
        points=compact_map_points(m),
        voxel_size=grid.voxel_size,
        coarse_factor=grid.coarse_factor,
    )


def load_map(path: str, grid: GridParams, batch: int = 16384) -> HashGridMap:
    """Rebuild a hash-grid map from a saved HD map (prelocalization)."""
    data = np.load(path)
    pts = data["points"].astype(np.float32)
    m = make_map(grid)
    for i in range(0, len(pts), batch):
        chunk = pts[i : i + batch]
        pad = np.zeros((batch, 3), np.float32)
        pad[: len(chunk)] = chunk
        msk = np.zeros(batch, bool)
        msk[: len(chunk)] = True
        m = insert(m, jnp.asarray(pad), jnp.asarray(msk), grid, downsample=True)
    return m


def _nav_to_host(x: NavState, prefix: str) -> dict:
    return {
        prefix + "R": np.asarray(x.R), prefix + "p": np.asarray(x.p),
        prefix + "v": np.asarray(x.v), prefix + "bg": np.asarray(x.bg),
        prefix + "ba": np.asarray(x.ba), prefix + "g": np.asarray(x.g),
        prefix + "R_LI": np.asarray(x.R_LI), prefix + "t_LI": np.asarray(x.t_LI),
    }


def save_checkpoint(path: str, pipe):
    """Serialize full pipeline state for exact resume: filter, map, time
    bookkeeping, the corrected-state history (`_anchors` — the BUFFER_X
    analog the offline re-deskew needs), mapping cadence, AND the
    accumulator tail (buffered points/IMUs the next windows will consume).
    Resume-equivalence is regression-tested: checkpoint→load mid-run must
    reproduce the uninterrupted trajectory (tests/test_slam.py)."""
    if hasattr(pipe, "flush"):
        pipe.flush()   # resolve any in-flight step's bookkeeping first
    x: NavState = pipe.x

    # corrected-state history (pipeline._anchors): stack into arrays
    anc = getattr(pipe, "_anchors", [])
    K = len(anc)
    anc_arrays = {}
    if K:
        anc_arrays["anchors_t"] = np.array([a[0] for a in anc], np.float64)
        fields = ("R", "p", "v", "bg", "ba", "g", "R_LI", "t_LI")
        for fi, name in enumerate(fields):
            anc_arrays["anchors_" + name] = np.stack(
                [np.asarray(getattr(a[1], name)) for a in anc]
            )
        anc_arrays["anchors_a"] = np.stack([np.asarray(a[2]) for a in anc])
        anc_arrays["anchors_w"] = np.stack([np.asarray(a[3]) for a in anc])

    # accumulator tail (post-GC contents — exactly what a live run holds)
    acc = pipe.accum
    acc_arrays = {}
    if acc._imu_t:
        acc_arrays["acc_imu_t"] = np.asarray(acc._imu_t, np.float64)
        acc_arrays["acc_imu_a"] = np.stack(acc._imu_a)
        acc_arrays["acc_imu_w"] = np.stack(acc._imu_w)
        acc_arrays["acc_imu_q"] = np.stack([
            q if q is not None else np.full(4, np.nan) for q in acc._imu_q
        ])
    if acc._pts:
        acc_arrays["acc_pts"] = np.concatenate(acc._pts)
        acc_arrays["acc_pts_t"] = np.concatenate(acc._pts_t)
        acc_arrays["acc_pts_i"] = np.concatenate(acc._pts_i)

    np.savez_compressed(
        path,
        **_nav_to_host(x, ""),
        P=np.asarray(pipe.P),
        **_nav_to_host(pipe.anchor, "a"),
        # times + cadence
        t2=pipe.t2, last_updated=pipe.last_time_updated,
        last_integrated=pipe.last_time_integrated, anchor_t=pipe.anchor_t,
        initial_time=pipe.accum.initial_time,
        last_map_time=(np.nan if pipe.last_map_time is None
                       else pipe.last_map_time),
        last_processed_t2=pipe._last_processed_t2,
        last_prune_t=(np.nan if getattr(pipe, "_last_prune_t", None) is None
                      else pipe._last_prune_t),
        missing_point_times=acc.missing_point_times,
        **anc_arrays,
        **acc_arrays,
        # map
        **{f"map_{k}": v for k, v in _map_to_host(pipe.map).items()},
    )


def load_checkpoint(path: str, pipe) -> None:
    """Restore pipeline state saved by save_checkpoint (in place)."""
    d = np.load(path)
    mk = lambda *names: NavState(*(jnp.asarray(d[n]) for n in names))
    pipe.x = mk("R", "p", "v", "bg", "ba", "g", "R_LI", "t_LI")
    pipe.anchor = mk("aR", "ap", "av", "abg", "aba", "ag", "aR_LI", "at_LI")
    pipe.P = jnp.asarray(d["P"])
    from ..mapping.hashgrid import FAR

    # legacy checkpoints may hold zeros in empty slots; re-sentinel so the
    # Pallas KNN's maskless distance contest stays correct
    cell_d2 = np.asarray(d["map_cell_d2"])
    pts = np.where(np.isfinite(cell_d2)[..., None], np.asarray(d["map_pts"]), FAR)
    pipe.map = HashGridMap(
        keys=jnp.asarray(d["map_keys"]),
        pts=jnp.asarray(pts),
        cell_d2=jnp.asarray(cell_d2),
        num_points=jnp.asarray(d["map_num_points"]),
        num_buckets=jnp.asarray(d["map_num_buckets"]),
        dropped=(
            jnp.asarray(d["map_dropped"])
            if "map_dropped" in d
            else jnp.zeros((), jnp.int32)   # pre-counter checkpoints
        ),
    )
    pipe.t2 = float(d["t2"])
    pipe.last_time_updated = float(d["last_updated"])
    pipe.last_time_integrated = float(d["last_integrated"])
    pipe.anchor_t = float(d["anchor_t"])
    # the device-threaded anchor time (rebased): exact after the pre-save
    # flush, so the host value restores it losslessly
    pipe.anchor_t_dev = jnp.float32(pipe.anchor_t - float(d["initial_time"]))
    pipe.accum.initial_time = float(d["initial_time"])
    pipe.accum._ready = True
    pipe._initialized = True

    # cadence / bookkeeping (older checkpoints: sane fallbacks)
    if "last_map_time" in d:
        v = float(d["last_map_time"])
        pipe.last_map_time = None if np.isnan(v) else v
    if "last_processed_t2" in d:
        pipe._last_processed_t2 = float(d["last_processed_t2"])
    if "last_prune_t" in d:
        v = float(d["last_prune_t"])
        pipe._last_prune_t = None if np.isnan(v) else v
    if "missing_point_times" in d:
        pipe.accum.missing_point_times = bool(d["missing_point_times"])

    # corrected-state history (BUFFER_X analog for offline re-deskew)
    if "anchors_t" in d:
        from .pipeline import AnchorRec

        ts = np.asarray(d["anchors_t"])
        fields = ("R", "p", "v", "bg", "ba", "g", "R_LI", "t_LI")
        pipe._anchors = [
            AnchorRec(
                float(ts[i]),
                NavState(*(jnp.asarray(d["anchors_" + f][i]) for f in fields)),
                np.asarray(d["anchors_a"][i]),
                np.asarray(d["anchors_w"][i]),
                np.asarray(d["anchors_R"][i]),
                np.asarray(d["anchors_p"][i]),
            )
            for i in range(len(ts))
        ]
        # the offline-mapping re-deskew reads the DISPATCH-cadence history
        # (`_anchors_d`, r5) — seed it from the restored anchors so a resumed
        # run maps exactly like the uninterrupted one
        pipe._anchors_d = list(pipe._anchors)

    # accumulator tail — the buffered sensors the next windows consume
    if "acc_imu_t" in d:
        acc = pipe.accum
        acc._imu_t = [float(t) for t in np.asarray(d["acc_imu_t"])]
        acc._imu_a = list(np.asarray(d["acc_imu_a"], np.float32))
        acc._imu_w = list(np.asarray(d["acc_imu_w"], np.float32))
        acc._imu_q = [
            None if np.any(np.isnan(q)) else np.asarray(q, np.float64)
            for q in np.asarray(d["acc_imu_q"])
        ]
    if "acc_pts" in d:
        pipe.accum._pts = [np.asarray(d["acc_pts"], np.float32)]
        pipe.accum._pts_t = [np.asarray(d["acc_pts_t"], np.float64)]
        pipe.accum._pts_i = [
            np.asarray(d["acc_pts_i"], np.float32) if "acc_pts_i" in d
            else np.zeros(len(d["acc_pts"]), np.float32)
        ]
