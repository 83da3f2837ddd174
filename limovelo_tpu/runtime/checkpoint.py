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


def save_checkpoint(path: str, pipe):
    """Serialize full pipeline state for exact resume."""
    if hasattr(pipe, "flush"):
        pipe.flush()   # resolve any in-flight step's bookkeeping first
    x: NavState = pipe.x
    np.savez_compressed(
        path,
        # filter
        R=np.asarray(x.R), p=np.asarray(x.p), v=np.asarray(x.v),
        bg=np.asarray(x.bg), ba=np.asarray(x.ba), g=np.asarray(x.g),
        R_LI=np.asarray(x.R_LI), t_LI=np.asarray(x.t_LI),
        P=np.asarray(pipe.P),
        # anchor
        aR=np.asarray(pipe.anchor.R), ap=np.asarray(pipe.anchor.p),
        av=np.asarray(pipe.anchor.v), abg=np.asarray(pipe.anchor.bg),
        aba=np.asarray(pipe.anchor.ba), ag=np.asarray(pipe.anchor.g),
        aR_LI=np.asarray(pipe.anchor.R_LI), at_LI=np.asarray(pipe.anchor.t_LI),
        # times
        t2=pipe.t2, last_updated=pipe.last_time_updated,
        last_integrated=pipe.last_time_integrated, anchor_t=pipe.anchor_t,
        initial_time=pipe.accum.initial_time,
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
    pipe.accum.initial_time = float(d["initial_time"])
    pipe.accum._ready = True
    pipe._initialized = True
