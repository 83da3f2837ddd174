"""Command-line runner — the launch-layer analog of the reference's
roslaunch files (`/root/reference/launch/*.launch`, SURVEY.md §2.13).

    python -m limovelo_tpu run --bag xaloc.bag --config xaloc.yaml --out traj.tum
    python -m limovelo_tpu kitti --drive 2011_09_26_drive_0001_sync --out traj.kitti
    python -m limovelo_tpu sim --world corridor --duration 10 --out traj.tum
    python -m limovelo_tpu sim --save-map map.npz          # build an HD map
    python -m limovelo_tpu sim --hd-map map.npz            # prelocalization
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _load_config(args):
    from limovelo_tpu import DEFAULT, KITTI, Config

    if args.config == "kitti":
        cfg = KITTI
    elif args.config in (None, "default"):
        cfg = DEFAULT
    else:
        cfg = Config.from_yaml(args.config)
    overrides = {}
    if args.real_time is not None:
        overrides["real_time"] = args.real_time
    if args.mapping_online is not None:
        overrides["mapping_online"] = args.mapping_online
    return cfg.replace(**overrides) if overrides else cfg


def _write_outputs(pipe, args):
    from limovelo_tpu.runtime.evaluate import write_kitti, write_tum

    res = pipe.result
    print(f"processed {len(res.records)} state updates")
    if args.out:
        if args.out.endswith(".kitti") or args.out.endswith(".txt"):
            write_kitti(args.out, res.rotations, res.positions)
        else:
            write_tum(args.out, res.times, res.rotations, res.positions)
        print(f"trajectory → {args.out}")
    if args.save_map:
        from limovelo_tpu.runtime.checkpoint import save_map

        save_map(args.save_map, pipe.map, pipe.grid)
        print(f"HD map → {args.save_map}")
    if args.checkpoint:
        from limovelo_tpu.runtime.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint, pipe)
        print(f"checkpoint → {args.checkpoint}")
    if res.records:
        import numpy as np

        wall = [r.wall_ms for r in res.records]
        print(
            json.dumps(
                {
                    "updates": len(res.records),
                    "wall_ms_p50": round(float(np.percentile(wall, 50)), 3),
                    "mean_matches": round(
                        float(np.mean([r.num_matches for r in res.records])), 1
                    ),
                }
            )
        )


def _make_pipe(cfg, args):
    from limovelo_tpu.runtime.pipeline import LioPipeline

    if args.hd_map:
        return LioPipeline.from_hd_map(cfg, args.hd_map)
    return LioPipeline(cfg)


def main(argv=None):
    p = argparse.ArgumentParser(prog="limovelo_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", default=None, help="YAML profile, 'kitti', or 'default'")
        sp.add_argument("--out", default=None, help="trajectory output (.tum/.kitti)")
        sp.add_argument("--save-map", default=None)
        sp.add_argument("--hd-map", default=None, help="prelocalize against this map")
        sp.add_argument("--checkpoint", default=None)
        sp.add_argument("--resume", default=None)
        sp.add_argument("--real-time", type=lambda s: s == "true", default=None)
        sp.add_argument("--mapping-online", type=lambda s: s == "true", default=None)

    sp = sub.add_parser("run", help="replay a ROS1 bag")
    common(sp)
    sp.add_argument("--bag", required=True)
    sp.add_argument("--max-msgs", type=int, default=None)

    sp = sub.add_parser("kitti", help="replay a KITTI raw drive")
    common(sp)
    sp.add_argument("--drive", required=True, help="path to *_sync drive dir")
    sp.add_argument("--max-scans", type=int, default=None)

    sp = sub.add_parser("sim", help="synthetic world replay (no data needed)")
    common(sp)
    sp.add_argument("--world", default="corridor", choices=["corridor", "room"])
    sp.add_argument("--duration", type=float, default=10.0)
    sp.add_argument("--speed", type=float, default=5.0)

    args = p.parse_args(argv)
    cfg = _load_config(args)
    pipe = _make_pipe(cfg, args)
    if args.resume:
        from limovelo_tpu.runtime.checkpoint import load_checkpoint

        load_checkpoint(args.resume, pipe)

    t0 = time.time()
    if args.cmd == "run":
        from limovelo_tpu.io.rosbag import feed_pipeline

        feed_pipeline(pipe, args.bag, cfg, max_msgs=args.max_msgs)
    elif args.cmd == "kitti":
        from limovelo_tpu.io.kitti import KittiRawReader, feed_pipeline

        cfg = cfg if args.config else _load_config(argparse.Namespace(**{**vars(args), "config": "kitti"}))
        feed_pipeline(pipe, KittiRawReader(args.drive), cfg, max_scans=args.max_scans)
    elif args.cmd == "sim":
        from limovelo_tpu.io.simulate import (
            corridor_trajectory,
            corridor_world,
            circle_trajectory,
            replay_into,
            room_world,
            simulate,
        )

        cfg = cfg.replace(real_time=False, min_dist=0.5, downsample_prec=0.3)
        pipe = _make_pipe(cfg, args)
        if args.world == "corridor":
            world, traj = corridor_world(length=200.0), corridor_trajectory(speed=args.speed)
        else:
            world, traj = room_world(), circle_trajectory()
        sim = simulate(world, traj, cfg, duration=args.duration)
        replay_into(pipe, sim)
        from limovelo_tpu.runtime.evaluate import ate_rmse

        res = pipe.result
        if res.records:
            rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
            print(f"ATE RMSE vs ground truth: {rmse:.4f} m")
    print(f"wall time: {time.time() - t0:.1f} s")
    _write_outputs(pipe, args)


if __name__ == "__main__":
    main()
