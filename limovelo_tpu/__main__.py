"""Command-line runner — the launch-layer analog of the reference's
roslaunch files (`/root/reference/launch/*.launch`, SURVEY.md §2.13).

    python -m limovelo_tpu run --bag xaloc.bag --config xaloc.yaml --out traj.tum
    python -m limovelo_tpu kitti --drive 2011_09_26_drive_0001_sync --out traj.kitti
    python -m limovelo_tpu sim --world corridor --duration 10 --out traj.tum
    python -m limovelo_tpu sim --save-map map.npz          # build an HD map
    python -m limovelo_tpu sim --hd-map map.npz            # prelocalization
    python -m limovelo_tpu viz rviz --profile kitti --out kitti.rviz
    python -m limovelo_tpu viz render --map map.npz --traj traj.tum --out run.png
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _load_config(args, default_profile="default"):
    """Resolve the config profile.  `default_profile` is the per-command
    fallback when no --config is given: the kitti command must default to
    the KITTI profile (gravity sign, extrinsics — config/kitti.yaml) rather
    than DEFAULT, mirroring how `launch/kitti.launch` loads its own YAML."""
    from limovelo_tpu import Config
    from limovelo_tpu.config import PROFILES

    name = args.config if args.config is not None else default_profile
    if name in PROFILES:
        cfg = PROFILES[name]
    else:
        cfg = Config.from_yaml(name)
    overrides = {}
    if args.real_time is not None:
        overrides["real_time"] = args.real_time
    if args.mapping_online is not None:
        overrides["mapping_online"] = args.mapping_online
    return cfg.replace(**overrides) if overrides else cfg


def _write_outputs(pipe, args):
    import numpy as np

    from limovelo_tpu.runtime.evaluate import write_kitti, write_tum

    res = pipe.result
    print(f"processed {len(res.records)} state updates")
    if getattr(args, "render", None) and res.records:
        from limovelo_tpu.runtime.checkpoint import compact_map_points
        from limovelo_tpu.viz import render_run

        render_run(
            args.render, res.positions, times=res.times,
            map_pts=compact_map_points(pipe.map),
            title=f"limovelo_tpu — {args.cmd}",
        )
        print(f"figure → {args.render}")
    if getattr(args, "ply", None):
        from limovelo_tpu.runtime.checkpoint import compact_map_points
        from limovelo_tpu.viz import write_ply
        from limovelo_tpu.viz.export import height_colors

        mp = compact_map_points(pipe.map)
        write_ply(args.ply, mp, height_colors(mp) if len(mp) else None)
        print(f"map cloud → {args.ply}")
    if args.out:
        if args.out.endswith(".kitti") or args.out.endswith(".txt"):
            write_kitti(args.out, res.rotations, res.positions)
        else:
            write_tum(args.out, res.times, res.rotations, res.positions)
        print(f"trajectory → {args.out}")
    from limovelo_tpu.runtime.slam import SlamPipeline

    if isinstance(pipe, SlamPipeline):
        # SLAM backend results: optimized keyframe trajectory + loop stats
        Rs_opt, ps_opt = pipe.optimized_trajectory()
        kf_t = np.array([f.t for f in pipe.keyframes.frames])
        n_att = len(pipe.loop_stats)
        n_acc = sum(1 for s in pipe.loop_stats if s["accepted"])
        print(f"SLAM backend: {len(kf_t)} keyframes, {n_att} loop "
              f"candidates, {n_acc} closures accepted")
        if args.out and len(kf_t) >= 2:
            base, dot, ext = args.out.rpartition(".")
            opt_path = (base or args.out) + ".opt." + (ext or "tum")
            write_tum(opt_path, kf_t, Rs_opt, ps_opt)
            print(f"optimized keyframe trajectory → {opt_path}")
    if args.save_map:
        from limovelo_tpu.runtime.checkpoint import save_map

        save_map(args.save_map, pipe.map, pipe.grid)
        print(f"HD map → {args.save_map}")
    if args.checkpoint:
        from limovelo_tpu.runtime.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint, pipe)
        print(f"checkpoint → {args.checkpoint}")
    if res.records:
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

    mesh = None
    if getattr(args, "devices", None):
        import jax
        from limovelo_tpu.parallel.sharding import make_mesh

        devs = jax.devices()
        if len(devs) < args.devices:
            raise SystemExit(
                f"--devices {args.devices}: only {len(devs)} device(s) "
                f"visible (hint: XLA_FLAGS=--xla_force_host_platform_"
                f"device_count=N JAX_PLATFORMS=cpu for a virtual mesh)")
        mesh = make_mesh(devs[: args.devices])
    if getattr(args, "loop_closure", False):
        from limovelo_tpu.runtime.slam import SlamPipeline

        if args.hd_map:
            raise SystemExit("--loop-closure with --hd-map is not supported "
                             "(prelocalization runs against a frozen map)")
        return SlamPipeline(
            cfg, mesh=mesh,
            kf_min_translation=getattr(args, "kf_min_translation", 2.0),
            loop_min_index_gap=getattr(args, "loop_min_gap", 20),
            loop_max_distance=getattr(args, "loop_max_distance", 5.0),
            loop_max_rms=getattr(args, "loop_max_rms", 0.15),
        )
    if args.hd_map:
        return LioPipeline.from_hd_map(cfg, args.hd_map)
    return LioPipeline(cfg, mesh=mesh, shard=getattr(args, "shard", "points"))


def _read_tum(path):
    import numpy as np

    data = np.loadtxt(path)
    data = np.atleast_2d(data)
    return data[:, 0], data[:, 1:4]


def _viz_main(args):
    if args.viz_cmd == "rviz":
        from limovelo_tpu.viz import make_profile

        with open(args.out, "w") as f:
            f.write(make_profile(args.profile))
        print(f"rviz profile ({args.profile}) → {args.out}")
        return
    # render
    import numpy as np

    times = positions = gt = map_pts = None
    if args.traj:
        times, positions = _read_tum(args.traj)
    if args.gt:
        _, gt = _read_tum(args.gt)
    if args.map:
        map_pts = np.load(args.map)["points"]
    if positions is None and map_pts is None:
        raise SystemExit("viz render: need --traj and/or --map")
    from limovelo_tpu.viz import render_run

    render_run(args.out, positions, times=times, map_pts=map_pts,
               gt_positions=gt, title="limovelo_tpu")
    print(f"figure → {args.out}")
    if args.ply and map_pts is not None:
        from limovelo_tpu.viz import write_ply
        from limovelo_tpu.viz.export import height_colors

        write_ply(args.ply, map_pts, height_colors(map_pts) if len(map_pts) else None)
        print(f"map cloud → {args.ply}")


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
        sp.add_argument("--render", default=None, help="write a PNG/SVG figure of the run")
        sp.add_argument("--ply", default=None, help="write the map cloud as PLY")
        sp.add_argument("--profile", default=None,
                        help="capture a jax.profiler trace of the replay into this dir")
        sp.add_argument("--devices", type=int, default=None,
                        help="run the step over an N-device mesh "
                             "(point-sharded window, psum'd normal equations)")
        sp.add_argument("--shard", default="points", choices=["points", "map"],
                        help="with --devices: 'points' replicates the map, "
                             "'map' also partitions map table rows (D× capacity)")
        sp.add_argument("--loop-closure", action="store_true",
                        help="SLAM mode: keyframes + loop closure + pose-graph "
                             "backend; exports raw AND optimized trajectories")
        sp.add_argument("--kf-min-translation", type=float, default=2.0,
                        help="keyframe spacing (m) in SLAM mode")
        sp.add_argument("--loop-min-gap", type=int, default=20,
                        help="min keyframe index gap for loop candidates")
        sp.add_argument("--loop-max-distance", type=float, default=5.0,
                        help="max revisit distance (m) for loop candidates")
        sp.add_argument("--loop-max-rms", type=float, default=0.15,
                        help="max registration RMS (m) to accept a closure")

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
    sp.add_argument("--omega", type=float, default=0.5,
                    help="room world: circle angular rate (rad/s)")

    sp = sub.add_parser("eval", help="regenerate EVAL.md (accuracy battery)")
    sp.add_argument("--out", default="EVAL.md")
    sp.add_argument("--fast", action="store_true", help="shorter durations")
    sp.add_argument("--kitti-root", default=None,
                    help="KITTI raw *_sync drive: run the real-data parity "
                         "protocol (GT from OXTS unless --gt)")
    sp.add_argument("--bag", default=None,
                    help="ROS1 bag: real-data parity protocol (needs --gt)")
    sp.add_argument("--gt", default=None, help="TUM ground-truth file")
    sp.add_argument("--max-scans", type=int, default=None)
    sp.add_argument("--skip-battery", action="store_true",
                    help="only run the real-data rows (no synthetic battery)")

    sp = sub.add_parser("viz", help="visualization tools (no device needed)")
    viz_sub = sp.add_subparsers(dest="viz_cmd", required=True)
    vp = viz_sub.add_parser("rviz", help="generate an rviz profile")
    vp.add_argument("--profile", default="default")
    vp.add_argument("--out", required=True)
    vp = viz_sub.add_parser("render", help="render saved artifacts to a figure")
    vp.add_argument("--map", default=None, help="HD map .npz (from --save-map)")
    vp.add_argument("--traj", default=None, help="TUM trajectory file")
    vp.add_argument("--gt", default=None, help="TUM ground-truth file")
    vp.add_argument("--out", required=True, help="output PNG/SVG")
    vp.add_argument("--ply", default=None, help="also export map cloud as PLY")

    args = p.parse_args(argv)
    if args.cmd == "viz":
        return _viz_main(args)
    if args.cmd == "eval":
        from limovelo_tpu.runtime.evalsuite import (run_eval, run_real_eval,
                                                    write_eval_md)

        real_rows = None
        if args.kitti_root or args.bag:
            real_rows = run_real_eval(
                kitti_root=args.kitti_root, bag=args.bag, gt_tum=args.gt,
                max_scans=args.max_scans,
            )
            for r in real_rows:
                print(f"[real] {r.scenario}: ATE {r.ate_m:.4f} m, "
                      f"{r.updates} updates, {r.update_hz:.1f} Hz  ({r.note})")
        if args.skip_battery:
            if not real_rows:
                raise SystemExit("--skip-battery without --kitti-root/--bag: "
                                 "nothing to do")
            return
        rows = run_eval(fast=args.fast)
        print(write_eval_md(rows, args.out, real_rows=real_rows))
        print(f"table → {args.out}")
        return
    # resolve the FULL config (per-command default profile + CLI overrides +
    # sim-mode tweaks) before the pipeline is constructed — the pipeline
    # freezes extrinsics/gravity/buckets at build time
    cfg = _load_config(args, "kitti" if args.cmd == "kitti" else "default")
    if args.cmd == "sim":
        cfg = cfg.replace(real_time=False, min_dist=0.5, downsample_prec=0.3)
    pipe = _make_pipe(cfg, args)
    if args.resume:
        from limovelo_tpu.runtime.checkpoint import load_checkpoint

        load_checkpoint(args.resume, pipe)

    t0 = time.time()
    if getattr(args, "profile", None):
        from contextlib import ExitStack

        from limovelo_tpu.runtime.profiling import trace

        _stack = ExitStack()
        _stack.enter_context(trace(args.profile))
    else:
        _stack = None
    if args.cmd == "run":
        from limovelo_tpu.io.rosbag import feed_pipeline

        feed_pipeline(pipe, args.bag, cfg, max_msgs=args.max_msgs)
    elif args.cmd == "kitti":
        from limovelo_tpu.io.kitti import KittiRawReader, feed_pipeline

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

        if args.world == "corridor":
            world, traj = corridor_world(length=200.0), corridor_trajectory(speed=args.speed)
        else:
            world, traj = room_world(), circle_trajectory(omega=args.omega)
        sim = simulate(world, traj, cfg, duration=args.duration)
        replay_into(pipe, sim)
        from limovelo_tpu.runtime.evaluate import ate_rmse

        res = pipe.result
        if res.records:
            rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
            print(f"ATE RMSE vs ground truth: {rmse:.4f} m")
    if _stack is not None:
        _stack.close()
        print(f"profiler trace → {args.profile}")
    print(f"wall time: {time.time() - t0:.1f} s")
    _write_outputs(pipe, args)


if __name__ == "__main__":
    main()
