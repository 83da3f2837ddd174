"""Visualization layer (SURVEY.md §2.14 analog): rviz profile generation,
PLY export, offline rendering."""

import os

import numpy as np
import pytest
import yaml

from limovelo_tpu.viz import (
    PROFILES,
    make_profile,
    render_run,
    trajectory_to_ply,
    write_ply,
)
from limovelo_tpu.viz.export import height_colors, read_ply_header

REFERENCE_TOPICS = [
    "/limovelo/state",
    "/limovelo/states",
    "/limovelo/pcl",
    "/limovelo/full_pcl",
    "/limovelo/planes",
]


@pytest.mark.parametrize("name", sorted(PROFILES))
def test_rviz_profile_valid_yaml_with_reference_topics(name):
    text = make_profile(name)
    cfg = yaml.safe_load(text)
    vm = cfg["Visualization Manager"]
    assert vm["Global Options"]["Fixed Frame"] == "map"
    topics = [d.get("Topic") for d in vm["Displays"] if "Topic" in d]
    for t in REFERENCE_TOPICS:
        assert t in topics, f"profile {name} missing display for {t}"
    # grid + TF present (reference display set)
    classes = [d["Class"] for d in vm["Displays"]]
    assert "rviz/Grid" in classes and "rviz/TF" in classes


def test_rviz_unknown_profile_raises():
    with pytest.raises(ValueError):
        make_profile("nope")


def test_ply_roundtrip_header(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "cloud.ply")
    write_ply(p, pts, height_colors(pts))
    count, has_color = read_ply_header(p)
    assert count == 100 and has_color
    # payload size: header + 100 * (12 + 3) bytes
    assert os.path.getsize(p) > 100 * 15

    p2 = str(tmp_path / "plain.ply")
    write_ply(p2, pts)
    count2, has_color2 = read_ply_header(p2)
    assert count2 == 100 and not has_color2


def test_trajectory_ply(tmp_path):
    p = str(tmp_path / "traj.ply")
    pos = np.cumsum(np.random.default_rng(1).normal(size=(50, 3)), axis=0)
    trajectory_to_ply(p, pos)
    count, has_color = read_ply_header(p)
    assert count == 50 and has_color


def test_height_colors_monotone_in_z():
    pts = np.zeros((10, 3), np.float32)
    pts[:, 2] = np.linspace(0, 5, 10)
    c = height_colors(pts)
    assert c.dtype == np.uint8
    # darker blue (lower G) with height
    assert c[-1, 1] < c[0, 1]


def test_render_run_writes_png(tmp_path):
    rng = np.random.default_rng(2)
    pos = np.cumsum(rng.normal(size=(200, 3)), axis=0)
    t = np.arange(200) * 0.01
    mp = rng.uniform(-20, 20, size=(5000, 3))
    out = str(tmp_path / "run.png")
    render_run(out, pos, times=t, map_pts=mp, gt_positions=pos + 0.1)
    assert os.path.getsize(out) > 10_000


def test_render_run_minimal(tmp_path):
    pos = np.zeros((10, 3))
    pos[:, 0] = np.arange(10)
    out = str(tmp_path / "min.png")
    render_run(out, pos)
    assert os.path.exists(out)
