"""Data pipeline end-to-end: InteriorGS-style inputs -> NaVILA dataset.

Runs every stage on a synthetic scene with the mock LLM client:
semantic map -> physical map -> scene text -> trajectory generation (A* +
judging + instructions) -> 2D->3D transform -> merge -> statistics -> splits ->
action GT -> waypoint rendering -> NaVILA samples.
"""

import json
import math
from pathlib import Path

import numpy as np
import pytest

from sage3d_tpu.data import actions as actions_mod
from sage3d_tpu.data import navila, physical_map, scene_text, semantic_map
from sage3d_tpu.data import split as split_mod
from sage3d_tpu.data import statistics as stats_mod
from sage3d_tpu.data import trajectory_gen as tg
from sage3d_tpu.data import transform_2d3d
from sage3d_tpu.data.astar import astar_pixel, nearest_free_pixel_on_side
from sage3d_tpu.data.llm import MockLLMClient, robust_json_parse
from sage3d_tpu.data.merge import merge_scene


# ---------------------------------------------------------------------------
# synthetic InteriorGS-style inputs
# ---------------------------------------------------------------------------

def make_interiorgs_scene(tmp, scene_id="0001"):
    """occupancy.{json,png} + labels.json for a 12x12 m room with 6 objects."""
    from PIL import Image
    scale = 0.1
    size = 120
    occ = np.full((size, size), 255, np.uint8)   # free
    occ[0:2, :] = 128                            # walls (value 128)
    occ[-2:, :] = 128
    occ[:, 0:2] = 128
    occ[:, -2:] = 128
    occ[50:52, 10:60] = 128                      # inner wall
    occ[80:90, 80:90] = 0                        # unable area

    def bbox(cx, cy, w, h, z0=0.0, z1=1.0):
        return [{"x": cx - w / 2, "y": cy - h / 2, "z": z0},
                {"x": cx + w / 2, "y": cy - h / 2, "z": z0},
                {"x": cx + w / 2, "y": cy + h / 2, "z": z0},
                {"x": cx - w / 2, "y": cy + h / 2, "z": z0},
                {"x": cx - w / 2, "y": cy - h / 2, "z": z1},
                {"x": cx + w / 2, "y": cy - h / 2, "z": z1},
                {"x": cx + w / 2, "y": cy + h / 2, "z": z1},
                {"x": cx - w / 2, "y": cy + h / 2, "z": z1}]

    labels = [
        {"label": "table", "ins_id": 1, "bounding_box": bbox(3.0, 3.0, 1.2, 0.8)},
        {"label": "sofa", "ins_id": 2, "bounding_box": bbox(9.0, 2.5, 2.0, 0.9)},
        {"label": "bed", "ins_id": 3, "bounding_box": bbox(2.5, 9.0, 2.0, 1.6)},
        {"label": "wardrobe", "ins_id": 4, "bounding_box": bbox(9.5, 9.5, 1.0, 0.6)},
        {"label": "plant", "ins_id": 5, "bounding_box": bbox(6.0, 6.5, 0.4, 0.4)},
        {"label": "chair", "ins_id": 6, "bounding_box": bbox(4.0, 6.0, 0.5, 0.5)},
    ]
    d = tmp / scene_id
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "occupancy.json", "w") as f:
        json.dump({"scale": scale, "min": [0.0, 0.0, 0.0]}, f)
    Image.fromarray(occ).save(d / "occupancy.png")
    with open(d / "labels.json", "w") as f:
        json.dump(labels, f)
    return d


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipeline")
    scene_dir = make_interiorgs_scene(tmp / "raw")
    return tmp, scene_dir


def test_robust_json_parse():
    assert robust_json_parse('{"a": 1}') == {"a": 1}
    assert robust_json_parse('noise {"a": 1} more') == {"a": 1}
    assert robust_json_parse("[1,2]") == [1, 2]
    assert robust_json_parse("garbage") is None


def test_astar_basic():
    grid = np.zeros((20, 20), np.uint8)
    grid[10, 2:18] = 1  # wall with gaps at both ends
    path = astar_pixel(grid, (5, 5), (5, 15))  # (x, y)
    assert path is not None
    assert path[0] == (5, 5) and path[-1] == (5, 15)
    # path must route around the wall
    assert all(grid[y, x] == 0 for x, y in path)
    # blocked case
    grid[10, :] = 1
    assert astar_pixel(grid, (5, 5), (5, 15)) is None


def test_wavefront_matches_astar_reachability():
    from sage3d_tpu.data.astar import plan_many
    rng = np.random.default_rng(3)
    grid = (rng.uniform(size=(40, 40)) < 0.25).astype(np.uint8)
    grid[0, 0] = 0
    free = grid == 0
    starts, goals = [], []
    for _ in range(12):
        ys, xs = np.where(free)
        i, j = rng.integers(0, len(ys), 2)
        starts.append((ys[i], xs[i]))
        goals.append((ys[j], xs[j]))
    paths_wave = plan_many(free, np.array(starts), np.array(goals))
    for (sy, sx), (gy, gx), pw in zip(starts, goals, paths_wave):
        pa = astar_pixel(grid, (sx, sy), (gx, gy))
        assert (pa is not None) == (pw is not None)


def test_semantic_map_schema(pipeline):
    tmp, scene_dir = pipeline
    out = semantic_map.build_scene_dir(scene_dir, tmp / "maps", save_png=False)
    with open(out) as f:
        records = json.load(f)
    cats = {r["category_label"] for r in records}
    assert "wall" in cats and "Unable Area" in cats and "table" in cats
    table = next(r for r in records if r["category_label"] == "table")
    assert len(table["bbox_m"]) == 4
    assert table["item_id"].startswith("table_")
    assert len(table["mask_coords_m"]) == table["area"]
    # resume: second call returns the same file without rebuilding
    out2 = semantic_map.build_scene_dir(scene_dir, tmp / "maps", save_png=False)
    assert out2 == out


def test_physical_map(pipeline):
    tmp, scene_dir = pipeline
    out = physical_map.convert_scene(scene_dir, tmp / "phys")
    with open(out) as f:
        entries = json.load(f)
    assert "label_1" in entries
    assert entries["label_1"].startswith("(")


def test_scene_text(pipeline):
    tmp, scene_dir = pipeline
    out = scene_text.process_scene("0001", tmp / "phys" / "scene.json",
                                   tmp / "text", client=MockLLMClient())
    assert out is not None and out.read_text()


def test_trajectory_generation(pipeline):
    tmp, scene_dir = pipeline
    with open(tmp / "maps" / "2D_Semantic_Map_0001_Complete.json") as f:
        sem_data = json.load(f)
    summary = tg.process_scene("0001", sem_data, tmp / "traj",
                               client=MockLLMClient(), min_trajs=4,
                               max_batches=3, seed=1)
    assert summary["trajectories"] >= 1, summary
    parts = list((tmp / "traj" / "0001").glob("trajectories_*part*.json"))
    assert parts
    with open(parts[0]) as f:
        data = json.load(f)
    sample = data["scenes"][0]["samples"][0]
    assert len(sample["points"]) >= 2
    assert sample["instructions"][0]["generated_instruction"]
    assert sample["points"][0]["focal_length"] == 7.0
    # resume path: second call sees existing trajectories
    summary2 = tg.process_scene("0001", sem_data, tmp / "traj",
                                client=MockLLMClient(), min_trajs=1)
    assert summary2["resumed"]


def test_transform_merge_stats_split_actions_navila(pipeline):
    tmp, scene_dir = pipeline
    # 2D -> 3D transform
    n = transform_2d3d.process_scene(tmp / "traj" / "0001", tmp / "maps")
    assert n >= 1
    trans_files = list((tmp / "traj" / "0001").glob("*part*_trans.json"))
    assert trans_files
    with open(trans_files[0]) as f:
        tdata = json.load(f)
    pts = tdata["scenes"][0]["samples"][0]["points"]
    assert pts[-1]["rotation"] == [0.0, 0.0, 0.0, 1.0]
    assert pts[0]["rotation"][1] == 0.0 and pts[0]["rotation"][2] == 0.0

    # merge
    merged = merge_scene(tmp / "traj" / "0001", prefix="gvln")
    assert merged is not None
    with open(merged) as f:
        mdata = json.load(f)
    samples = mdata["scenes"][0]["samples"]
    assert [s["trajectory_id"] for s in samples] == \
        [str(i) for i in range(len(samples))]

    # statistics
    summary = stats_mod.analyze_all(tmp / "traj", prefix="gvln")
    assert summary["total_scenes"] == 1
    assert summary["total_trajectories"] == len(samples)
    stats_file = tmp / "traj" / "0001" / "trajectories_statistic_0001.json"
    with open(stats_file) as f:
        st = json.load(f)
    assert st["scene_summary"]["total_trajectories"] == len(samples)

    # splits (single scene -> it lands in scene_unseen per the ordering)
    scene_stats = {k: v for k, v in summary["scenes"].items()}
    traj_ids = {"0001": [s["trajectory_id"] for s in samples]}
    instr_counts = {"0001": {s["trajectory_id"]: len(s["instructions"])
                             for s in samples}}
    mappings = split_mod.create_split_mappings(scene_stats, traj_ids,
                                               instr_counts)
    files = split_mod.save_split_mappings(mappings, tmp / "splits")
    assert len(files) == 5
    mat = split_mod.materialize_all(tmp / "splits", tmp / "traj",
                                    tmp / "split_data", prefix="gvln")
    total_scenes_out = sum(len(v) for v in mat.values())
    assert total_scenes_out >= 1

    # action GT
    outs = actions_mod.process_all(tmp / "traj", tmp / "actions",
                                   preset="navila_small", workers=1)
    assert outs
    with open(outs[0]) as f:
        gt = json.load(f)
    rec = gt["trajectories"][0]
    assert rec["actions"][-1] == "STOP"
    assert len(rec["actions"]) == len(rec["sampled_points"])
    assert set(rec["actions"]) <= {"MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT",
                                   "STOP"}

    # waypoint rendering on the TPU renderer (tiny scene+frames)
    from sage3d_tpu.data.images import generate_scene_images
    from sage3d_tpu.renderer.scene import synthetic_room
    scene = synthetic_room(num_gaussians=200, seed=2)
    # shrink to 2 trajectories and small images for test speed
    meta = generate_scene_images(
        scene, outs[0], tmp / "images", "0001", batch_size=4,
        max_trajectories=1, width=64, height=48)
    tid, tmeta = next(iter(meta["trajectories"].items()))
    assert tmeta["num_frames"] == len(tmeta["frames"]) > 0
    img0 = tmp / "images" / "0001" / tmeta["frames"][0]
    assert img0.exists()

    # NaVILA dataset
    info = navila.create_dataset([{
        "scene_id": "0001",
        "actions_path": outs[0],
        "images_metadata_path": tmp / "images" / "0001" / "image_metadata.json",
        "trajectories_path": merged,
    }], tmp / "navila")
    assert info["total_samples"] > 0
    part = tmp / "navila" / info["part_files"][0]
    with open(part) as f:
        part_samples = json.load(f)
    s0 = part_samples[0]
    assert s0["a"].startswith("The next action is ")
    assert s0["frames"]


def test_images_scene_shard_filter():
    from sage3d_tpu.data.images import scene_shard_filter
    scenes = [f"{i:04d}" for i in range(50)]
    shards = [scene_shard_filter(scenes, i, 4) for i in range(4)]
    assert sorted(sum(shards, [])) == scenes       # partition, no overlap
    assert all(len(s) > 0 for s in shards)


def test_wavefront_long_serpentine_path_matches_astar():
    """A winding path longer than h+w cells must still be found (the
    relaxation cap is a safety bound, not a path-length limit)."""
    import numpy as np
    from sage3d_tpu.data.astar import astar_pixel, plan_many

    h, w = 40, 40
    free = np.ones((h, w), bool)
    # serpentine: a wall every 4th row, gap alternating right/left
    for i, r in enumerate(range(2, h - 2, 4)):
        if i % 2 == 0:
            free[r, : w - 1] = False     # gap at the right edge
        else:
            free[r, 1:] = False          # gap at the left edge
    start, goal = (0, 0), (h - 1, w - 1)
    ref = astar_pixel(~free, start, goal)   # astar takes 1=blocked, (x, y)
    assert ref is not None and len(ref) > h + w   # genuinely long path
    got = plan_many(free, np.asarray([start]), np.asarray([goal]))[0]
    assert got is not None
    assert len(got) == len(ref)                    # same geodesic length
