"""Config modules load with the reference schema; dataset loaders parse
fabricated on-disk mini-sequences (file layouts from
datasets/gradslam_datasets/*)."""
import json
import os

import numpy as np
import pytest

from isogs_slam_tpu.datasets import get_dataset, load_dataset_config
from isogs_slam_tpu.slam.config import inject_defaults, load_experiment_config

pytestmark = pytest.mark.smoke  # sub-5-min CI subset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = ["replica/splatam.py", "replica/splatam_s.py",
           "replica/splatam_fast.py", "replica/splatam_fast8.py",
           "replica/splatam_mc.py", "tum/splatam.py",
           "scannet/splatam.py", "scannetpp/splatam.py",
           "replica_v2/splatam.py", "iphone/splatam.py",
           # eval / NVS families (reference configs/*/{*_eval,eval_novel_view}.py)
           "replica/replica_eval.py", "replica/replica_rendering_eval.py",
           "tum/tum_eval.py", "scannet/scannet_eval.py",
           "scannetpp/scannetpp_eval.py", "scannetpp/eval_novel_view.py",
           "replica_v2/eval_novel_view.py", "iphone/gaussian_splatting.py"]

# post-SLAM-optimization / offline-trainer configs carry a `train` dict
# instead of tracking/mapping (reference configs/*/post_splatam_opt.py)
TRAIN_CONFIGS = ["replica/post_splatam_opt.py",
                 "scannetpp/post_splatam_opt.py",
                 "scannetpp/gaussian_splatting.py",
                 "iphone/post_splatam_opt.py",
                 "replica/gaussian_splatting.py"]


@pytest.mark.parametrize("rel", CONFIGS)
def test_config_loads_and_has_reference_schema(rel):
    cfg = load_experiment_config(os.path.join(REPO, "configs", rel))
    cfg = inject_defaults(cfg)
    for key in ("workdir", "run_name", "map_every", "keyframe_every",
                "mapping_window_size", "scene_radius_depth_ratio",
                "data", "tracking", "mapping", "viz"):
        assert key in cfg, key
    for key in ("num_iters", "use_sil_for_loss", "sil_thres", "lrs",
                "loss_weights"):
        assert key in cfg["tracking"], key
    assert "pruning_dict" in cfg["mapping"]
    assert "densify_dict" in cfg["mapping"]
    if rel.endswith(("rendering_eval.py", "eval_novel_view.py")):
        assert cfg["data"]["use_train_split"] is False
        assert "scene_path" in cfg


@pytest.mark.parametrize("rel", TRAIN_CONFIGS)
def test_train_config_loads(rel):
    cfg = load_experiment_config(os.path.join(REPO, "configs", rel))
    for key in ("workdir", "run_name", "data", "train"):
        assert key in cfg, key
    tr = cfg["train"]
    for key in ("num_iters_mapping", "lrs_mapping", "loss_weights"):
        assert key in tr, key


def test_viz_config_loads():
    cfg = load_experiment_config(
        os.path.join(REPO, "configs", "iphone/splatam_viz.py"))
    assert "scene_path" in cfg and "viz" in cfg


def test_dataconfig_yamls_load():
    ddir = os.path.join(REPO, "configs", "data")
    for f in os.listdir(ddir):
        cfg = load_dataset_config(os.path.join(ddir, f))
        cp = cfg["camera_params"]
        assert cp["fx"] != 0 and cp["png_depth_scale"] > 0


def _write_png16(path, arr):
    import imageio.v2 as imageio
    imageio.imwrite(path, arr.astype(np.uint16))


def _write_jpg(path, arr):
    import imageio.v2 as imageio
    imageio.imwrite(path, arr.astype(np.uint8))


def _cam_cfg(h=48, w=64):
    return {"dataset_name": "x", "camera_params": {
        "image_height": h, "image_width": w, "fx": 50.0, "fy": 50.0,
        "cx": w / 2 - 0.5, "cy": h / 2 - 0.5, "png_depth_scale": 1000.0,
        "distortion": None}}


def test_replica_loader(tmp_path):
    seq = tmp_path / "room0" / "results"
    seq.mkdir(parents=True)
    poses = []
    for i in range(4):
        _write_jpg(seq / f"frame{i:06d}.jpg",
                   np.full((48, 64, 3), 10 * i + 5))
        _write_png16(seq / f"depth{i:06d}.png",
                     np.full((48, 64), 2000 + i))
        c2w = np.eye(4)
        c2w[0, 3] = 0.1 * i
        poses.append(c2w)
    with open(tmp_path / "room0" / "traj.txt", "w") as f:
        for p in poses:
            f.write(" ".join(str(x) for x in p.reshape(-1)) + "\n")
    ds = get_dataset(_cam_cfg() | {"dataset_name": "replica"},
                     str(tmp_path), "room0", desired_height=48,
                     desired_width=64)
    assert len(ds) == 4
    color, depth, intr, pose = ds[2]
    assert color.shape == (48, 64, 3) and depth.shape == (48, 64, 1)
    assert abs(float(depth[0, 0, 0]) - 2.002) < 1e-3
    # poses normalized relative to frame 0
    assert abs(pose[0, 3] - 0.2) < 1e-5
    p0 = ds[0][3]
    assert np.allclose(p0, np.eye(4), atol=1e-6)


def test_tum_loader_association(tmp_path):
    seq = tmp_path / "rgbd_dataset_tiny"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], ["# header"]
    for i in range(3):
        t = 100.0 + i
        _write_jpg(seq / "rgb" / f"{t:.1f}.png", np.full((48, 64, 3), 50))
        _write_png16(seq / "depth" / f"{t:.1f}.png",
                     np.full((48, 64), 5000))
        rgb_lines.append(f"{t:.4f} rgb/{t:.1f}.png")
        depth_lines.append(f"{t + 0.01:.4f} depth/{t:.1f}.png")
        gt_lines.append(f"{t + 0.02:.4f} {0.1 * i} 0 0 0 0 0 1")
    (seq / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (seq / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    (seq / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    cfg = _cam_cfg()
    cfg["camera_params"]["png_depth_scale"] = 5000.0
    ds = get_dataset(cfg | {"dataset_name": "tum"}, str(tmp_path),
                     "rgbd_dataset_tiny", desired_height=48,
                     desired_width=64)
    assert len(ds) == 3
    color, depth, intr, pose = ds[1]
    assert abs(float(depth[0, 0, 0]) - 1.0) < 1e-5
    assert abs(pose[0, 3] - 0.1) < 1e-5  # relative to frame 0


def test_scannet_loader(tmp_path):
    seq = tmp_path / "scene0000_00"
    for sub in ("color", "depth", "pose"):
        (seq / sub).mkdir(parents=True)
    for i in range(3):
        _write_jpg(seq / "color" / f"{i}.jpg", np.full((48, 64, 3), 90))
        _write_png16(seq / "depth" / f"{i}.png", np.full((48, 64), 1500))
        c2w = np.eye(4)
        c2w[1, 3] = 0.05 * i
        np.savetxt(seq / "pose" / f"{i}.txt", c2w)
    ds = get_dataset(_cam_cfg() | {"dataset_name": "scannet"},
                     str(tmp_path), "scene0000_00", desired_height=48,
                     desired_width=64)
    assert len(ds) == 3
    _, depth, _, pose = ds[2]
    assert abs(float(depth[0, 0, 0]) - 1.5) < 1e-5
    assert abs(pose[1, 3] - 0.1) < 1e-5


def test_nerfcapture_loader(tmp_path):
    seq = tmp_path / "cap"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    frames = []
    for i in range(3):
        _write_jpg(seq / "rgb" / f"{i}.png", np.full((48, 64, 3), 70))
        _write_png16(seq / "depth" / f"{i}.png", np.full((48, 64), 13107))
        c2w = np.eye(4)
        c2w[2, 3] = 0.02 * i
        frames.append({"file_path": f"rgb/{i}.png",
                       "transform_matrix": c2w.tolist()})
    meta = {"h": 48, "w": 64, "fl_x": 50.0, "fl_y": 50.0, "cx": 31.5,
            "cy": 23.5, "frames": frames}
    (seq / "transforms.json").write_text(json.dumps(meta))
    ds = get_dataset({"dataset_name": "nerfcapture"}, str(tmp_path), "cap",
                     desired_height=48, desired_width=64)
    assert len(ds) == 3
    color, depth, intr, pose = ds[1]
    assert abs(float(depth[0, 0, 0]) - 2.0) < 1e-3
    assert intr[0, 0] == 50.0


def test_icl_loader(tmp_path):
    """ICL-NUIM layout: rgb/*.png + depth/*.png + <seq>.gt.sim (3 rows
    of 4 floats per frame — gradslam_datasets/icl.py)."""
    seq = tmp_path / "living_room_traj0"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    sim_lines = []
    for i in range(3):
        _write_jpg(seq / "rgb" / f"{i:04d}.png", np.full((48, 64, 3), 40))
        _write_png16(seq / "depth" / f"{i:04d}.png", np.full((48, 64), 3000))
        c2w = np.eye(4)
        c2w[0, 3] = 0.2 * i
        for r in range(3):
            sim_lines.append(" ".join(str(x) for x in c2w[r, :4]))
        sim_lines.append("")
    (seq / "livingRoom0.gt.sim").write_text("\n".join(sim_lines) + "\n")
    ds = get_dataset(_cam_cfg() | {"dataset_name": "icl"}, str(tmp_path),
                     "living_room_traj0", desired_height=48,
                     desired_width=64)
    assert len(ds) == 3
    _, depth, _, pose = ds[2]
    assert abs(float(depth[0, 0, 0]) - 3.0) < 1e-5
    assert abs(pose[0, 3] - 0.4) < 1e-5  # relative to frame 0


def test_azure_loader_log_flat_and_absent(tmp_path):
    """Azure Kinect: color/*.jpg + depth/*.png; poses from a .log
    (5 lines/frame), a flat-16-float file, or identity when absent
    (gradslam_datasets/azure.py)."""
    seq = tmp_path / "capture0"
    (seq / "color").mkdir(parents=True)
    (seq / "depth").mkdir()
    log_lines, flat_lines = [], []
    for i in range(3):
        _write_jpg(seq / "color" / f"{i:05d}.jpg", np.full((48, 64, 3), 60))
        _write_png16(seq / "depth" / f"{i:05d}.png", np.full((48, 64), 1000))
        c2w = np.eye(4)
        c2w[2, 3] = 0.1 * i
        log_lines.append(f"{i} {i} {i + 1}")
        log_lines.extend(" ".join(str(x) for x in c2w[r]) for r in range(4))
        flat_lines.append(" ".join(str(x) for x in c2w.reshape(-1)))
    (seq / "odometry.log").write_text("\n".join(log_lines) + "\n")
    (seq / "poses_flat.txt").write_text("\n".join(flat_lines) + "\n")
    cfg = _cam_cfg() | {"dataset_name": "azure"}
    for odom in ("odometry.log", "poses_flat.txt"):
        ds = get_dataset(cfg, str(tmp_path), "capture0", odomfile=odom,
                         desired_height=48, desired_width=64)
        assert len(ds) == 3
        _, depth, _, pose = ds[1]
        assert abs(float(depth[0, 0, 0]) - 1.0) < 1e-5
        assert abs(pose[2, 3] - 0.1) < 1e-5, odom
    # reference behavior: identity poses + warning when no odom file
    ds = get_dataset(cfg, str(tmp_path), "capture0", desired_height=48,
                     desired_width=64)
    assert np.allclose(ds[2][3], np.eye(4), atol=1e-6)


def _npy_pose_seq(seq, n, rgb_ext):
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    (seq / "poses").mkdir()
    for i in range(n):
        _write_jpg(seq / "rgb" / f"{i}{rgb_ext}", np.full((48, 64, 3), 30))
        _write_png16(seq / "depth" / f"{i}.png", np.full((48, 64), 2500))
        c2w = np.eye(4)
        c2w[1, 3] = 0.3 * i   # y-translation: sign-flipped by P_FLIP
        np.save(seq / "poses" / f"{i}.npy", c2w)


@pytest.mark.parametrize("name,rgb_ext", [("record3d", ".png"),
                                          ("realsense", ".jpg")])
def test_record3d_realsense_loaders(tmp_path, name, rgb_ext):
    """Record3D/RealSense layout: rgb + depth + per-frame .npy c2w poses
    conjugated by P=diag(1,-1,-1,1) (ARKit -> OpenCV convention,
    gradslam_datasets/{record3d,realsense}.py)."""
    seq = tmp_path / "stream0"
    _npy_pose_seq(seq, 3, rgb_ext)
    ds = get_dataset(_cam_cfg() | {"dataset_name": name}, str(tmp_path),
                     "stream0", desired_height=48, desired_width=64)
    assert len(ds) == 3
    _, depth, _, pose = ds[2]
    assert abs(float(depth[0, 0, 0]) - 2.5) < 1e-5
    # P c2w P^T flips the y-translation sign; normalization vs the
    # identity frame 0 preserves it
    assert abs(pose[1, 3] - (-0.6)) < 1e-5


def test_ai2thor_loader(tmp_path):
    """AI2Thor layout: color/*.png (not .jpg), depth/*.png, pose/*.txt
    (gradslam_datasets/ai2thor.py)."""
    seq = tmp_path / "floorplan"
    for sub in ("color", "depth", "pose"):
        (seq / sub).mkdir(parents=True)
    for i in range(3):
        _write_jpg(seq / "color" / f"{i}.png", np.full((48, 64, 3), 80))
        _write_png16(seq / "depth" / f"{i}.png", np.full((48, 64), 4000))
        c2w = np.eye(4)
        c2w[0, 3] = 0.25 * i
        np.savetxt(seq / "pose" / f"{i}.txt", c2w)
    ds = get_dataset(_cam_cfg() | {"dataset_name": "ai2thor"},
                     str(tmp_path), "floorplan", desired_height=48,
                     desired_width=64)
    assert len(ds) == 3
    _, depth, _, pose = ds[1]
    assert abs(float(depth[0, 0, 0]) - 4.0) < 1e-5
    assert abs(pose[0, 3] - 0.25) < 1e-5


def _replicav2_split(root, split, n, t0):
    base = root / "apartment" / "imap" / split
    (base / "rgb").mkdir(parents=True)
    (base / "depth").mkdir()
    lines = []
    for i in range(n):
        _write_jpg(base / "rgb" / f"rgb_{i}.png", np.full((48, 64, 3), 20))
        _write_png16(base / "depth" / f"depth_{i}.png",
                     np.full((48, 64), 1500))
        c2w = np.eye(4)
        c2w[0, 3] = t0 + 0.1 * i
        lines.append(" ".join(str(x) for x in c2w.reshape(-1)))
    (base / "traj_w_c.txt").write_text("\n".join(lines) + "\n")


def test_replicav2_loader_train_and_nvs(tmp_path):
    """ReplicaV2: imap/00 train split; imap/01 NVS split prepends the
    FIRST train frame (gradslam_datasets/replica.py:69-148)."""
    _replicav2_split(tmp_path, "00", 3, 0.0)
    _replicav2_split(tmp_path, "01", 2, 5.0)
    cfg = _cam_cfg() | {"dataset_name": "replicav2"}
    ds = get_dataset(cfg, str(tmp_path), "apartment", use_train_split=True,
                     desired_height=48, desired_width=64)
    assert len(ds) == 3
    _, depth, _, pose = ds[1]
    assert abs(float(depth[0, 0, 0]) - 1.5) < 1e-5
    assert abs(pose[0, 3] - 0.1) < 1e-5
    # NVS split: first train frame + imap/01 frames, poses normalized to
    # the prepended train frame (identity at index 0)
    ds_nvs = get_dataset(cfg, str(tmp_path), "apartment",
                         use_train_split=False, desired_height=48,
                         desired_width=64)
    assert len(ds_nvs) == 3   # 1 train + 2 test
    assert np.allclose(ds_nvs[0][3], np.eye(4), atol=1e-6)
    assert abs(ds_nvs[1][3][0, 3] - 5.0) < 1e-5


def test_scannetpp_loader_train_and_test(tmp_path):
    """ScanNet++ DSLR: train_test_lists.json split +
    transforms_undistorted.json metadata, undistorted images/depths,
    P-conjugated poses; NVS mode prepends the first train frame
    (gradslam_datasets/scannetpp.py:18-141)."""
    base = tmp_path / "scene_ab1" / "dslr"
    (base / "undistorted_images").mkdir(parents=True)
    (base / "undistorted_depths").mkdir()
    (base / "nerfstudio").mkdir()
    names = [f"DSC{i:05d}.JPG" for i in range(4)]
    frames, test_frames = [], []
    for i, n in enumerate(names):
        _write_jpg(base / "undistorted_images" / n,
                   np.full((48, 64, 3), 100))
        _write_png16(base / "undistorted_depths" / n.replace(".JPG", ".png"),
                     np.full((48, 64), 2000))
        c2w = np.eye(4)
        c2w[0, 3] = 0.1 * i
        entry = {"file_path": n, "transform_matrix": c2w.tolist()}
        (frames if i < 3 else test_frames).append(entry)
    meta = {"h": 48, "w": 64, "fl_x": 50.0, "fl_y": 50.0, "cx": 31.5,
            "cy": 23.5, "frames": frames, "test_frames": test_frames}
    (base / "nerfstudio" / "transforms_undistorted.json").write_text(
        json.dumps(meta))
    (base / "train_test_lists.json").write_text(
        json.dumps({"train": names[:3], "test": names[3:]}))
    ds = get_dataset({"dataset_name": "scannetpp"}, str(tmp_path),
                     "scene_ab1", use_train_split=True, desired_height=48,
                     desired_width=64)
    assert len(ds) == 3
    _, depth, intr, pose = ds[1]
    assert abs(float(depth[0, 0, 0]) - 2.0) < 1e-3
    assert intr[0, 0] == 50.0
    assert abs(pose[0, 3] - 0.1) < 1e-5
    # NVS: first train frame prepended to the 1-frame test split
    ds_nvs = get_dataset({"dataset_name": "scannetpp"}, str(tmp_path),
                         "scene_ab1", use_train_split=False,
                         desired_height=48, desired_width=64)
    assert len(ds_nvs) == 2
    assert np.allclose(ds_nvs[0][3], np.eye(4), atol=1e-6)
    assert abs(ds_nvs[1][3][0, 3] - 0.3) < 1e-5


def test_multichip_config_carries_parallel_views():
    cfg = load_experiment_config(
        os.path.join(REPO, "configs", "replica/splatam_mc.py"))
    assert int(cfg["parallel"]["map_views"]) >= 2
