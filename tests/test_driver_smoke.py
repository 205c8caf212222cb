"""Real-data-format smoke tests: fabricate each experiment's exact on-disk
dataset layout (with synthetic geometry) and run the real driver main() —
argparse -> dataset walk -> precompute -> fit -> eval — for 1 epoch.

Layouts mirror the reference loaders:
  SHREC11      reference shrec11_dataset.py:40-147 (categories.txt + raw/T*.off;
               raw/shrec_16/{class}/{train,test}/*.obj)
  human seg    reference human_segmentation_original_dataset.py:55-110
  RNA          reference rna_mesh_dataset.py:41-60
  fmaps        reference faust_scape_dataset.py:70-90 (off_2/ + corres/*.vts)
  sampling inv reference faust_with_robust_test_dataset.py:60-138
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
EXP = os.path.join(REPO, "experiments")

from tests.meshgen import icosphere  # noqa: E402

sys.path.insert(0, REPO)
from diffusionnet_tpu.geometry.io import write_off, write_obj, write_ply  # noqa: E402


def run_driver(suite, script, argv):
    """Import the driver module from its suite directory and run main(argv)."""
    suite_dir = os.path.join(EXP, suite)
    for p in (suite_dir, EXP):
        if p not in sys.path:
            sys.path.insert(0, p)
    spec = importlib.util.spec_from_file_location(
        f"driver_{suite}", os.path.join(suite_dir, script))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old_argv = sys.argv
    sys.argv = [script] + argv
    try:
        mod.main()
    finally:
        sys.argv = old_argv


def small_mesh(seed=0, subdivisions=1):
    """Icosphere (42 verts @ sub1) with a small per-seed jitter so shapes are
    distinct (exercising per-shape precompute + caching)."""
    verts, faces = icosphere(subdivisions=subdivisions)
    rng = np.random.RandomState(seed)
    verts = verts + 0.01 * rng.randn(*verts.shape)
    return verts, faces


def test_shrec11_simplified_driver(tmp_path):
    # raw/shrec_16/{class}/{train,test}/T{i}.obj — MeshCNN layout
    root = tmp_path / "shrec11"
    class_names = [
        'alien', 'ants', 'armadillo', 'bird1', 'bird2', 'camel', 'cat',
        'centaur', 'dinosaur', 'dino_ske', 'dog1', 'dog2', 'flamingo',
        'glasses', 'gorilla', 'hand', 'horse', 'lamp', 'laptop', 'man',
        'myScissor', 'octopus', 'pliers', 'rabbit', 'santa', 'shark', 'snake',
        'spiders', 'two_balls', 'woman']
    seed = 0
    for cname in class_names:
        for t, n in [("train", 1), ("test", 1)]:
            d = root / "raw" / "shrec_16" / cname / t
            d.mkdir(parents=True)
            for i in range(n):
                verts, faces = small_mesh(seed)
                seed += 1
                write_obj(str(d / f"T{i}.obj"), verts, faces)

    run_driver("classification_shrec11", "classification_shrec11.py",
               ["--dataset_type", "simplified", "--split_size", "1",
                "--n_epoch", "1", "--batch_size", "8", "--k_eig", "8",
                "--data_dir", str(root)])

    # --megakernel --bf16: the whole-block Pallas fast path through the real
    # driver (interpret mode on CPU — same kernel code, executed by XLA:CPU);
    # the op cache from the run above keeps precompute free
    run_driver("classification_shrec11", "classification_shrec11.py",
               ["--dataset_type", "simplified", "--split_size", "1",
                "--n_epoch", "1", "--batch_size", "8", "--k_eig", "8",
                "--megakernel", "--bf16", "--data_dir", str(root)])


def test_shrec11_original_categories_txt(tmp_path):
    # categories.txt (NIST format: 2 header lines, then per class a blank-ish
    # line, a "name <tab> count" line, and 20 mesh ids) + raw/T{id}.off
    root = tmp_path / "shrec11_orig"
    (root / "raw").mkdir(parents=True)
    lines = ["SHREC 2011 categories", ""]
    mesh_id = 0
    for c in range(30):
        lines.append("")
        lines.append(f"class{c:02d} - 20")
        for _ in range(20):
            lines.append(str(mesh_id))
            mesh_id += 1
    (root / "categories.txt").write_text("\n".join(lines) + "\n")
    verts, faces = small_mesh(0)
    for i in range(mesh_id):  # identical geometry -> operator cache exercised
        write_off(str(root / "raw" / f"T{i}.off"), verts, faces)

    suite_dir = os.path.join(EXP, "classification_shrec11")
    if suite_dir not in sys.path:
        sys.path.insert(0, suite_dir)
    from shrec11_dataset import Shrec11MeshDataset_Original
    train = Shrec11MeshDataset_Original(str(root), split_size=2, k_eig=8,
                                        op_cache_dir=str(root / "op_cache"))
    test = Shrec11MeshDataset_Original(str(root), split_size=None, k_eig=8,
                                       op_cache_dir=str(root / "op_cache"),
                                       exclude_dict=train.entries)
    assert len(train) == 60 and len(test) == 540
    assert len(train.class_names) == 30
    # splits disjoint per class
    for cname, chosen in train.entries.items():
        assert not (chosen & test.entries[cname])


def test_human_segmentation_driver(tmp_path):
    root = tmp_path / "sig17_seg_benchmark"
    seed = 0

    def put(mesh_dir, mesh_name, label_path):
        nonlocal seed
        verts, faces = small_mesh(seed)
        seed += 1
        mesh_dir.mkdir(parents=True, exist_ok=True)
        write_off(str(mesh_dir / mesh_name), verts, faces)
        if label_path is not None:
            label_path.parent.mkdir(parents=True, exist_ok=True)
            rng = np.random.RandomState(seed)
            np.savetxt(str(label_path),
                       rng.randint(1, 9, size=len(faces)), fmt="%d")

    # train: adobe (per-mesh labels), faust/scape (shared label file), MIT poses
    put(root / "meshes" / "train" / "adobe", "a0.off",
        root / "segs" / "train" / "adobe" / "a0.txt")
    put(root / "meshes" / "train" / "faust", "f0.off",
        root / "segs" / "train" / "faust" / "faust_corrected.txt")
    put(root / "meshes" / "train" / "scape", "s0.off",
        root / "segs" / "train" / "scape" / "scape_corrected.txt")
    for pose in ['bouncing', 'handstand', 'march1', 'squat1',
                 'crane', 'jumping', 'march2', 'squat2']:
        put(root / "meshes" / "train" / "MIT_animation" / f"meshes_{pose}"
            / "meshes", "mesh_0.off",
            root / "segs" / "train" / "mit" / f"mit_{pose}_corrected.txt")
    # test: shrec 1..20 minus 16,18; 12 has the fix_orientation filename
    for i in range(1, 21):
        if i in (16, 18):
            continue
        name = "12_fix_orientation.off" if i == 12 else f"{i}.off"
        put(root / "meshes" / "test" / "shrec", name,
            root / "segs" / "test" / "shrec" / f"shrec_{i}_full.txt")

    run_driver("human_segmentation_original", "human_segmentation_original.py",
               ["--n_epoch", "1", "--batch_size", "4", "--k_eig", "8",
                "--data_dir", str(root)])


def test_rna_segmentation_driver(tmp_path):
    root = tmp_path / "rna"
    (root / "off").mkdir(parents=True)
    (root / "labels").mkdir()
    names = [f"rna_{i}.off" for i in range(3)]
    for i, name in enumerate(names):
        verts, faces = small_mesh(i)
        write_off(str(root / "off" / name), verts, faces)
        rng = np.random.RandomState(100 + i)
        # reference labels are in {-1, 0, .., 258}; loader shifts +1
        np.savetxt(str(root / "labels" / name[:-4]) + ".txt",
                   rng.randint(-1, 259, size=len(verts)), fmt="%d")
    (root / "train.txt").write_text("\n".join(names[:2]) + "\n")
    (root / "test.txt").write_text(names[2] + "\n")

    run_driver("rna_mesh_segmentation", "rna_mesh_segmentation.py",
               ["--n_epoch", "1", "--batch_size", "2", "--k_eig", "8",
                "--data_dir", str(root)])


def test_rna_segmentation_driver_two_axis_mesh(tmp_path):
    """--mesh DATA,VERT end-to-end: argparse -> FitConfig.mesh_shape ->
    make_two_axis_train_step (megakernel per V shard, (K,C) psum per block).
    The 2-device vert axis splits the 256-bucket into 128-row shards."""
    root = tmp_path / "rna"
    (root / "off").mkdir(parents=True)
    (root / "labels").mkdir()
    names = [f"rna_{i}.off" for i in range(3)]
    for i, name in enumerate(names):
        verts, faces = small_mesh(i)
        write_off(str(root / "off" / name), verts, faces)
        rng = np.random.RandomState(100 + i)
        np.savetxt(str(root / "labels" / name[:-4]) + ".txt",
                   rng.randint(-1, 259, size=len(verts)), fmt="%d")
    (root / "train.txt").write_text("\n".join(names[:2]) + "\n")
    (root / "test.txt").write_text(names[2] + "\n")

    run_driver("rna_mesh_segmentation", "rna_mesh_segmentation.py",
               ["--n_epoch", "1", "--batch_size", "2", "--k_eig", "8",
                "--megakernel", "--mesh", "1,2", "--buckets", "256",
                "--data_dir", str(root)])


def test_functional_correspondence_driver(tmp_path):
    root = tmp_path / "fmaps"
    off_dir = root / "faust" / "off_2"
    vts_dir = root / "faust" / "corres"
    off_dir.mkdir(parents=True)
    vts_dir.mkdir(parents=True)
    n_shapes = 5  # 3 train + 2 test
    for i in range(n_shapes):
        verts, faces = small_mesh(i)
        write_off(str(off_dir / f"tr_reg_{i:03d}.off"), verts, faces)
        rng = np.random.RandomState(200 + i)
        vts = rng.permutation(len(verts))[:30] + 1  # 1-based template samples
        np.savetxt(str(vts_dir / f"tr_reg_{i:03d}.vts"), vts, fmt="%d")

    # --device_data: all padded shapes live in HBM, pairs gathered on-device
    run_driver("functional_correspondence", "functional_correspondence.py",
               ["--train_dataset", "faust", "--test_dataset", "faust",
                "--n_epoch", "1", "--k_eig", "16", "--n_fmap", "8",
                "--n_feat", "16", "--n_train", "3", "--n_test", "2",
                "--device_data", "--data_dir", str(root)])

    # the run above wrote a full-train-state checkpoint + a JSONL log;
    # --resume_from continues from it (epoch 1 of 2) through the same path
    import json
    ckpt_dir = str(root / "saved_models" / "faust_hks_ckpt")
    log = root / "saved_models" / "faust_hks_log.jsonl"
    assert log.exists()
    rec = json.loads(log.read_text().splitlines()[0])
    assert rec["epoch"] == 0 and "test_geodesic_error" in rec
    run_driver("functional_correspondence", "functional_correspondence.py",
               ["--train_dataset", "faust", "--test_dataset", "faust",
                "--n_epoch", "2", "--k_eig", "16", "--n_fmap", "8",
                "--n_feat", "16", "--n_train", "3", "--n_test", "2",
                "--resume_from", ckpt_dir, "--data_dir", str(root)])
    recs = [json.loads(l) for l in log.read_text().splitlines()]
    assert [r["epoch"] for r in recs] == [0, 1]  # resumed at epoch 1


def test_sampling_invariance_driver(tmp_path):
    root = tmp_path / "faust_robust"
    reg_dir = root / "train" / "MPI-FAUST" / "training" / "registrations"
    reg_dir.mkdir(parents=True)
    n_train, n_test = 2, 1
    for i in range(n_train + n_test):  # test 'orig' split also reads these
        verts, faces = small_mesh(i)
        write_ply(str(reg_dir / f"tr_reg_{i:03d}.ply"), verts, faces)

    test_idx = n_train  # meshes [n_train, n_train+n_test)
    verts, faces = small_mesh(test_idx)
    for method in ["iso", "qes", "mc", "dense", "cloud"]:
        d = root / "test" / "data" / method
        d.mkdir(parents=True)
        name = f"tr_reg_{method}_{test_idx:03d}"
        if method == "cloud":
            normals = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
            write_ply(str(d / (name + ".ply")), verts, None, normals=normals)
        else:
            write_ply(str(d / (name + ".ply")), verts, faces)
        np.savetxt(str(d / (name + ".txt")),
                   np.arange(len(verts)), fmt="%d")

    run_driver("sampling_invariance", "sampling_invariance.py",
               ["--n_epoch", "1", "--batch_size", "2", "--k_eig", "8",
                "--n_train", str(n_train), "--n_test", str(n_test),
                "--data_dir", str(root)])

    # --evaluate: loads the checkpoint the train run wrote; the template
    # mesh is read directly (no train-set precompute in evaluate mode)
    from diffusionnet_tpu.training.checkpoint import latest_checkpoint
    ck = latest_checkpoint(str(root / "saved_models"
                               / "categorical_correspondence_xyz_4x256_ckpt"))
    assert ck is not None
    run_driver("sampling_invariance", "sampling_invariance.py",
               ["--evaluate", "--load_model", ck,
                "--batch_size", "2", "--k_eig", "8",
                "--n_train", str(n_train), "--n_test", str(n_test),
                "--data_dir", str(root)])


def test_functional_correspondence_evaluate_pretrained(tmp_path):
    """--evaluate auto-loads the converted reference checkpoint and runs the
    eval path (fmap loss + exact-geodesic error) end-to-end."""
    npz = os.path.join(EXP, "functional_correspondence", "pretrained_models",
                       "faust_hks.npz")
    if not os.path.exists(npz):
        pytest.skip("converted checkpoint unavailable")
    root = tmp_path / "fmaps"
    off_dir = root / "faust" / "off_2"
    vts_dir = root / "faust" / "corres"
    off_dir.mkdir(parents=True)
    vts_dir.mkdir(parents=True)
    for i in range(5):  # 3 "train" + 2 held-out (only the 2 are evaluated)
        verts, faces = small_mesh(i, subdivisions=3)  # 642 verts >= k_eig
        write_off(str(off_dir / f"tr_reg_{i:03d}.off"), verts, faces)
        rng = np.random.RandomState(300 + i)
        np.savetxt(str(vts_dir / f"tr_reg_{i:03d}.vts"),
                   rng.permutation(len(verts))[:40] + 1, fmt="%d")

    run_driver("functional_correspondence", "functional_correspondence.py",
               ["--evaluate", "--test_dataset", "faust",
                "--k_eig", "128", "--n_fmap", "30", "--n_feat", "128",
                "--n_train", "3", "--n_test", "2", "--data_dir", str(root)])
