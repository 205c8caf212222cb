"""Real-data readiness kit: direct .pth checkpoint loading and the
prepare_data helpers (VERDICT r03 item 8).

- load_reference_checkpoint must consume the reference's ORIGINAL torch
  .pth checkpoints directly and produce exactly the tree the offline
  converter produces (so drivers can be pointed at either file).
- dataget helpers: structural integrity (zip CRC test), layout
  verification, and the no-egress exit-0 contract the prepare_data
  scripts rely on.
"""

import os
import sys
import zipfile

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "experiments", "tools")
if TOOLS not in sys.path:
    sys.path.insert(0, TOOLS)

REF_EXP = "/root/reference/experiments"


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: keys {set(a)} != {set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], path + "/" + k)
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=path + "/" + k)


@pytest.mark.parametrize("suite,name,fmaps", [
    ("human_segmentation_original", "human_seg_hks_4x128", False),
    ("functional_correspondence", "faust_xyz", True),
])
def test_pth_direct_load_matches_converted(suite, name, fmaps):
    pytest.importorskip("torch")
    from convert_torch_checkpoint import (load_converted,
                                          load_reference_checkpoint)
    pth = os.path.join(REF_EXP, suite, "pretrained_models", name + ".pth")
    npz = os.path.join(os.path.dirname(__file__), "..", "experiments", suite,
                       "pretrained_models", name + ".npz")
    if not os.path.exists(pth):
        pytest.skip("reference checkpoint not available")
    direct = load_reference_checkpoint(pth, fmaps=fmaps)
    converted = load_converted(npz)
    _tree_equal(direct, converted)


def test_pth_load_infers_n_block():
    torch = pytest.importorskip("torch")
    from convert_torch_checkpoint import load_reference_checkpoint
    # minimal 2-block reference-shaped state_dict
    sd = {"first_lin.weight": torch.randn(8, 3),
          "first_lin.bias": torch.randn(8),
          "last_lin.weight": torch.randn(4, 8),
          "last_lin.bias": torch.randn(4)}
    for b in range(2):
        sd[f"block_{b}.diffusion.diffusion_time"] = torch.rand(8)
        sd[f"block_{b}.gradient_features.A_re.weight"] = torch.randn(8, 8)
        sd[f"block_{b}.gradient_features.A_im.weight"] = torch.randn(8, 8)
        sd[f"block_{b}.mlp.0.weight"] = torch.randn(8, 24)
        sd[f"block_{b}.mlp.0.bias"] = torch.randn(8)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pth")
        torch.save(sd, path)
        out = load_reference_checkpoint(path)
    p = out["params"]
    assert set(p) == {"first_lin", "last_lin", "block_0", "block_1"}
    # torch Linear (out,in) -> flax kernel (in,out)
    np.testing.assert_allclose(p["first_lin"]["kernel"],
                               sd["first_lin.weight"].numpy().T)


def test_dataget_zip_roundtrip_and_layout(tmp_path):
    from dataget import check_layout, extract_zip
    src = tmp_path / "archive.zip"
    with zipfile.ZipFile(src, "w") as z:
        for i in range(3):
            z.writestr(f"raw/T{i}.off", f"OFF\n0 0 0\n# {i}\n")
    out = tmp_path / "out"
    extract_zip(str(src), str(out))
    assert sorted(os.listdir(out / "raw")) == ["T0.off", "T1.off", "T2.off"]
    check_layout(str(out), {"raw/*.off": 3})  # passes
    with pytest.raises(SystemExit) as e:
        check_layout(str(out), {"raw/*.off": 5})
    assert e.value.code == 1


def test_dataget_no_egress_exits_zero(tmp_path, monkeypatch):
    import urllib.request
    from dataget import NoEgress, fetch

    def refuse(*a, **k):
        raise OSError("Name or service not known")

    monkeypatch.setattr(urllib.request, "urlopen", refuse)
    with pytest.raises(NoEgress) as e:
        fetch("https://example.invalid/file.zip", str(tmp_path / "f.zip"))
    assert e.value.code == 0
    assert not (tmp_path / "f.zip.part").exists()


def test_prepare_data_scripts_parse_and_document():
    """Every suite ships a prepare_data.py with a module docstring citing
    its reference README anchor."""
    import ast
    exp = os.path.join(os.path.dirname(__file__), "..", "experiments")
    suites = ["classification_shrec11", "functional_correspondence",
              "human_segmentation_original", "rna_mesh_segmentation",
              "sampling_invariance"]
    for s in suites:
        path = os.path.join(exp, s, "prepare_data.py")
        assert os.path.exists(path), f"{s} missing prepare_data.py"
        tree = ast.parse(open(path).read())
        doc = ast.get_docstring(tree) or ""
        assert "README" in doc, f"{s}/prepare_data.py lacks README citation"
