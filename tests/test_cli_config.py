"""CLI/config layer tests (SURVEY layer 5; ref train.py:44-135,
utils/YParams.py:84-116, utils/argument_parser.py:25-155).

Pins the three-layer config system: YAML recipes with &BASE_CONFIG anchor
inheritance, dataset-metadata merge, and argparse CLI overrides — plus the
reference flag-name surface and the resume auto-detection."""

import os

import pytest

from makani_tpu.train import build_params, get_parser
from makani_tpu.utils.yparams import YParams

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_yaml_anchor_inheritance(tmp_path):
    yaml = tmp_path / "cfg.yaml"
    yaml.write_text(
        """
base: &BASE
  embed_dim: 32
  num_layers: 4
  lr: 1.0e-3
  channel_names: [u10m, v10m]

child:
  <<: *BASE
  num_layers: 8

grandchild:
  <<: *BASE
  lr: 5.0e-4
"""
    )
    base = YParams(str(yaml), "base")
    child = YParams(str(yaml), "child")
    grand = YParams(str(yaml), "grandchild")
    assert base["num_layers"] == 4 and child["num_layers"] == 8
    assert child["embed_dim"] == 32  # inherited
    assert grand["lr"] == pytest.approx(5e-4) and child["lr"] == pytest.approx(1e-3)
    # scientific-notation strings must coerce to floats (ruamel quirk the
    # reference guards too)
    assert isinstance(child["lr"], float)


@pytest.mark.parametrize(
    "flag",
    [
        "--yaml_config",
        "--config",
        "--run_num",
        "--batch_size",
        "--max_epochs",
        "--h_parallel_size",
        "--w_parallel_size",
        "--parameters_split_size",
        "--ensemble_parallel_size",
        "--amp_mode",
        "--enable_synthetic_data",
        "--multistep_count",
        "--save_checkpoint",
    ],
)
def test_reference_flag_names_kept(flag):
    """The reference's CLI flag surface (argument_parser.py:25-155) survives."""
    parser = get_parser()
    opts = {o for a in parser._actions for o in a.option_strings}
    assert flag in opts


def test_cli_overrides_yaml(tmp_path):
    args = get_parser().parse_args(
        [
            "--yaml_config", os.path.join(ROOT, "config", "debug.yaml"),
            "--config", "debug_sfno",
            "--batch_size", "5",
            "--max_epochs", "7",
            "--multistep_count", "3",
            "--h_parallel_size", "2",
            "--enable_synthetic_data",
            "--run_num", "t0",
        ]
    )
    # keep experiment dirs inside tmp
    params = build_params(args)
    assert params["batch_size"] == 5
    assert params["max_epochs"] == 7
    assert params["n_future"] == 2  # multistep_count - 1
    assert params["h_parallel_size"] == 2
    assert params["enable_synthetic_data"] is True
    # YAML values not overridden survive
    assert params.get("nettype") is not None


def test_resume_autodetect(tmp_path):
    """resuming flips once a checkpoint exists (ref train.py:107-114)."""
    yaml = tmp_path / "cfg.yaml"
    yaml.write_text(
        """
tiny:
  nettype: SFNO
  embed_dim: 8
  num_layers: 2
  channel_names: [a, b]
  exp_dir: %s
""" % str(tmp_path / "runs")
    )
    argv = ["--yaml_config", str(yaml), "--config", "tiny", "--run_num", "r1"]
    params = build_params(get_parser().parse_args(argv))
    assert params["resuming"] is False

    # drop a flexible checkpoint marker the helper recognizes
    from makani_tpu.utils.checkpoint_helpers import get_latest_checkpoint_version

    ckpt_dir = params["checkpoint_dir"]
    os.makedirs(os.path.join(ckpt_dir, "ckpt_v0"), exist_ok=True)
    assert get_latest_checkpoint_version(ckpt_dir) is not None
    params2 = build_params(get_parser().parse_args(argv))
    assert params2["resuming"] is True


def test_config_families_parse():
    """Every shipped YAML family parses and exposes a nettype per config
    (the reference's recipe surface, config/*.yaml)."""
    import yaml as pyyaml

    for fam in ("debug", "sfnonet", "afnonet", "vit", "pangu", "fourcastnet3"):
        path = os.path.join(ROOT, "config", f"{fam}.yaml")
        with open(path) as f:
            doc = pyyaml.safe_load(f)
        assert isinstance(doc, dict) and doc
        named = [k for k, v in doc.items() if isinstance(v, dict) and "nettype" in v]
        assert named, f"{fam}.yaml has no named configs with nettype"
