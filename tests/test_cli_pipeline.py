"""End-to-end CLI pipeline test: the actual product entry points.

Shells `python -m hosnerf_tpu.cli.run` through the reference's full
command sequence on the fabricated mini-dataset (VERDICT r3 missing #1):

  stage scene  train -> ckpt + cameras_scaleworld.pkl (stage-3 handoff)
  stage scene  eval  -> results.json (+ provenance entry) + image dump
  stage scene  render -> camera-path mp4
  stage human  train -> ckpt
  stage human  eval  -> results.json + testimgs/allimgs/freeview/tpose
  stage hosnerf train --bkgd_path/--human_path (two-ckpt warm start)
  stage hosnerf train --resume_training True (LR/Adam state resume)
  stage hosnerf eval

The reference contract being exercised: 1st.../run.py:197-236,
3rd.../run.py:205-238, README.md:79-117 (per-stage commands + handoff).
Children run single-device CPU (the 8-way sharded step is certified by
tests/test_smpl_samplers + the driver dryrun) with the repo compile cache.
"""

import json
import os
import pickle
import subprocess
import sys

import pytest

from hosnerf_tpu.data import synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCENE_GIN = """
run.datadir = "{parent}"
run.max_steps = 6
run.log_every_n_steps = 2
LitData.batch_size = 128
LitDataNeRF360V2.factor = 1
LitDataNeRF360V2.near = 0.2
LitDataNeRF360V2.far = 30.0
NeRFMLP.netwidth = 32
PropMLP.netwidth = 16
MipNeRF360.num_prop_samples = 8
MipNeRF360.num_nerf_samples = 4
MipNeRF360.compute_dtype = "f32"
"""

HUMAN_YAML = """
basedir: "{mini}"
N_samples: 8
compute_dtype: f32
canonical_mlp:
  mlp_width: 32
non_rigid_motion_mlp:
  mlp_width: 16
mweight_volume:
  volume_size: 8
patch:
  N_patches: 2
  size: 8
train:
  maxiter: 6
progress:
  dump_interval: 100000
freeview:
  frame_idx: 1
render:
  tpose_resolution: 24
  freeview_frames: 2
  tpose_views: 2
"""


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_e2e")
    mini = root / "mini"
    mini.mkdir()
    synthetic.write_mini_dataset(str(mini), n_frames=10, res=32)
    (root / "mini.gin").write_text(SCENE_GIN.format(parent=str(root)))
    (root / "mini.yaml").write_text(HUMAN_YAML.format(mini=str(mini)))
    child_env = dict(os.environ)
    child_env.update({
        "JAX_PLATFORMS": "cpu",
        "HOSNERF_PLATFORM": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, ".jax_cache"),
    })
    return {"root": root, "mini": mini, "env": child_env}


def _run(env, *args):
    cmd = [sys.executable, "-m", "hosnerf_tpu.cli.run"] + list(args)
    proc = subprocess.run(cmd, env=env["env"], cwd=REPO,
                          capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, (
        f"CLI failed: {' '.join(args)}\n--- stdout ---\n"
        f"{proc.stdout[-3000:]}\n--- stderr ---\n{proc.stderr[-3000:]}")
    return proc


def test_cli_full_pipeline(env):
    root, mini = env["root"], env["mini"]
    logbase = str(root / "logs")
    scene_args = ["--stage", "scene", "--ginc", str(root / "mini.gin"),
                  "--scene_name", "mini", "--logbase", logbase]
    human_args = ["--stage", "human", "--cfg", str(root / "mini.yaml"),
                  "--scene_name", "mini", "--logbase", logbase]
    hos_args = ["--stage", "hosnerf", "--ginc", str(root / "mini.gin"),
                "--cfg", str(root / "mini.yaml"),
                "--scene_name", "mini", "--logbase", logbase]

    # ---- stage 1: train ----
    assert not (mini / "cameras_scaleworld.pkl").exists()
    _run(env, *scene_args, "--run_mode", "train")
    scene_log = os.path.join(logbase, "scene_mini")
    assert os.path.isdir(os.path.join(scene_log, "ckpt", "last"))
    assert os.path.isfile(os.path.join(scene_log, "config.gin"))
    # the stage-1 -> stage-3 file handoff (SURVEY §3.5)
    with open(mini / "cameras_scaleworld.pkl", "rb") as f:
        sw = pickle.load(f)
    assert "smpl_to_scale_world" in next(iter(sw.values()))

    # ---- stage 1: eval + render ----
    _run(env, *scene_args, "--run_mode", "eval")
    with open(os.path.join(scene_log, "results.json")) as f:
        res = json.load(f)
    assert isinstance(res, list) and len(res) >= 3
    assert set(res[0]) == {"train", "val", "test"}  # psnr by split
    assert any("lpips_backbone" in e for e in res[3:])
    assert os.path.isdir(os.path.join(scene_log, "render_model"))
    _run(env, *scene_args, "--run_mode", "render")
    vids = [f for f in os.listdir(os.path.join(scene_log, "render_video"))
            if f.endswith(".mp4")]
    assert vids

    # ---- stage 2: train + eval ----
    _run(env, *human_args, "--run_mode", "train")
    human_log = os.path.join(logbase, "human_mini")
    assert os.path.isdir(os.path.join(human_log, "ckpt", "last"))
    _run(env, *human_args, "--run_mode", "eval")
    with open(os.path.join(human_log, "results.json")) as f:
        hres = json.load(f)
    assert isinstance(hres, list) and len(hres) == 2  # testimgs, allimgs
    assert all("psnr" in e for e in hres)
    for tag in ("testimgs_vis", "allimgs_vis", "freeview", "tpose_vis"):
        hits = [d for d in os.listdir(human_log) if d.startswith(tag)]
        assert hits, f"missing {tag} artifacts"

    # ---- stage 3: two-checkpoint warm start, train ----
    _run(env, *hos_args, "--run_mode", "train",
         "--bkgd_path", os.path.join(scene_log, "ckpt", "last"),
         "--human_path", os.path.join(human_log, "ckpt", "last"))
    hos_log = os.path.join(logbase, "hosnerf_mini")
    assert os.path.isdir(os.path.join(hos_log, "ckpt", "last"))

    # ---- stage 3: resume (LR schedule + Adam moments continue) ----
    _run(env, *hos_args, "--run_mode", "train", "--max_steps", "9",
         "--resume_training", "True")

    # ---- stage 3: eval (composed render sweep) ----
    _run(env, *hos_args, "--run_mode", "eval")
    with open(os.path.join(hos_log, "results.json")) as f:
        cres = json.load(f)
    assert isinstance(cres, list) and len(cres) == 2
    assert all("psnr" in e and e["psnr"] is not None for e in cres)
    for tag in ("testimgs_vis", "freeview", "tpose_vis"):
        hits = [d for d in os.listdir(hos_log) if d.startswith(tag)]
        assert hits, f"missing {tag} artifacts"
