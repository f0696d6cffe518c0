"""Checkpointing: Orbax save/restore with the reference's best/last
semantics, plus torch Lightning `.ckpt` import/export so released reference
checkpoints drop straight into the TPU models.

ref: ModelCheckpoint(monitor='val/psnr', filename='best', save_top_k=1,
save_last=True) (1st.../run.py:124-131); stage-3 warm start loads the human
ckpt then the bkgd ckpt with strict=False (3rd.../run.py:205-212).

torch -> flax weight transforms:
  Linear weight (out, in)            -> kernel (in, out) = W.T
  ConvTranspose3d weight (in,out,k^3) -> DHWIO = flip(W, spatial).transpose
                                         (2,3,4,0,1)  (numerically verified
                                         against torch in tests)
  ParameterList embeddings (.0 .1 ..) -> rows of the stacked state_embeds
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Orbax native checkpoints
# ---------------------------------------------------------------------------

def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, name: str, state: Dict[str, Any]) -> str:
    """Save a pytree under <ckpt_dir>/<name> (overwrites)."""
    import orbax.checkpoint as ocp
    path = os.path.join(os.path.abspath(ckpt_dir), name)
    ckptr = _ckptr()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(ckpt_dir: str, name: str,
                       target: Optional[Dict[str, Any]] = None):
    path = os.path.join(os.path.abspath(ckpt_dir), name)
    return _ckptr().restore(path, target=target)


class BestLastCheckpointer:
    """Reference semantics: always refresh 'last'; keep the single 'best'
    by monitored value (val/psnr, higher is better). The best value
    persists in a side file so the monitor survives --resume_training
    (Lightning stores it inside the .ckpt)."""

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = ckpt_dir
        self._best_path = os.path.join(ckpt_dir, "best_value.json")
        self.best_value = -np.inf
        if os.path.exists(self._best_path):
            import json
            with open(self._best_path) as f:
                self.best_value = float(json.load(f)["best_value"])

    def save_last(self, state: Dict[str, Any]) -> str:
        return save_checkpoint(self.ckpt_dir, "last", state)

    def maybe_save_best(self, state: Dict[str, Any],
                        monitored: float) -> Optional[str]:
        if monitored > self.best_value:
            self.best_value = monitored
            path = save_checkpoint(self.ckpt_dir, "best", state)
            import json
            with open(self._best_path, "w") as f:
                json.dump({"best_value": float(monitored)}, f)
            return path
        return None


# ---------------------------------------------------------------------------
# Full train-state pack/restore (true resume)
# ---------------------------------------------------------------------------
# The reference's Lightning .ckpt carries state_dict + optimizer + loop
# state (SURVEY.md §5; 1st run.py:158-160 resumes from <logdir>/last.ckpt).
# The TPU equivalent: {params, opt_state, step, rng} as one Orbax pytree.

def pack_train_state(carry: tuple, step: int, rng) -> Dict[str, Any]:
    """carry = (params[, opt_state, ...]) -> checkpointable state dict."""
    state = {"params": carry[0], "step": int(step),
             "rng": np.asarray(jax.random.key_data(rng))}
    if len(carry) > 1:
        state["opt_state"] = carry[1]
    return state


def restore_train_state(ckpt_dir: str, name: str, params, opt_state, rng):
    """Restore (params, opt_state, step, rng) saved by pack_train_state.
    The passed-in values provide the pytree structure (and the fallback
    rng dtype/shape)."""
    target = pack_train_state((params, opt_state), 0, rng)
    restored = restore_checkpoint(ckpt_dir, name, target)
    return (restored["params"], restored["opt_state"],
            int(restored["step"]),
            jax.random.wrap_key_data(jnp.asarray(restored["rng"])))


def load_stage_params(path: str, which: str):
    """Warm-start params from EITHER a reference torch Lightning `.ckpt`
    OR one of this framework's own Orbax checkpoints (a directory saved
    by `save_checkpoint`, e.g. `<logdir>/ckpt/best`) — so stages trained
    here feed stage 3 directly, no torch round-trip (ref 3rd
    run.py:205-212 loads the two stage ckpts). which: 'scene' | 'human'."""
    if path.endswith(".ckpt"):
        return (import_scene_params(path) if which == "scene"
                else import_human_params(path))
    state = _ckptr().restore(os.path.abspath(path))
    params = state.get("params", state)
    if which in params:  # stage-3 states nest {'scene':..., 'human':...}
        params = params[which]
    return params


# ---------------------------------------------------------------------------
# torch Lightning .ckpt import
# ---------------------------------------------------------------------------

def _t2k(w) -> np.ndarray:  # linear weight -> kernel
    return np.ascontiguousarray(np.asarray(w).T.astype(np.float32))


def _conv_t2k(w) -> np.ndarray:  # ConvTranspose3d -> DHWIO
    w = np.asarray(w)
    return np.ascontiguousarray(
        np.flip(w, (2, 3, 4)).transpose(2, 3, 4, 0, 1).astype(np.float32))


def _bias_key(weight_key: str) -> str:
    """'....weight' -> '....bias' (suffix only — 'weight' also appears in
    'mweight_vol_decoder')."""
    assert weight_key.endswith(".weight")
    return weight_key[: -len("weight")] + "bias"


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    blob = torch.load(path, map_location="cpu")
    sd = blob.get("state_dict", blob)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _dense(params: Dict, path: str, w, b):
    node = params
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node["Dense_0"] = {"kernel": _t2k(w), "bias": np.asarray(b, np.float32)}


def import_scene_params(path: str, num_levels: int = 3,
                        prefix: str = "model.") -> Dict[str, Any]:
    """Stage-1 Lightning ckpt -> SceneField params.

    torch layout (ref: 1st.../src/model/mipnerf360/model.py):
      model.mlps.{i}.pts_linear.{j}.weight/.bias
      model.mlps.{i}.{density,bottleneck,rgb}_layer.*   (prop: no rgb path)
      model.mlps.{i}.views_linear.{j}.*
      model.mlps.{i}.bkgd_stateembeds.{k}
    """
    sd = _load_torch_state_dict(path)
    params: Dict[str, Any] = {}
    for i in range(num_levels):
        ours = (f"prop_mlp_{i}" if i < num_levels - 1 else "nerf_mlp")
        base = f"{prefix}mlps.{i}."
        mlp: Dict[str, Any] = params.setdefault(ours, {})
        j = 0
        while f"{base}pts_linear.{j}.weight" in sd:
            _dense(params, f"{ours}/pts_linear_{j}",
                   sd[f"{base}pts_linear.{j}.weight"],
                   sd[f"{base}pts_linear.{j}.bias"])
            j += 1
        for layer in ("density_layer", "bottleneck_layer", "rgb_layer"):
            if f"{base}{layer}.weight" in sd:
                _dense(params, f"{ours}/{layer}",
                       sd[f"{base}{layer}.weight"], sd[f"{base}{layer}.bias"])
        j = 0
        while f"{base}views_linear.{j}.weight" in sd:
            _dense(params, f"{ours}/views_linear_{j}",
                   sd[f"{base}views_linear.{j}.weight"],
                   sd[f"{base}views_linear.{j}.bias"])
            j += 1
        embeds = []
        k = 0
        while f"{base}bkgd_stateembeds.{k}" in sd:
            embeds.append(np.asarray(sd[f"{base}bkgd_stateembeds.{k}"],
                                     np.float32))
            k += 1
        if embeds:
            mlp["state_embeds"] = np.stack(embeds, 0)
    return params


def import_human_params(path: str, prefix: str = "human.",
                        nr_mlp_depth: int = 6,
                        cnl_mlp_depth: int = 8,
                        pose_mlp_depth: int = 4) -> Dict[str, Any]:
    """Stage-2/3 Lightning ckpt -> HumanObjectField params.

    torch layout (ref: 2nd.../core/nets/human_nerf/*): ModuleLists
    interleave Linear+ReLU, so linears sit at even indices.
    """
    sd = _load_torch_state_dict(path)
    params: Dict[str, Any] = {}

    # canonical mlp: pts_linears at even indices, output_linear.0
    for j in range(cnl_mlp_depth):
        key = f"{prefix}cnl_mlp.pts_linears.{2 * j}.weight"
        if key in sd:
            _dense(params, f"cnl_mlp/linear_{j}", sd[key],
                   sd[_bias_key(key)])
    if f"{prefix}cnl_mlp.output_linear.0.weight" in sd:
        _dense(params, "cnl_mlp/output",
               sd[f"{prefix}cnl_mlp.output_linear.0.weight"],
               sd[f"{prefix}cnl_mlp.output_linear.0.bias"])

    # non-rigid mlps: block_mlps linears at 0,2,..,2*(depth-1); final at
    # 2*depth
    for mod in ("non_rigid_mlp", "non_rigid_forward_mlp"):
        for j in range(nr_mlp_depth):
            key = f"{prefix}{mod}.block_mlps.{2 * j}.weight"
            if key in sd:
                _dense(params, f"{mod}/linear_{j}", sd[key],
                       sd[_bias_key(key)])
        key = f"{prefix}{mod}.block_mlps.{2 * nr_mlp_depth}.weight"
        if key in sd:
            _dense(params, f"{mod}/output", sd[key],
                   sd[_bias_key(key)])

    # pose decoder: trunk at block_mlps.{0,2,..}; heads [Linear,ReLU,Linear]
    for j in range(pose_mlp_depth - 1):
        key = f"{prefix}pose_decoder.block_mlps.{2 * j}.weight"
        if key in sd:
            _dense(params, f"pose_decoder/trunk_{j}", sd[key],
                   sd[_bias_key(key)])
    for torch_head, ours in (("block_mlps_dstR", "head_r"),
                             ("block_mlps_dstT", "head_t")):
        k0 = f"{prefix}pose_decoder.{torch_head}.0.weight"
        k2 = f"{prefix}pose_decoder.{torch_head}.2.weight"
        if k0 in sd:
            _dense(params, f"pose_decoder/{ours}_0", sd[k0],
                   sd[_bias_key(k0)])
        if k2 in sd:
            _dense(params, f"pose_decoder/{ours}_out", sd[k2],
                   sd[_bias_key(k2)])

    # motion weight volume decoder
    ck = f"{prefix}mweight_vol_decoder.const_embedding"
    if ck in sd:
        dec = params.setdefault("mweight_vol_decoder", {})
        dec["const_embedding"] = np.asarray(sd[ck], np.float32)
        dd = dec.setdefault("decoder", {})
        mk = f"{prefix}mweight_vol_decoder.decoder.block_mlp.0.weight"
        dd["block_mlp"] = {"Dense_0": {
            "kernel": _t2k(sd[mk]),
            "bias": np.asarray(sd[_bias_key(mk)],
                               np.float32)}}
        # block_conv transposed convs at even indices; last = deconv_out
        conv_ids = []
        j = 0
        while (f"{prefix}mweight_vol_decoder.decoder.block_conv.{j}.weight"
               in sd):
            conv_ids.append(j)
            j += 2
        for n, j in enumerate(conv_ids):
            name = ("deconv_out" if n == len(conv_ids) - 1
                    else f"deconv_{n}")
            base = f"{prefix}mweight_vol_decoder.decoder.block_conv.{j}."
            dd[name] = {"kernel": _conv_t2k(sd[base + "weight"]),
                        "bias": np.asarray(sd[base + "bias"], np.float32)}

    # state embeddings
    embeds = []
    k = 0
    while f"{prefix}human_stateembeds.{k}" in sd:
        embeds.append(np.asarray(sd[f"{prefix}human_stateembeds.{k}"],
                                 np.float32))
        k += 1
    if embeds:
        params["state_embeds"] = np.stack(embeds, 0)
    return params


def overlay_params(target, imported) -> Any:
    """strict=False load: overlay imported subtree onto `target`, keeping
    target leaves where the import has no value and checking shapes."""
    if isinstance(target, dict):
        out = {}
        for k, v in target.items():
            if isinstance(imported, dict) and k in imported:
                out[k] = overlay_params(v, imported[k])
            else:
                out[k] = v
        return out
    arr = np.asarray(imported)
    if arr.shape != np.asarray(target).shape:
        raise ValueError(
            f"shape mismatch importing checkpoint: {arr.shape} vs "
            f"{np.asarray(target).shape}")
    return jax.numpy.asarray(arr)


# ---------------------------------------------------------------------------
# torch Lightning .ckpt export (inverse of the importers)
# ---------------------------------------------------------------------------

def _k2t(kernel) -> np.ndarray:  # flax kernel -> torch linear weight
    return np.ascontiguousarray(np.asarray(kernel).T.astype(np.float32))


def _conv_k2t(kernel) -> np.ndarray:  # DHWIO -> ConvTranspose3d (in,out,k^3)
    k = np.asarray(kernel).transpose(3, 4, 0, 1, 2)
    return np.ascontiguousarray(np.flip(k, (2, 3, 4)).astype(np.float32))


def _put_dense(sd: Dict[str, np.ndarray], torch_key: str, node: Dict):
    sd[torch_key + ".weight"] = _k2t(node["Dense_0"]["kernel"])
    sd[torch_key + ".bias"] = np.asarray(node["Dense_0"]["bias"],
                                         np.float32)


def export_scene_params(params: Dict[str, Any], num_levels: int = 3,
                        prefix: str = "model.") -> Dict[str, np.ndarray]:
    """SceneField params -> Lightning-style state_dict (reference key
    naming), so checkpoints flow back to the torch reference."""
    sd: Dict[str, np.ndarray] = {}
    for i in range(num_levels):
        ours = f"prop_mlp_{i}" if i < num_levels - 1 else "nerf_mlp"
        if ours not in params:
            continue
        mlp = params[ours]
        base = f"{prefix}mlps.{i}."
        j = 0
        while f"pts_linear_{j}" in mlp:
            _put_dense(sd, f"{base}pts_linear.{j}", mlp[f"pts_linear_{j}"])
            j += 1
        for layer in ("density_layer", "bottleneck_layer", "rgb_layer"):
            if layer in mlp:
                _put_dense(sd, f"{base}{layer}", mlp[layer])
        j = 0
        while f"views_linear_{j}" in mlp:
            _put_dense(sd, f"{base}views_linear.{j}",
                       mlp[f"views_linear_{j}"])
            j += 1
        if "state_embeds" in mlp:
            embeds = np.asarray(mlp["state_embeds"], np.float32)
            for k in range(embeds.shape[0]):
                sd[f"{base}bkgd_stateembeds.{k}"] = embeds[k]
    return sd


def export_human_params(params: Dict[str, Any], prefix: str = "human.",
                        nr_mlp_depth: int = 6, cnl_mlp_depth: int = 8,
                        pose_mlp_depth: int = 4) -> Dict[str, np.ndarray]:
    """HumanObjectField params -> Lightning-style state_dict."""
    sd: Dict[str, np.ndarray] = {}
    cnl = params.get("cnl_mlp", {})
    for j in range(cnl_mlp_depth):
        if f"linear_{j}" in cnl:
            _put_dense(sd, f"{prefix}cnl_mlp.pts_linears.{2 * j}",
                       cnl[f"linear_{j}"])
    if "output" in cnl:
        _put_dense(sd, f"{prefix}cnl_mlp.output_linear.0", cnl["output"])

    for mod in ("non_rigid_mlp", "non_rigid_forward_mlp"):
        node = params.get(mod, {})
        for j in range(nr_mlp_depth):
            if f"linear_{j}" in node:
                _put_dense(sd, f"{prefix}{mod}.block_mlps.{2 * j}",
                           node[f"linear_{j}"])
        if "output" in node:
            _put_dense(sd, f"{prefix}{mod}.block_mlps.{2 * nr_mlp_depth}",
                       node["output"])

    pose = params.get("pose_decoder", {})
    for j in range(pose_mlp_depth - 1):
        if f"trunk_{j}" in pose:
            _put_dense(sd, f"{prefix}pose_decoder.block_mlps.{2 * j}",
                       pose[f"trunk_{j}"])
    for torch_head, ours in (("block_mlps_dstR", "head_r"),
                             ("block_mlps_dstT", "head_t")):
        if f"{ours}_0" in pose:
            _put_dense(sd, f"{prefix}pose_decoder.{torch_head}.0",
                       pose[f"{ours}_0"])
        if f"{ours}_out" in pose:
            _put_dense(sd, f"{prefix}pose_decoder.{torch_head}.2",
                       pose[f"{ours}_out"])

    if "mweight_vol_decoder" in params:
        dec = params["mweight_vol_decoder"]
        sd[f"{prefix}mweight_vol_decoder.const_embedding"] = np.asarray(
            dec["const_embedding"], np.float32)
        dd = dec["decoder"]
        _put_dense(sd, f"{prefix}mweight_vol_decoder.decoder.block_mlp.0",
                   dd["block_mlp"])
        conv_names = sorted([k for k in dd if k.startswith("deconv_")
                             and k != "deconv_out"],
                            key=lambda s: int(s.split("_")[1]))
        conv_names.append("deconv_out")
        for n, name in enumerate(conv_names):
            base = (f"{prefix}mweight_vol_decoder.decoder."
                    f"block_conv.{2 * n}")
            sd[base + ".weight"] = _conv_k2t(dd[name]["kernel"])
            sd[base + ".bias"] = np.asarray(dd[name]["bias"], np.float32)

    if "state_embeds" in params:
        embeds = np.asarray(params["state_embeds"], np.float32)
        for k in range(embeds.shape[0]):
            sd[f"{prefix}human_stateembeds.{k}"] = embeds[k]
    return sd


def save_torch_ckpt(path: str, state_dict: Dict[str, np.ndarray]) -> str:
    """Write a Lightning-compatible .ckpt (state_dict of torch tensors)."""
    import torch
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in state_dict.items()}
    torch.save({"state_dict": sd}, path)
    return path
