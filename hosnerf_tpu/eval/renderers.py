"""Renderers + evaluation sweeps for all three stages.

ref:
* stage 1: test_step/test_epoch_end (1st.../src/model/mipnerf360/model.py:
  516-609) — chunked ray rendering, per-split PSNR/SSIM/LPIPS, results.json.
* stages 2/3: progress / test_metrics / allimgs_metrics / free_view /
  test_tpose loops (2nd.../src/model/mipnerf360/model.py:495-887,
  3rd.../model.py:591-1290). Stage 2/3 sweep over their own datasets and
  render one image per item, chunked on the host.

TPU notes: chunks are fixed-size (padded) so each renderer compiles once.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.eval import io as eio
from hosnerf_tpu.eval import metrics as M

HUMAN_SHARED_KEYS = (
    "dst_Rs", "dst_Ts", "dst_posevec", "cnl_gtfms", "motion_weights_priors",
    "cnl_bbox_min_xyz", "cnl_bbox_scale_xyz", "bgcolor",
)
HUMAN_RAY_KEYS = ("rays_o", "rays_d", "near", "far")


def render_scene_image(eval_step: Callable, params, pipe, image_idx: int,
                       chunk: int = 4096) -> np.ndarray:
    """Full-image stage-1 render via fixed-size chunks."""
    h, w = pipe.scene.image_sizes[image_idx]
    outs = []
    for b in pipe.eval_image_batches(image_idx, chunk):
        rgb = np.asarray(eval_step(
            params, {k: jnp.asarray(v) for k, v in b.items()
                     if k != "n_valid"}))
        outs.append(rgb[: b["n_valid"]])
    return np.concatenate(outs).reshape(int(h), int(w), 3)


def _pad_chunk(arr: np.ndarray, start: int, chunk: int) -> np.ndarray:
    end = min(start + chunk, arr.shape[0])
    out = arr[start:end]
    if end - start < chunk:
        pad = np.repeat(out[:1], chunk - (end - start), axis=0)
        out = np.concatenate([out, pad], 0)
    return out


def render_human_image(render_fn: Callable, params, item: Dict,
                       chunk: int = 8192,
                       extra_keys: tuple = ()) -> np.ndarray:
    """Full-image human (or composed) render over the dense pixel grid.
    `render_fn(params, chunk_batch) -> rgb [chunk, 3]`."""
    h, w = item["img_height"], item["img_width"]
    n = item["rays_o"].shape[0]
    shared = {k: jnp.asarray(item[k]) for k in
              HUMAN_SHARED_KEYS + tuple(extra_keys) if k in item}
    ray_keys = [k for k in HUMAN_RAY_KEYS
                + ("rays_o_bkg", "rays_d_bkg", "viewdirs_bkg", "radii")
                if k in item]
    outs = []
    for s in range(0, n, chunk):
        cb = dict(shared)
        for k in ray_keys:
            cb[k] = jnp.asarray(_pad_chunk(item[k], s, chunk))
        rgb = np.asarray(render_fn(params, cb))
        outs.append(rgb[: min(chunk, n - s)])
    return np.concatenate(outs).reshape(int(h), int(w), 3)


def evaluate_scene(eval_step, params, pipe, logdir: str,
                   lpips_metric=None, splits=("train", "val", "test"),
                   chunk: int = 4096, save_images: bool = True,
                   lpips_backbone: Optional[str] = None) -> Dict:
    """Per-split PSNR/SSIM/LPIPS + results.json + image dump
    (ref: test_epoch_end model.py:582-609). `lpips_backbone` records the
    feature provenance ('vgg16' | 'random-fixed-seed') in results.json."""
    i_train, i_val, i_test, _ = pipe.scene.i_split
    split_ids = {"train": i_train, "val": i_val, "test": i_test}
    results = {m: {} for m in ("psnr", "ssim", "lpips")}
    if lpips_metric is not None:
        # top level, like evaluate_human: the per-split lpips dict holds
        # ONLY float means, so consumers can aggregate .values() safely
        results["lpips_backbone"] = lpips_backbone or "unknown"
    rendered_all = []
    for split in splits:
        psnrs, ssims, lpipss = [], [], []
        for i in split_ids[split]:
            rgb = render_scene_image(eval_step, params, pipe, int(i), chunk)
            tgt = pipe.scene.images[int(i)]
            psnrs.append(float(M.psnr(jnp.asarray(rgb), jnp.asarray(tgt))))
            ssims.append(float(M.ssim(jnp.asarray(rgb),
                                      jnp.asarray(tgt))[0]))
            if lpips_metric is not None:
                lpipss.append(float(lpips_metric(jnp.asarray(rgb),
                                                 jnp.asarray(tgt))))
            if split == "test":
                rendered_all.append(rgb)
        results["psnr"][split] = float(np.mean(psnrs)) if psnrs else None
        results["ssim"][split] = float(np.mean(ssims)) if ssims else None
        results["lpips"][split] = (float(np.mean(lpipss)) if lpipss
                                   else None)

    os.makedirs(logdir, exist_ok=True)
    if save_images and rendered_all:
        eio.store_image(os.path.join(logdir, "render_model"), rendered_all)
    stats = [results["psnr"], results["ssim"], results["lpips"]]
    if "lpips_backbone" in results:
        # additive 4th entry: reference consumers index [0..2]; ours
        # (tools/parity_runbook.py) reads the provenance from it
        stats.append({"lpips_backbone": results["lpips_backbone"]})
    eio.write_stats(os.path.join(logdir, "results.json"), *stats)
    return results


def render_scene_path(eval_step, params, pipe, logdir: str,
                      chunk: int = 4096, fps: int = 20) -> str:
    """Render the interpolated camera path to mp4 (the reference's
    `trainer.predict` -> on_predict_epoch_end video;
    ref: src/model/interface.py:134-150, render path from
    pose_utils.pose_interp)."""
    from hosnerf_tpu.data import rays as ray_gen
    frames = []
    scene = pipe.scene
    h, w = scene.image_sizes[0]
    for pose, t in zip(scene.render_poses, scene.render_times):
        rays_o, rays_d, viewdirs, radii = ray_gen.image_rays(
            scene.intrinsics[0], pose, int(h), int(w))
        n = rays_o.shape[0]
        outs = []
        for s in range(0, n, chunk):
            sl = slice(s, min(s + chunk, n))
            npad = chunk - (sl.stop - sl.start)
            batch = {
                "rays_o": jnp.asarray(np.pad(rays_o[sl], ((0, npad), (0, 0)),
                                             mode="edge")),
                "rays_d": jnp.asarray(np.pad(rays_d[sl], ((0, npad), (0, 0)),
                                             mode="edge")),
                "viewdirs": jnp.asarray(np.pad(viewdirs[sl],
                                               ((0, npad), (0, 0)),
                                               mode="edge")),
                "radii": jnp.asarray(np.pad(radii[sl], ((0, npad), (0, 0)),
                                            mode="edge")),
                "times": jnp.full((chunk,), t, jnp.float32),
            }
            outs.append(np.asarray(eval_step(params, batch))
                        [: sl.stop - sl.start])
        frames.append(np.concatenate(outs).reshape(int(h), int(w), 3))
    return eio.store_video(os.path.join(logdir, "render_video"), frames,
                           fps=fps)


def evaluate_human(render_fn, params, dataset, logdir: str, tag: str,
                   lpips_metric=None, chunk: int = 8192,
                   extra_keys: tuple = (), max_items: Optional[int] = None,
                   save_images: bool = True,
                   lpips_backbone: Optional[str] = None) -> Dict:
    """One sweep over a HumanDataset (progress/test/movement modes):
    renders each frame, computes PSNR/SSIM/LPIPS vs target, dumps jpgs,
    and flags all-background renders (the reference's empty-image trap,
    2nd model.py:545-547). (ref: 2nd model.py:636-887)."""
    psnrs, ssims, lpipss, images = [], [], [], []
    is_empty = False
    n = len(dataset) if max_items is None else min(max_items, len(dataset))
    for i in range(n):
        item = dataset[i]
        rgb = render_human_image(render_fn, params, item, chunk, extra_keys)
        bg = np.asarray(item["bgcolor"]) / 255.0
        if np.allclose(rgb, bg, atol=5.0 / 255.0):
            is_empty = True
        tgt = item["target_img"]
        psnrs.append(float(M.psnr(jnp.asarray(rgb), jnp.asarray(tgt))))
        ssims.append(float(M.ssim(jnp.asarray(rgb), jnp.asarray(tgt),
                                  kernel_size=7, uniform_window=True)[0]))
        if lpips_metric is not None:
            lpipss.append(float(lpips_metric(jnp.asarray(rgb),
                                             jnp.asarray(tgt))))
        if save_images:
            images.append(np.concatenate(
                [eio.to_8b_image(rgb), eio.to_8b_image(tgt)], axis=1))
    if save_images and images:
        os.makedirs(logdir, exist_ok=True)
        eio.store_image(os.path.join(logdir, f"{tag}_vis"), images)
    out = {
        "psnr": float(np.mean(psnrs)) if psnrs else None,
        "ssim": float(np.mean(ssims)) if ssims else None,
        "lpips": float(np.mean(lpipss)) if lpipss else None,
        "is_empty_img": is_empty,
    }
    if lpips_metric is not None:
        out["lpips_backbone"] = lpips_backbone or "unknown"
    eio.write_stats(os.path.join(logdir, f"results_{tag}.json"), out)
    return out


def full_human_eval(render_fn, params, dataset_factory, logdir: str,
                    transitions=None, lpips_metric=None, chunk: int = 8192,
                    extra_keys: tuple = (), tpose_resolution: int = 512,
                    freeview_frames: int = 100,
                    tpose_views: Optional[int] = None,
                    tpose_render_fn=None,
                    lpips_backbone: Optional[str] = None) -> Dict:
    """The reference's complete test_step sweep: held-out test frames,
    all frames ('movement'), 360-degree freeview orbit, and canonical-pose
    renders at per-state midpoint times (ref: 2nd model.py:872-887).
    `dataset_factory(mode, **kw)` builds a HumanDataset."""
    results = {}
    results["testimgs"] = evaluate_human(
        render_fn, params, dataset_factory(mode="test"), logdir,
        "testimgs", lpips_metric, chunk, extra_keys,
        lpips_backbone=lpips_backbone)
    results["allimgs"] = evaluate_human(
        render_fn, params, dataset_factory(mode="movement"), logdir,
        "allimgs", lpips_metric, chunk, extra_keys,
        lpips_backbone=lpips_backbone)
    render_freeview(render_fn, params,
                    dataset_factory(mode="freeview",
                                    render_frames=freeview_frames),
                    logdir, chunk, extra_keys)
    # stage 3 renders the canonical pose with the HUMAN model only
    # (ref: 3rd model.py test_tpose)
    tpose_kw = {"render_frames": tpose_views} if tpose_views else {}
    render_tpose(tpose_render_fn or render_fn, params,
                 dataset_factory(mode="tpose", **tpose_kw), logdir,
                 transitions=transitions, resolution=tpose_resolution,
                 n_views=tpose_views, chunk=chunk)
    eio.write_stats(os.path.join(logdir, "results.json"),
                    results["testimgs"], results["allimgs"])
    return results


def render_freeview(render_fn, params, dataset, logdir: str,
                    chunk: int = 8192, extra_keys: tuple = (),
                    save_video: bool = True) -> List[np.ndarray]:
    """360-degree orbit render + mp4 (ref: free_view, 2nd model.py:775-819)."""
    frames = []
    for i in range(len(dataset)):
        item = dataset[i]
        frames.append(render_human_image(render_fn, params, item, chunk,
                                         extra_keys))
    if save_video and frames:
        eio.store_video(os.path.join(logdir, "freeview"), frames)
    return frames


def tpose_midpoint_times(transitions: Optional[np.ndarray]) -> List[float]:
    """Per-state midpoint times for test_tpose (ref: 2nd model.py:877-887:
    renders the canonical pose at the midpoint of every state segment)."""
    if transitions is None or len(transitions) == 0:
        return [0.5]
    edges = np.concatenate([[0.0], np.asarray(transitions), [1.0]])
    return [float((edges[i] + edges[i + 1]) / 2)
            for i in range(len(edges) - 1)]


def render_tpose(render_fn, params, dataset, logdir: str,
                 transitions=None, resolution: int = 512,
                 n_views: Optional[int] = None,
                 chunk: int = 8192) -> List[np.ndarray]:
    """Canonical-pose turntable at each state's midpoint time.

    Renders the dataset's own `render_frames`-sized turntable per state
    (ref: tpose.py:59,143-163 — cfg.render_frames views, angle
    2*pi*idx/total), written as mp4 per state plus a contact-sheet jpg;
    `n_views` overrides for cheap smoke runs."""
    frames = []
    per_state = n_views or getattr(dataset, "render_frames", 4)
    for si, t in enumerate(tpose_midpoint_times(transitions)):
        state_frames = []
        for v in range(per_state):
            item = dataset.get_tpose_item(v, resolution=resolution, time=t)
            state_frames.append(render_human_image(render_fn, params, item,
                                                   chunk))
        if len(state_frames) > 8:
            eio.store_video(os.path.join(logdir, f"tpose_state{si}"),
                            state_frames)
            # contact sheet: 8 evenly spaced views
            step = max(len(state_frames) // 8, 1)
            frames.extend(state_frames[::step][:8])
        else:
            frames.extend(state_frames)
    if frames:
        eio.store_image(os.path.join(logdir, "tpose_vis"), frames)
    return frames
