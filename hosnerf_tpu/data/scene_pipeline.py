"""Stage-1 training/eval batch pipeline over a loaded SceneData.

Replaces the reference's precompute-all-rays LitData + rank-strided DDP
samplers (ref: 1st_State-Conditional_Scene/src/data/interface.py,
sampler.py): rays are generated lazily per image (a few ms on the host),
the train sampler draws `batch_size` background rays from ONE random image
per step (SingleImageDDPSampler semantics, sampler.py:52-103), and
device sharding happens via parallel.mesh.shard_batch instead of
rank-strided index math.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from hosnerf_tpu.data import rays as ray_gen
from hosnerf_tpu.data.scene_loader import SceneData


class ScenePipeline:
    def __init__(self, scene: SceneData, batch_size: int = 4096,
                 seed: int = 0):
        self.scene = scene
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self._ray_cache: Dict[int, tuple] = {}
        # per-image flat indices of background pixels (mask < 1)
        # (ref: interface.py:145-150 background-ray filter)
        self._bkg_idx = [np.flatnonzero(m.reshape(-1) < 1.0)
                         for m in scene.masks]

    def _image_rays(self, i: int):
        if i not in self._ray_cache:
            h, w = self.scene.image_sizes[i]
            self._ray_cache[i] = ray_gen.image_rays(
                self.scene.intrinsics[i], self.scene.extrinsics[i],
                int(h), int(w))
            if len(self._ray_cache) > 8:  # small LRU
                self._ray_cache.pop(next(iter(self._ray_cache)))
        return self._ray_cache[i]

    def sample_train_batch(self) -> Dict[str, np.ndarray]:
        """batch_size background rays from one random training image."""
        i = int(self.rng.choice(self.scene.i_split[0]))
        rays_o, rays_d, viewdirs, radii = self._image_rays(i)
        bkg = self._bkg_idx[i]
        sel = bkg[self.rng.integers(0, len(bkg), self.batch_size)]
        target = self.scene.images[i].reshape(-1, 3)[sel]
        return {
            "rays_o": rays_o[sel],
            "rays_d": rays_d[sel],
            "viewdirs": viewdirs[sel],
            "radii": radii[sel],
            "times": np.full(self.batch_size, self.scene.times[i],
                             np.float32),
            "target": target.astype(np.float32),
        }

    def eval_image_batches(self, i: int,
                           chunk: int = 4096) -> Iterator[Dict[str, np.ndarray]]:
        """Full-image rays in fixed-size chunks (last chunk padded by
        repeating ray 0; consumer trims with `n_valid`)."""
        rays_o, rays_d, viewdirs, radii = self._image_rays(i)
        target = self.scene.images[i].reshape(-1, 3)
        n = rays_o.shape[0]
        time = self.scene.times[i]
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            idx = np.arange(start, end)
            if end - start < chunk:
                idx = np.concatenate(
                    [idx, np.zeros(chunk - (end - start), np.int64)])
            yield {
                "rays_o": rays_o[idx],
                "rays_d": rays_d[idx],
                "viewdirs": viewdirs[idx],
                "radii": radii[idx],
                "times": np.full(chunk, time, np.float32),
                "target": target[idx].astype(np.float32),
                "n_valid": end - start,
            }
