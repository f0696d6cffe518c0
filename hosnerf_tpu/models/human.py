"""The state-conditional dynamic human-object field (stage 2).

TPU-first redesign of the reference Network
(ref: 2nd_State_Conditional_Human-Object/core/nets/human_nerf/network.py):

* no chunked `_batchify_rays`/`_apply_mlp_kernals` python loops — the ray
  and sample axes stay dense and static-shape (eval batching happens on the
  host);
* the inverse LBS is one batched einsum + fused per-channel trilinear gather
  (ops/lbs.py) instead of 26 sequential grid_sample calls;
* the cycle-consistency branch replaces data-dependent boolean indexing
  (network.py:504-535) with full-sample computation + mask, keeping shapes
  static under jit (the loss applies the mask);
* the previous-frame scene-flow branch (network.py:472-501) is only traced
  when `is_train` (a static python flag), and the loss gates it by
  `time > 0.005`;
* state embeddings switch via one gather (models/state.py) rather than an
  if/elif ladder;
* pose-refinement / non-rigid kick-in gates take `iter_val` as a *traced*
  scalar — one compiled program for the whole training run.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from hosnerf_tpu.core import body as body_math
from hosnerf_tpu.core import render
from hosnerf_tpu.models import embedders
from hosnerf_tpu.models.human_components import (BodyPoseRefiner,
                                                 CanonicalMLP,
                                                 MotionWeightVolumeDecoder,
                                                 NonRigidMLP)
from hosnerf_tpu.models.layers import resolve_compute_dtype

_PREC = jax.lax.Precision.HIGHEST


class HumanObjectField(nn.Module):
    total_bones: int = 26
    n_samples: int = 128
    num_states: int = 1
    state_embedding_size: int = 64
    # canonical mlp (ref: configs/default.yaml:25-30)
    cnl_multires: int = 10
    cnl_mlp_depth: int = 8
    cnl_mlp_width: int = 256
    # non-rigid mlps (ref: configs/default.yaml:37-58)
    nr_multires: int = 6
    nr_mlp_depth: int = 6
    nr_mlp_width: int = 128
    nr_skips: Sequence[int] = (4,)
    nr_condition_code_size: int = 75
    nr_kick_in_iter: int = 10_000
    nr_full_band_iter: int = 50_000
    # pose decoder (ref: configs/default.yaml:61-65)
    pose_embedding_size: int = 75
    pose_mlp_width: int = 256
    pose_mlp_depth: int = 4
    pose_kick_in_iter: int = 0
    # motion weight volume (ref: configs/default.yaml:32-36)
    mweight_embedding_size: int = 256
    mweight_volume_size: int = 32
    ignore_non_rigid_motions: bool = False
    # rematerialize the per-sample MLP activations in backward; essential
    # for production batch sizes (1M+ samples/step). True/'all' = every
    # MLP; 'heavy' = only the 8x256 canonical MLP (4.3 GB bf16 residuals
    # at 8 patches) while the 6x128 non-rigid MLPs stay dense;
    # False/'none' = dense everywhere.
    remat: "bool | str" = True
    # when set, evaluate the per-sample MLPs in sequential chunks of this
    # many samples via nn.scan — bounds live activation memory to one
    # chunk (the TPU-native form of the reference's `netchunk`,
    # ref: network.py:115 / configs default netchunk_per_gpu). None =
    # single dense pass (fastest; use for batches that fit).
    mlp_chunk: Optional[int] = None
    # LBS implementation: 'auto' (fused Pallas kernels on TPU, XLA
    # one-hot matmul elsewhere), 'pallas', 'xla', or 'gather'
    lbs_impl: str = "auto"
    # per-sample MLP execution: 'auto' (fused embed+trunk Pallas kernels
    # on TPU — the PE features and concats are built in VMEM and never
    # round-trip HBM; flax elsewhere), 'fused', or 'flax'
    mlp_impl: str = "auto"
    # MLP-trunk computation dtype ('bf16' or None=f32) for the canonical
    # and non-rigid MLPs; params, output heads, LBS and compositing stay
    # f32 either way
    compute_dtype: Optional[str] = None

    def setup(self):
        self.pose_decoder = BodyPoseRefiner(
            total_bones=self.total_bones, mlp_width=self.pose_mlp_width,
            mlp_depth=self.pose_mlp_depth, name="pose_decoder")
        cdt = resolve_compute_dtype(self.compute_dtype)
        self.mweight_vol_decoder = MotionWeightVolumeDecoder(
            embedding_size=self.mweight_embedding_size,
            volume_size=self.mweight_volume_size,
            total_bones=self.total_bones, compute_dtype=cdt,
            name="mweight_vol_decoder")
        from hosnerf_tpu.models.layers import resolve_remat
        mode = resolve_remat(self.remat)
        nr_cls = nn.remat(NonRigidMLP) if mode == "all" else NonRigidMLP
        cnl_cls = (nn.remat(CanonicalMLP) if mode in ("all", "heavy")
                   else CanonicalMLP)
        self.non_rigid_mlp = nr_cls(
            mlp_depth=self.nr_mlp_depth, mlp_width=self.nr_mlp_width,
            skips=self.nr_skips, compute_dtype=cdt, name="non_rigid_mlp")
        self.non_rigid_forward_mlp = nr_cls(
            mlp_depth=self.nr_mlp_depth, mlp_width=self.nr_mlp_width,
            skips=self.nr_skips, compute_dtype=cdt,
            name="non_rigid_forward_mlp")
        self.cnl_mlp = cnl_cls(
            mlp_depth=self.cnl_mlp_depth, mlp_width=self.cnl_mlp_width,
            compute_dtype=cdt, name="cnl_mlp")
        # ref: network.py:83-85 (`human_stateembeds`)
        self.state_embeds = self.param(
            "state_embeds", nn.initializers.normal(stddev=1.0),
            (self.num_states, self.state_embedding_size))

    # ------------------------------------------------------------------
    def _refine_pose(self, dst_Rs, dst_Ts, dst_posevec, iter_val):
        """Apply the pose decoder's residual rotations/translations to all
        non-root bones, gated by iter_val (ref: network.py:589-604)."""
        out = self.pose_decoder(dst_posevec)
        refined_Rs, refined_Ts = out["Rs"], out["Ts"]
        new_Rs = jnp.concatenate([
            dst_Rs[:1],
            jnp.matmul(dst_Rs[1:], refined_Rs, precision=_PREC)], axis=0)
        new_Ts = jnp.concatenate([dst_Ts[:1], dst_Ts[1:] + refined_Ts],
                                 axis=0)
        gate = jnp.asarray(iter_val, jnp.float32) >= self.pose_kick_in_iter
        return (jnp.where(gate, new_Rs, dst_Rs),
                jnp.where(gate, new_Ts, dst_Ts))

    def _nr_condition(self, posevec, iter_val):
        """Zero the non-rigid condition code before its kick-in iteration
        (ref: network.py:652-656)."""
        gate = (jnp.asarray(iter_val, jnp.float32)
                >= self.nr_kick_in_iter).astype(posevec.dtype)
        return posevec * gate

    def _sparse_ok(self, motion_weights_vol) -> bool:
        """Liveness-sorted live-suffix path: requires BOTH the fused MLP
        kernels and the Pallas pair-grid LBS (the sort/skip machinery
        lives there). HOSNERF_SPARSE=0 forces the dense path."""
        import os
        if os.environ.get("HOSNERF_SPARSE", "1") == "0":
            return False
        if not self._use_fused_mlp():
            return False
        from hosnerf_tpu.ops import lbs as lbs_ops
        return lbs_ops.resolve_impl(
            self.lbs_impl, motion_weights_vol) == "pallas"

    def _prev_transforms(self, batch, iter_val):
        """Previous-frame pose refine + forward motion bases + non-rigid
        condition (the flow branch's transform set;
        ref: network.py:472-501)."""
        dst_Rs_prev, dst_Ts_prev = self._refine_pose(
            batch["dst_Rs_prev"], batch["dst_Ts_prev"],
            batch["dst_posevec_prev"][:self.pose_embedding_size],
            iter_val)
        _, _, p_sR_fwd, p_T_fwd = body_math.motion_bases(
            dst_Rs_prev, dst_Ts_prev, batch["cnl_gtfms"])
        cond_prev = self._nr_condition(
            batch["dst_posevec_prev"][None,
                                      :self.nr_condition_code_size],
            iter_val)
        return p_sR_fwd, p_T_fwd, cond_prev

    def _chunked(self, module, *args):
        """Apply a per-sample module over `mlp_chunk`-sized slices of the
        flat sample axis (static unrolled loop; with remat each chunk's
        activations are freed before the next — the memory profile of the
        reference's netchunk without its python-dispatch overhead). Pads N
        to a chunk multiple and strips. Param paths are identical to the
        dense pass (same module, repeated calls)."""
        if not self.mlp_chunk:
            return module(*args)
        n = args[0].shape[0]
        c = self.mlp_chunk
        pad = (-n) % c
        padded = []
        for a in args:
            if pad:
                a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            padded.append(a)
        outs = [module(*(a[s:s + c] for a in padded))
                for s in range(0, n + pad, c)]
        out = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)
        return jax.tree.map(lambda o: o[:n], out)

    # ------------------------------------------------------------------
    # fused embed+trunk execution (ops/pallas/mlp.py): the PE features,
    # concats and trunk run in one kernel; gradients flow to the SAME
    # flax param tree (arrays read via self.variables).
    def _use_fused_mlp(self) -> bool:
        import os
        impl = os.environ.get("HOSNERF_MLP_IMPL", self.mlp_impl)
        if impl == "flax" or self.is_initializing():
            return False
        if impl == "fused":
            return True
        return (jax.default_backend() == "tpu"
                and tuple(self.nr_skips) == (4,))

    def _mlp_prec(self) -> str:
        cdt = resolve_compute_dtype(self.compute_dtype)
        return "bf16" if cdt == jnp.bfloat16 else "highest"

    def _fused_params(self, name: str, depth: int):
        p = self.variables["params"][name]
        layers = [(p[f"linear_{i}"]["Dense_0"]["kernel"],
                   p[f"linear_{i}"]["Dense_0"]["bias"])
                  for i in range(depth)]
        out = (p["output"]["Dense_0"]["kernel"],
               p["output"]["Dense_0"]["bias"])
        return layers, out

    def _nr_apply(self, module, name: str, pts, cond, alpha, k0=None):
        """Non-rigid offset MLP on raw points: hannw PE + trunk + offset,
        fused on TPU. cond [N, C] per-sample. Returns pts + offsets.
        k0: optional first-live-block offset (live-suffix skipping; only
        valid on the fused path — rows below k0*1024 come back garbage
        and must be masked by the caller)."""
        if self._use_fused_mlp():
            from hosnerf_tpu.ops.pallas import mlp as pmlp
            layers, out = self._fused_params(name, self.nr_mlp_depth)
            trans = pmlp.fused_embed_trunk(
                pts, cond, alpha, layers, out, kind="hannw",
                multires=self.nr_multires, aux_mode="stream",
                aux_first=True, skip_before=self.nr_skips[0],
                skip_source="embed", precision=self._mlp_prec(),
                k0_blocks=k0)
            return pts + trans
        assert k0 is None, "live-suffix k0 requires the fused MLP path"
        embed = embedders.hannw_fourier_embed(pts, self.nr_multires, alpha)
        return self._chunked(module, embed, pts, cond)["xyz"]

    def _canonical_raw(self, cnl_pts, state_idx, k0=None):
        """PE + state embedding -> canonical MLP raw rgb+sigma
        (ref: network.py:174-251)."""
        embed = self.state_embeds[state_idx]
        if self._use_fused_mlp() and embed.ndim == 1:
            from hosnerf_tpu.ops.pallas import mlp as pmlp
            layers, out = self._fused_params("cnl_mlp", self.cnl_mlp_depth)
            return pmlp.fused_embed_trunk(
                cnl_pts, embed, None, layers, out, kind="fourier",
                multires=self.cnl_multires, aux_mode="broadcast",
                aux_first=False, skip_before=5,
                skip_source="full_input", precision=self._mlp_prec(),
                k0_blocks=k0)
        assert k0 is None, "live-suffix k0 requires the fused MLP path"
        xyz_embedded = embedders.fourier_embed(cnl_pts, self.cnl_multires)
        embed = jnp.broadcast_to(
            embed, xyz_embedded.shape[:-1] + (embed.shape[-1],))
        return self._chunked(
            self.cnl_mlp, jnp.concatenate([xyz_embedded, embed], axis=-1))

    # ------------------------------------------------------------------
    def _samples_dense(self, batch, pts_flat, m_sR, m_T, m_sR_fwd,
                       m_T_fwd, motion_weights_vol, cond, alpha,
                       state_idx, iter_val, is_train, R, S):
        """Dense per-sample pipeline: every sample through every stage
        (the reference's math with masks instead of boolean gathers).
        Returns (raw [R,S,4], fg_mask [N,1], train-branch outputs)."""
        from hosnerf_tpu.ops import lbs as lbs_ops
        x_skel, fg_mask = lbs_ops.inverse_warp(
            pts_flat, m_sR, m_T, motion_weights_vol,
            batch["cnl_bbox_min_xyz"], batch["cnl_bbox_scale_xyz"],
            impl=self.lbs_impl)

        if not self.ignore_non_rigid_motions:
            cnl_pts = self._nr_apply(
                self.non_rigid_mlp, "non_rigid_mlp", x_skel,
                jnp.broadcast_to(cond, (x_skel.shape[0], cond.shape[-1])),
                alpha)
        else:
            cnl_pts = x_skel

        raw = self._canonical_raw(cnl_pts, state_idx).reshape(R, S, 4)

        outputs: Dict[str, Any] = {}
        # ---- cycle-consistency branch (ref: network.py:503-535),
        # computed for ALL samples with a mask instead of boolean
        # gathering ----
        if is_train:
            # Both forward branches (cycle + prev-frame flow) sample the
            # weight volume at the SAME canonical points — sample ONCE,
            # blend BOTH transform sets (one fused Pallas kernel on TPU:
            # the [N, B] weights never leave VMEM), and run ONE 2N-sample
            # non_rigid_forward_mlp pass over the concatenated deform
            # streams (vs the reference's two full
            # _sample_motion_fields_forward + non_rigid_forward_mlp
            # passes, network.py:472-535; identical math — the module is
            # per-sample, so grads through the concatenated call equal
            # the sum over two separate calls).
            p_sR_fwd, p_T_fwd, cond_prev = self._prev_transforms(
                batch, iter_val)
            deform_both, _ = lbs_ops.forward_warp_multi(
                cnl_pts,
                jnp.stack([m_sR_fwd, p_sR_fwd]),
                jnp.stack([m_T_fwd, p_T_fwd]),
                motion_weights_vol, batch["cnl_bbox_min_xyz"],
                batch["cnl_bbox_scale_xyz"],
                impl=self.lbs_impl)                      # [2, N, 3]
            n = cnl_pts.shape[0]
            deform_both = deform_both.reshape(2 * n, 3)
            if not self.ignore_non_rigid_motions:
                cond_both = jnp.concatenate([
                    jnp.broadcast_to(cond, (n, cond.shape[-1])),
                    jnp.broadcast_to(cond_prev,
                                     (n, cond_prev.shape[-1]))],
                    axis=0)
                deform_both = self._nr_apply(
                    self.non_rigid_forward_mlp, "non_rigid_forward_mlp",
                    deform_both, cond_both, alpha)
            outputs["observe_pts"] = pts_flat
            # canonical-space forward-warp INPUTS (for offline support
            # studies; dead-code-eliminated inside the jitted step)
            outputs["cnl_pts"] = cnl_pts
            outputs["deform_pts_final"] = deform_both[:n]
            outputs["cycle_mask"] = (
                fg_mask[:, 0] > 0.005).astype(raw.dtype)
            # ---- scene-flow branch to the previous frame
            # (ref: network.py:472-501,607-644) ----
            outputs["deform_pts_prev_final"] = deform_both[n:].reshape(
                R, S, 3)
        return raw, fg_mask, outputs

    def _samples_sorted(self, batch, pts_flat, m_sR, m_T, m_sR_fwd,
                        m_T_fwd, motion_weights_vol, cond, alpha,
                        state_idx, iter_val, is_train, R, S):
        """Liveness-sorted per-sample pipeline (the TPU production
        path). `ops/pallas/lbs.bp_prepare`'s signature sort puts every
        zero-support sample in a contiguous PREFIX of the sorted array;
        the inverse kernel visits those tiles once (exact zeros) and
        the non-rigid MLP, canonical MLP, forward LBS and forward
        non-rigid MLP all skip the dead prefix with traced block
        offsets (~55% of samples on production batches,
        tools/fg_density_study.py). EXACT vs `_samples_dense`: dead
        samples are masked out of every consumer (raw * pts_mask in
        compositing, cycle_mask / human_weights in the losses — the
        same masking the reference implements with boolean indexing,
        ref network.py:503-535), so their skipped values and their
        zero cotangents change nothing; the skipped kernels' unwritten
        rows are zeroed here (jnp.where on the exact group-aligned
        boundary) before they can reach a loss.
        Returns (raw [R,S,4], fg_mask [N,1], train-branch outputs)."""
        from hosnerf_tpu.ops.pallas import lbs as plbs
        B = self.total_bones
        G = self.mweight_volume_size
        bmin = batch["cnl_bbox_min_xyz"]
        bscale = batch["cnl_bbox_scale_xyz"]
        s_, o_ = plbs._grid_affine(bmin, bscale, G)
        rg = (m_sR * s_[None, :, None]).reshape(B, 9)
        tg = m_T * s_[None, :] + o_[None, :]
        vol_qz = jnp.transpose(
            motion_weights_vol[:B], (0, 3, 2, 1)).reshape(B, G * G, G)

        dom = plbs.bp_prepare(pts_flat, rg, tg, G, B, kind="quad")
        pts_s = dom.sort_rows(pts_flat.astype(jnp.float32))
        n_pad = pts_s.shape[0]
        acc_s = plbs.inverse_core_pg_s(pts_s, rg, tg, vol_qz,
                                       *dom.tables)
        wsum_s = acc_s[:, 3:4]
        m = jnp.maximum(wsum_s, 1e-4)
        x_skel_s = (acc_s[:, :3] / m
                    - o_[None, :] * (wsum_s / m)) / s_[None, :]

        live = dom.live_row_mask() > 0     # [n_pad, 1] exact boundary

        def grad_gate(x):
            """Identity on values; zeroes DEAD-row cotangents exactly.
            Downstream kernels leave their skipped rows' dx outputs
            unwritten (garbage, possibly NaN); without this gate that
            garbage would flow back across stage boundaries. Dead rows
            carry zero cotangents in exact math, so this changes
            nothing else."""
            return jnp.where(live, x, jax.lax.stop_gradient(x))

        # ONE skip boundary for every downstream kernel (the fused-MLP
        # 1024 tile is the coarsest): rows in a finer kernel's grid but
        # below a coarser one's would otherwise consume unwritten
        # garbage.
        k0_mlp = dom.k0_for(1024)          # fused MLP kernels' tile
        if not self.ignore_non_rigid_motions:
            cnl_pts_s = self._nr_apply(
                self.non_rigid_mlp, "non_rigid_mlp",
                grad_gate(x_skel_s),
                jnp.broadcast_to(cond, (n_pad, cond.shape[-1])),
                alpha, k0=k0_mlp)
        else:
            cnl_pts_s = x_skel_s
        cnl_pts_s = grad_gate(cnl_pts_s)

        raw_s = self._canonical_raw(cnl_pts_s, state_idx, k0=k0_mlp)
        raw_s = jnp.where(live, raw_s, 0.0)
        raw = dom.unsort(raw_s).reshape(R, S, 4)
        fg_mask = dom.unsort(wsum_s)       # exact everywhere

        outputs: Dict[str, Any] = {}
        if is_train:
            p_sR_fwd, p_T_fwd, cond_prev = self._prev_transforms(
                batch, iter_val)
            deform_s, _ = plbs.forward_lbs_multi(
                cnl_pts_s,
                jnp.stack([m_sR_fwd, p_sR_fwd]),
                jnp.stack([m_T_fwd, p_T_fwd]),
                motion_weights_vol, bmin, bscale,
                k0_blocks=k0_mlp * (1024 // plbs.TILE_SH))  # aligned
            d0, d1 = grad_gate(deform_s[0]), grad_gate(deform_s[1])
            if not self.ignore_non_rigid_motions:
                d0 = self._nr_apply(
                    self.non_rigid_forward_mlp, "non_rigid_forward_mlp",
                    d0, jnp.broadcast_to(cond, (n_pad, cond.shape[-1])),
                    alpha, k0=k0_mlp)
                d1 = self._nr_apply(
                    self.non_rigid_forward_mlp, "non_rigid_forward_mlp",
                    d1,
                    jnp.broadcast_to(cond_prev,
                                     (n_pad, cond_prev.shape[-1])),
                    alpha, k0=k0_mlp)
            d0 = jnp.where(live, d0, 0.0)
            d1 = jnp.where(live, d1, 0.0)
            outputs["observe_pts"] = pts_flat
            outputs["cnl_pts"] = dom.unsort(
                jnp.where(live, cnl_pts_s, 0.0))
            outputs["deform_pts_final"] = dom.unsort(d0)
            outputs["cycle_mask"] = (
                fg_mask[:, 0] > 0.005).astype(raw.dtype)
            outputs["deform_pts_prev_final"] = dom.unsort(d1).reshape(
                R, S, 3)
        return raw, fg_mask, outputs

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, Any], iter_val, state_idx,
                 rng: Optional[jax.Array] = None, perturb: float = 1.0,
                 is_train: bool = False):
        """batch keys (shapes; all device arrays):
          rays_o, rays_d [R,3]; near, far [R,1];
          dst_Rs [B,3,3], dst_Ts [B,3], dst_posevec [75(+6)], cnl_gtfms
          [B,4,4], motion_weights_priors [B+1,G,G,G], cnl_bbox_min_xyz [3],
          cnl_bbox_scale_xyz [3], bgcolor [3];
          when is_train: dst_Rs_prev / dst_Ts_prev / dst_posevec_prev.
        Returns composited outputs + raw per-sample outputs for stage 3.
        """
        R = batch["rays_o"].shape[0]
        S = self.n_samples
        B = self.total_bones

        dst_Rs, dst_Ts = self._refine_pose(
            batch["dst_Rs"], batch["dst_Ts"],
            batch["dst_posevec"][:self.pose_embedding_size], iter_val)

        m_sR, m_T, m_sR_fwd, m_T_fwd = body_math.motion_bases(
            dst_Rs, dst_Ts, batch["cnl_gtfms"])

        motion_weights_vol = self.mweight_vol_decoder(
            batch["motion_weights_priors"])

        cond = self._nr_condition(
            batch["dst_posevec"][None, :self.nr_condition_code_size],
            iter_val)
        alpha = embedders.hann_alpha(
            iter_val, self.nr_kick_in_iter, self.nr_full_band_iter,
            self.nr_multires)

        # ---- z sampling (ref: network.py:407-423,446-448) ----
        t_vals = jnp.linspace(0.0, 1.0, S, dtype=batch["rays_o"].dtype)
        z_vals = (batch["near"] * (1.0 - t_vals)[None, :]
                  + batch["far"] * t_vals[None, :])  # [R, S]
        if is_train and perturb > 0.0 and rng is not None:
            mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
            lower = jnp.concatenate([z_vals[..., :1], mids], -1)
            rng, sub = jax.random.split(rng)
            z_vals = lower + (upper - lower) * jax.random.uniform(
                sub, z_vals.shape, dtype=z_vals.dtype)

        pts = (batch["rays_o"][:, None, :]
               + batch["rays_d"][:, None, :] * z_vals[..., None])  # [R,S,3]
        pts_flat = pts.reshape(-1, 3)

        # ---- per-sample pipeline: inverse LBS -> non-rigid -> canonical
        # MLP (+ the cycle/flow forward branches when training) ----
        if self._sparse_ok(motion_weights_vol):
            raw, fg_mask, outputs = self._samples_sorted(
                batch, pts_flat, m_sR, m_T, m_sR_fwd, m_T_fwd,
                motion_weights_vol, cond, alpha, state_idx, iter_val,
                is_train, R, S)
        else:
            raw, fg_mask, outputs = self._samples_dense(
                batch, pts_flat, m_sR, m_T, m_sR_fwd, m_T_fwd,
                motion_weights_vol, cond, alpha, state_idx, iter_val,
                is_train, R, S)
        pts_mask = fg_mask.reshape(R, S, 1)

        # ---- compositing (ref: network.py:273-299,537-538) ----
        rgb_map, acc_map, weights, depth_map = render.raw2outputs(
            raw, pts_mask, z_vals, batch["rays_d"], batch["bgcolor"])

        outputs.update({
            "rgb": rgb_map,
            "alpha": acc_map,
            "depth": depth_map,
            "weights": weights,
            # raw per-sample outputs for stage-3 composition
            # (ref: 3rd.../core/nets/human_nerf/network.py:539-558)
            "human_rgb": jax.nn.sigmoid(raw[..., :3]),
            "human_density": jax.nn.relu(raw[..., 3]),
            "newsmpl_pts": pts,
            "pts_mask": pts_mask[..., 0],
            "z_vals": z_vals,
        })
        return outputs
