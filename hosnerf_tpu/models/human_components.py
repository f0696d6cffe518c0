"""Component networks of the human-object model (stage 2).

Each mirrors a reference component 1:1 in parameterization (so torch
checkpoints can be imported) while evaluating as dense batched matmuls:

* CanonicalMLP    (ref: 2nd.../core/nets/human_nerf/canonical_mlps/
                   mlp_rgb_sigma.py:16-58)
* NonRigidMLP     (ref: .../non_rigid_motion_mlps/mlp_offset.py:16-71 and
                   mlp_forward_offset.py — identical shapes)
* BodyPoseRefiner (ref: .../pose_decoders/mlp_delta_body_pose.py:14-73)
* MotionWeightVolumeDecoder + ConvDecoder3D
                  (ref: .../mweight_vol_decoders/deconv_vol_decoder.py:17-41,
                   core/utils/network_util.py:21-59)

The transposed 3D convolutions are expressed as `lax.conv_general_dilated`
with lhs_dilation (fractionally-strided conv) — the XLA-native form of
ConvTranspose3d(k=4, s=2, p=1) — with kernels stored DHWIO.
"""

from __future__ import annotations

import math
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from typing import Optional

from hosnerf_tpu.models.layers import (TorchLinear, small_uniform,
                                       xavier_uniform_gain)

RELU_GAIN = math.sqrt(2.0)
LEAKY02_GAIN = math.sqrt(2.0 / (1.0 + 0.2**2))


def _deconv_impl() -> str:
    """Transposed-conv execution strategy. 'conv' = XLA lhs-dilated conv
    (MXU-native; the TPU production path — the phase form's 64 shifted
    slab views per layer are pure HBM/pad-adjoint overhead there);
    'phase' = phase-decomposed matmuls (the CPU path: XLA-CPU executes
    lhs-dilated 3D convs with a naive loop, 18.6 s backward at decoder
    sizes). Env HOSNERF_DECONV_IMPL ∈ {auto, conv, phase} overrides."""
    impl = os.environ.get("HOSNERF_DECONV_IMPL", "auto")
    if impl == "auto":
        return "conv" if jax.default_backend() == "tpu" else "phase"
    return impl


class CanonicalMLP(nn.Module):
    """Canonical rgb+sigma MLP: depth x width, skip-concat of the input
    (order [pos_embed, h]) BEFORE overall linear index `skip + 1` — the
    reference counts its skip index over layers 2..depth, so skips=[4]
    places the concat before the 6th linear (ref: mlp_rgb_sigma.py:31-38:
    the loop `for i in range(mlp_depth-1)` adds layers AFTER the first)."""

    mlp_depth: int = 8
    mlp_width: int = 256
    skips: Sequence[int] = (4,)
    # trunk computation dtype (params stay f32); the rgb+sigma output
    # layer always runs f32
    compute_dtype: "Optional[jnp.dtype]" = None

    @nn.compact
    def __call__(self, pos_embed):
        if self.compute_dtype is not None:
            pos_embed = pos_embed.astype(self.compute_dtype)
        h = pos_embed
        for i in range(self.mlp_depth):
            if i > 0 and (i - 1) in self.skips:
                h = jnp.concatenate([pos_embed, h], axis=-1)
            h = TorchLinear(self.mlp_width,
                            kernel_init=xavier_uniform_gain(RELU_GAIN),
                            bias_init_fan_in=False, dtype=self.compute_dtype,
                            name=f"linear_{i}")(h)
            h = jax.nn.relu(h)
        h = h.astype(jnp.float32)
        return TorchLinear(4, kernel_init=xavier_uniform_gain(1.0),
                           bias_init_fan_in=False, name="output")(h)


class NonRigidMLP(nn.Module):
    """Non-rigid offset MLP: input [condition_code, pos_embed]; skip layers
    re-concat pos_embed (order [h, pos_embed] — ref: mlp_offset.py:55-66);
    last layer init U(+-1e-5) so offsets start near zero."""

    mlp_depth: int = 6
    mlp_width: int = 128
    skips: Sequence[int] = (4,)
    # trunk computation dtype (params stay f32); the offset output layer
    # always runs f32 (its +-1e-5 init scale needs f32 inputs)
    compute_dtype: "Optional[jnp.dtype]" = None

    @nn.compact
    def __call__(self, pos_embed, pos_xyz, condition_code):
        if self.compute_dtype is not None:
            pos_embed = pos_embed.astype(self.compute_dtype)
            condition_code = condition_code.astype(self.compute_dtype)
        h = jnp.concatenate([condition_code, pos_embed], axis=-1)
        for i in range(self.mlp_depth):
            if i in self.skips and i > 0:
                h = jnp.concatenate([h, pos_embed], axis=-1)
            h = TorchLinear(self.mlp_width,
                            kernel_init=xavier_uniform_gain(RELU_GAIN),
                            bias_init_fan_in=False, dtype=self.compute_dtype,
                            name=f"linear_{i}")(h)
            h = jax.nn.relu(h)
        h = h.astype(jnp.float32)
        trans = TorchLinear(3, kernel_init=small_uniform(1e-5),
                            bias_init_fan_in=False, name="output")(h)
        return {"xyz": pos_xyz + trans, "offsets": trans}


class BodyPoseRefiner(nn.Module):
    """posevec -> shared trunk -> (delta R via Rodrigues, delta T) for
    total_bones-1 refined bones (ref: mlp_delta_body_pose.py:14-73)."""

    total_bones: int = 26
    mlp_width: int = 256
    mlp_depth: int = 4

    @nn.compact
    def __call__(self, posevec):
        from hosnerf_tpu.core.body import rodrigues

        refined = self.total_bones - 1
        h = posevec
        for i in range(self.mlp_depth - 1):
            h = TorchLinear(self.mlp_width,
                            kernel_init=xavier_uniform_gain(RELU_GAIN),
                            bias_init_fan_in=False,
                            name=f"trunk_{i}")(h)
            h = jax.nn.relu(h)

        hr = jax.nn.relu(TorchLinear(
            self.mlp_width, kernel_init=xavier_uniform_gain(RELU_GAIN),
            bias_init_fan_in=False, name="head_r_0")(h))
        rvec = TorchLinear(3 * refined, kernel_init=small_uniform(1e-5),
                           bias_init_fan_in=False, name="head_r_out")(hr)

        ht = jax.nn.relu(TorchLinear(
            self.mlp_width, kernel_init=xavier_uniform_gain(RELU_GAIN),
            bias_init_fan_in=False, name="head_t_0")(h))
        tvec = TorchLinear(3 * refined, kernel_init=small_uniform(1e-5),
                           bias_init_fan_in=False, name="head_t_out")(ht)

        Rs = rodrigues(rvec.reshape(rvec.shape[:-1] + (refined, 3)))
        Ts = tvec.reshape(tvec.shape[:-1] + (refined, 3))
        return {"Rs": Rs, "Ts": Ts}


def _blockwise_transposed_conv_init(gain: float, ksize_eff: int):
    """xavier-uniform for a DHWIO transposed-conv kernel, with the
    reference's blockwise tie: values constant over each 2x2x2 kernel cell
    (ref: network_util.py:262-283), making the initial op ~nearest-neighbor
    upsampling."""

    def init(key, shape, dtype=jnp.float32):
        kd, kh, kw, cin, cout = shape
        std = gain * math.sqrt(2.0 / ((cin + cout) * ksize_eff))
        bound = std * math.sqrt(3.0)
        base = jax.random.uniform(
            key, ((kd + 1) // 2, (kh + 1) // 2, (kw + 1) // 2, cin, cout),
            dtype, -bound, bound)
        return jnp.repeat(jnp.repeat(jnp.repeat(base, 2, 0), 2, 1),
                          2, 2)[:kd, :kh, :kw]

    return init


class ConvTranspose3dTorch(nn.Module):
    """ConvTranspose3d(k=4, s=2, p=1) with torch semantics on NDHWC inputs:
    output spatial size = 2x input.

    Implemented as a PHASE-DECOMPOSED MATMUL rather than an lhs-dilated
    conv: each of the 8 output phases (parities of the output index per
    dim) receives exactly 2 taps per dimension, so

        y[2i+p] = K[2-2p? see map] terms ->
        p=0: y[2i]   = K[0] x[i-1] + K[2] x[i]
        p=1: y[2i+1] = K[1] x[i]   + K[3] x[i+1]

    per dimension; in 3D each phase is one [N^3, 8*cin] @ [8*cin, cout]
    matmul over shifted views, then the phases interleave by reshape.
    Numerically identical to the dilated conv (same parameters, same
    contraction, reassociated). Why: XLA's CPU backend executes the
    lhs-dilated 3D conv with a naive loop — measured 11.7 s forward /
    18.6 s backward for the final decoder layer alone — and the matmul
    form is also the MXU-native shape on TPU."""

    features: int
    gain: float = LEAKY02_GAIN
    # computation dtype for the phase matmuls (params stay f32): bf16
    # runs them at the MXU's full rate (the production default via the
    # model's compute_dtype); None = f32 with HIGHEST precision — the
    # golden-equivalence mode.
    compute_dtype: "jnp.dtype | None" = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = 4
        ksize_eff = k * k * k // 8  # ref xaviermultiplier for stride-2 CT3d
        kernel = self.param(
            "kernel", _blockwise_transposed_conv_init(self.gain, ksize_eff),
            (k, k, k, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        if _deconv_impl() == "conv":
            # Native lhs-dilated conv — the TPU production path. The
            # stored kernel already indexes taps in conv orientation
            # (the phase map's t = 2a + p), so NO spatial flip:
            #   y[2i]   = K[0] x[i-1] + K[2] x[i]
            #   y[2i+1] = K[1] x[i]   + K[3] x[i+1]
            # per dim == conv(dilate(x, 2), K, pad k-1-p = 2). Measured
            # on v5e (tools/bench_deconv.py, decoder fwd+bwd bf16):
            # 4.58 ms vs 4.88 phase — both launch-bound at these tiny
            # volumes; conv wins slightly and runs ~60 fewer ops.
            # Parity vs the phase form: tests/test_human_model.py.
            lhs, rhs = x, kernel
            kw = {}
            if self.compute_dtype is not None:
                # bf16 in/out: the MXU accumulates f32 internally and
                # rounds only at the output write; preferred_element_type
                # =f32 would make the conv's VJP mix bf16 operands with
                # f32 cotangents (rejected by lax). Upcast after.
                lhs = lhs.astype(self.compute_dtype)
                rhs = rhs.astype(self.compute_dtype)
            else:
                kw["precision"] = jax.lax.Precision.HIGHEST
            y = jax.lax.conv_general_dilated(
                lhs, rhs, window_strides=(1, 1, 1),
                padding=[(2, 2)] * 3, lhs_dilation=(2, 2, 2),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), **kw)
            return y.astype(jnp.float32) + bias
        n, d, h, w = x.shape[0], x.shape[1], x.shape[2], x.shape[3]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

        # per-dim tap map: phase p reads input shifts (a + p) for a in
        # {0, 1} against kernel rows t = 2a + p — i.e. phase 0 reads
        # (x[i-1], x[i]) with rows (0, 2), phase 1 reads (x[i], x[i+1])
        # with rows (1, 3). Because t = 2a + p, ALL eight phase weight
        # matrices are one reshape+transpose of the kernel — no
        # per-row gathers (whose adjoint scatters kernel-sized pad
        # chains: 9 pads over the [4,4,4,1024,512] grad measured 78 s
        # of the virtual-8-device CPU dryrun step, and a few ms/step
        # on TPU).
        kr = kernel.reshape(2, 2, 2, 2, 2, 2, cin, self.features)
        # (az,pz, ay,py, ax,px, ci, co) -> (pz,py,px, az,ay,ax, ci, co)
        rhs_all = jnp.transpose(kr, (1, 3, 5, 0, 2, 4, 6, 7)).reshape(
            8, 8 * cin, self.features)

        phases = []
        for pz in (0, 1):
            for py in (0, 1):
                for px in (0, 1):
                    slabs = []
                    for az in (0, 1):
                        for ay in (0, 1):
                            for ax in (0, 1):
                                slabs.append(jax.lax.dynamic_slice(
                                    xp, (0, az + pz, ay + py, ax + px, 0),
                                    (n, d, h, w, cin)))
                    lhs = jnp.concatenate(slabs, axis=-1)
                    rhs = rhs_all[(pz * 2 + py) * 2 + px]
                    if self.compute_dtype is not None:
                        lhs = lhs.astype(self.compute_dtype)
                        rhs = rhs.astype(self.compute_dtype)
                        phases.append(jnp.einsum(
                            "ndhwc,co->ndhwo", lhs, rhs,
                            preferred_element_type=jnp.float32))
                    else:
                        phases.append(jnp.einsum(
                            "ndhwc,co->ndhwo", lhs, rhs,
                            precision=jax.lax.Precision.HIGHEST))
        # [2(pz),2(py),2(px), n,d,h,w,co] -> interleave into (2d,2h,2w)
        y = jnp.stack(phases, 0).reshape(
            2, 2, 2, n, d, h, w, self.features)
        y = jnp.transpose(y, (3, 4, 0, 5, 1, 6, 2, 7)).reshape(
            n, 2 * d, 2 * h, 2 * w, self.features)
        return y + bias


class ConvDecoder3D(nn.Module):
    """Embedding -> Linear(1024) -> 5 stacked stride-2 transposed convs ->
    [B, vol, vol, vol, voxel_channels] (channels-last).
    ref: network_util.py:21-59."""

    volume_size: int = 32
    voxel_channels: int = 27
    compute_dtype: "jnp.dtype | None" = None

    @nn.compact
    def __call__(self, embedding):
        h = TorchLinear(1024, kernel_init=xavier_uniform_gain(LEAKY02_GAIN),
                        bias_init_fan_in=False, name="block_mlp")(embedding)
        h = jax.nn.leaky_relu(h, 0.2)
        h = h.reshape(h.shape[:-1] + (1, 1, 1, 1024))

        inch, outch = 1024, 512
        plan = []
        for _ in range(int(np.log2(self.volume_size)) - 1):
            plan.append(outch)
            if inch == outch:
                outch = inch // 2
            else:
                inch = outch
        for i, feats in enumerate(plan):
            h = ConvTranspose3dTorch(feats, compute_dtype=self.compute_dtype,
                                     name=f"deconv_{i}")(h)
            h = jax.nn.leaky_relu(h, 0.2)
        h = ConvTranspose3dTorch(self.voxel_channels, gain=1.0,
                                 compute_dtype=self.compute_dtype,
                                 name="deconv_out")(h)
        return h


class MotionWeightVolumeDecoder(nn.Module):
    """Learnable 256-d constant -> ConvDecoder3D -> softmax(decoded +
    log(priors)) motion weight volume [total_bones+1, G, G, G].
    ref: deconv_vol_decoder.py:17-41."""

    embedding_size: int = 256
    volume_size: int = 32
    total_bones: int = 26
    compute_dtype: "jnp.dtype | None" = None

    @nn.compact
    def __call__(self, motion_weights_priors):
        """motion_weights_priors: [total_bones+1, G, G, G] (channels first,
        matching the data pipeline). Returns the same layout."""
        embedding = self.param("const_embedding",
                               nn.initializers.normal(stddev=1.0),
                               (self.embedding_size,))
        decoded = ConvDecoder3D(
            volume_size=self.volume_size,
            voxel_channels=self.total_bones + 1,
            compute_dtype=self.compute_dtype,
            name="decoder")(embedding[None])[0]  # [D, H, W, C]
        decoded = jnp.moveaxis(decoded, -1, 0)  # -> [C, D, H, W]
        return jax.nn.softmax(decoded + jnp.log(motion_weights_priors),
                              axis=0)
