"""Analytic model-FLOP count of the REFERENCE's stage-3 training step at
its production shapes — the basis for the FLOPs-ceiling baseline anchor.

The reference trains in torch f32 with no AMP (Lightning precision=32
default; no autocast anywhere — grep of the tree) on CUDA, where f32
matmul peak is 19.5 TFLOPS on an A100 (TF32 for *matmul* is OFF by
default in torch >= 1.12; requirements.txt pins torch 2.0.1). Its step
therefore CANNOT finish faster than step_flops / (MFU * 19.5e12) even on
the era's best GPU — an upper bound on reference-GPU rays/s that is
independent of the CPU-uplift assumption.

Counts only matmul/conv MACs (x2 flops), fwd x3 for backward (the
reference keeps activations — no remat — so bwd ~= 2x fwd). The inverse
LBS (26 grid_sample gathers), sorting, and compositing are gather/VPU
work with negligible matmul content on a GPU.

Shapes from the reference configs:
  3rd/configs/default.yaml:84,142-154 (2 patches x 32^2, 128 samples),
  1st gin: 3 levels 64/64/32, PropMLP 4x256, NeRFMLP 8x1024,
  state embeds 64-d, IPE 504-d (icosahedron-2 basis, max_deg 12).
"""

RAYS = 2048
S_HUM = 128
S_PROP, S_NERF = 64, 32
IPE = 504
STATE = 64
DIRENC = 27  # 3 * (1 + 2*4)


def linear(n, din, dout):
    return 2.0 * n * din * dout


def scene_mlp(n_samples, depth, width, skip_every=4, rgb=True):
    din = IPE + STATE
    f = linear(n_samples, din, width)
    cur = width
    for i in range(1, depth):
        if i % skip_every == 0:
            cur = width + din
        f += linear(n_samples, cur, width)
        cur = width
    f += linear(n_samples, width, 1)  # density head
    if rgb:
        f += linear(n_samples, width, 256)             # bottleneck
        f += linear(n_samples, 256 + DIRENC, 128)      # views_linear
        f += linear(n_samples, 128, 3)                 # rgb
    return f


def human_mlps(n_inv, n_fwd_streams):
    # canonical: input 127, 8x256, skip-concat before linear_5
    n = n_inv
    f = linear(n, 127, 256) + 3 * linear(n, 256, 256)
    f += linear(n, 127 + 256, 256) + 2 * linear(n, 256, 256)
    f += linear(n, 256, 4)
    # non-rigid (inverse leg + K forward-stream legs): input 111,
    # 6x128, skip-concat [h, embed] before linear_4
    for n_nr in (n_inv, n_fwd_streams):
        f += linear(n_nr, 111, 128) + 3 * linear(n_nr, 128, 128)
        f += linear(n_nr, 128 + 36, 128) + linear(n_nr, 128, 128)
        f += linear(n_nr, 128, 3)
    # pose decoder (per frame, 75 -> 4x256 -> two heads) — negligible
    f += 2 * (linear(1, 75, 256) + 2 * linear(1, 256, 256)
              + 2 * linear(1, 256, 256) + 2 * linear(1, 256, 75))
    return f


def vol_decoder():
    # Linear 256->1024, ConvT3d stack 1->2->4->8->16->32 with channels
    # 1024->512->512->256->256->27, k=4 s=2 p=1 (8 taps per output voxel)
    f = linear(1, 256, 1024)
    chans = [(1024, 512, 2), (512, 512, 4), (512, 256, 8),
             (256, 256, 16), (256, 27, 32)]
    for cin, cout, out_res in chans:
        f += 2.0 * (out_res ** 3) * cout * 8 * cin
    return f


def lpips_vgg(n_imgs, res):
    # VGG16 convs at 224^2 ~ 15.35 GFLOP; conv FLOPs scale with area
    return n_imgs * 15.35e9 * (res / 224.0) ** 2


def main():
    n_hum = RAYS * S_HUM
    fwd = (2 * scene_mlp(RAYS * S_PROP, 4, 256, rgb=False)
           + scene_mlp(RAYS * S_NERF, 8, 1024, rgb=True)
           + human_mlps(n_hum, 2 * n_hum)
           + vol_decoder()
           + lpips_vgg(4, 32))  # pred+target x 2 patches
    total = 3.0 * fwd  # bwd ~= 2x fwd, no remat
    print(f"reference stage-3 step (2048 rays): fwd {fwd/1e12:.3f} TFLOP, "
          f"fwd+bwd {total/1e12:.3f} TFLOP")
    peak = 19.5e12  # A100 f32 (TF32-matmul off in torch 2.0)
    for mfu in (1.0, 0.6, 0.35, 0.15):
        t = total / (peak * mfu)
        print(f"  A100 f32 @ MFU {mfu:4.0%}: {t*1e3:7.1f} ms/step -> "
              f"{RAYS/t:7.0f} rays/s/GPU")


if __name__ == "__main__":
    main()
