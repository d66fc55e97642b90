"""ESRGAN / RealESRGAN upscaler (RRDBNet) — models/esrgan.py.

Oracle: the published RRDBNet architecture re-stated in torch inside the
test, weights converted through BOTH checkpoint namings (new-arch
``conv_first.*`` and old-arch ``model.0.*``), outputs compared.
"""

import numpy as np
import pytest

import jax

from pytorch_stable_diffusion_tpu.models import esrgan
from pytorch_stable_diffusion_tpu.weights.esrgan import convert_esrgan


def _torch_rrdbnet(torch, nf, nb, gc, in_ch=3, out_ch=3):
    import torch.nn as nn
    import torch.nn.functional as F

    class RDB(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(nf, gc, 3, 1, 1)
            self.conv2 = nn.Conv2d(nf + gc, gc, 3, 1, 1)
            self.conv3 = nn.Conv2d(nf + 2 * gc, gc, 3, 1, 1)
            self.conv4 = nn.Conv2d(nf + 3 * gc, gc, 3, 1, 1)
            self.conv5 = nn.Conv2d(nf + 4 * gc, nf, 3, 1, 1)

        def forward(self, x):
            lr = lambda v: F.leaky_relu(v, 0.2)
            x1 = lr(self.conv1(x))
            x2 = lr(self.conv2(torch.cat((x, x1), 1)))
            x3 = lr(self.conv3(torch.cat((x, x1, x2), 1)))
            x4 = lr(self.conv4(torch.cat((x, x1, x2, x3), 1)))
            x5 = self.conv5(torch.cat((x, x1, x2, x3, x4), 1))
            return x5 * 0.2 + x

    class RRDB(nn.Module):
        def __init__(self):
            super().__init__()
            self.rdb1, self.rdb2, self.rdb3 = RDB(), RDB(), RDB()

        def forward(self, x):
            return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_first = nn.Conv2d(in_ch, nf, 3, 1, 1)
            self.body = nn.Sequential(*[RRDB() for _ in range(nb)])
            self.conv_body = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up1 = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up2 = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_hr = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_last = nn.Conv2d(nf, out_ch, 3, 1, 1)

        def forward(self, x):
            lr = lambda v: F.leaky_relu(v, 0.2)
            feat = self.conv_first(x)
            feat = feat + self.conv_body(self.body(feat))
            feat = lr(self.conv_up1(
                F.interpolate(feat, scale_factor=2, mode="nearest")))
            feat = lr(self.conv_up2(
                F.interpolate(feat, scale_factor=2, mode="nearest")))
            return self.conv_last(lr(self.conv_hr(feat)))

    return Net()


def test_matches_torch_oracle_new_arch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    model = _torch_rrdbnet(torch, nf=8, nb=2, gc=4).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, cfg = convert_esrgan(sd)
    assert (cfg.features, cfg.num_blocks, cfg.growth, cfg.scale) \
        == (8, 2, 4, 4)
    x = np.random.RandomState(0).rand(1, 12, 10, 3).astype(np.float32)
    ours = np.asarray(esrgan.apply(params, jax.numpy.asarray(x), cfg))
    with torch.no_grad():
        want = model(torch.tensor(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    assert ours.shape == (1, 48, 40, 3)
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


def test_old_arch_naming_converts_identically():
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    model = _torch_rrdbnet(torch, nf=8, nb=2, gc=4).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params_new, cfg = convert_esrgan(sd)

    old = {}
    for k, v in sd.items():
        if k.startswith("conv_first."):
            old[k.replace("conv_first", "model.0")] = v
        elif k.startswith("body."):
            # body.{i}.rdb{j}.conv{k}.w -> model.1.sub.{i}.RDB{j}.conv{k}.0.w
            parts = k.split(".")
            old[f"model.1.sub.{parts[1]}.{parts[2].upper().replace('RDB', 'RDB')}"
                f".{parts[3]}.0.{parts[4]}"] = v
        elif k.startswith("conv_body."):
            old[k.replace("conv_body", f"model.1.sub.{cfg.num_blocks}")] = v
        elif k.startswith("conv_up1."):
            old[k.replace("conv_up1", "model.3")] = v
        elif k.startswith("conv_up2."):
            old[k.replace("conv_up2", "model.6")] = v
        elif k.startswith("conv_hr."):
            old[k.replace("conv_hr", "model.8")] = v
        elif k.startswith("conv_last."):
            old[k.replace("conv_last", "model.10")] = v
    params_old, cfg_old = convert_esrgan(old)
    assert cfg_old == cfg
    flat_n = jax.tree_util.tree_leaves(params_new)
    flat_o = jax.tree_util.tree_leaves(params_old)
    for a, b in zip(flat_n, flat_o):
        np.testing.assert_array_equal(a, b)


def test_tiled_upscale_matches_whole():
    key = jax.random.PRNGKey(0)
    cfg = esrgan.tiny_esrgan_config()
    params = esrgan.init(key, cfg)
    img = (np.random.RandomState(2).rand(20, 24, 3) * 255).astype(np.uint8)
    whole = esrgan.upscale_image(params, img, cfg)
    tiled = esrgan.upscale_image(params, img, cfg, tile=8, tile_pad=6)
    assert whole.shape == (80, 96, 3)
    # the pad context is finite (receptive field >> 6), so allow tiny
    # off-by-one uint8 differences at tile seams
    assert np.mean(np.abs(whole.astype(int) - tiled.astype(int)) <= 1) \
        > 0.99


def test_lane_batched_tiles_match_sequential_oracle():
    """The lane-batched tile path (shape-grouped, zero-padded fixed-lane
    chunks) must reproduce the published RealESRGAN sequential tiling
    scheme: oracle = apply() per clamped patch in a host loop, exactly the
    round-4 loop this replaced.  Geometry (20x24, tile 8, pad 6) produces
    4 patch-shape classes and a lane count not divisible by tile_lanes,
    covering the grouping, the padding lanes, and the scatter."""
    key = jax.random.PRNGKey(0)
    cfg = esrgan.tiny_esrgan_config()
    params = esrgan.init(key, cfg)
    img = (np.random.RandomState(7).rand(20, 24, 3) * 255).astype(np.uint8)
    arr = img.astype(np.float32)[None] / 255.0
    s, tile, pad = cfg.scale, 8, 6
    h, w = arr.shape[1:3]
    want = np.zeros((1, h * s, w * s, 3), np.float32)
    for (y0, y1, x0, x1, py0, py1, px0, px1) in \
            esrgan._tile_metas(h, w, tile, pad):
        patch = np.asarray(esrgan.apply(
            params, jax.numpy.asarray(arr[:, py0:py1, px0:px1]), cfg),
            np.float32)
        want[:, y0 * s:y1 * s, x0 * s:x1 * s] = \
            patch[:, (y0 - py0) * s:(y1 - py0) * s,
                  (x0 - px0) * s:(x1 - px0) * s]
    want = np.clip(np.round(want * 255.0), 0, 255).astype(np.uint8)[0]

    got = esrgan.upscale_image(params, img, cfg, tile=tile, tile_pad=pad,
                               tile_lanes=3)
    # batch-position re-tiling can shift fp rounding by one uint8 bin
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    assert np.mean(got == want) > 0.99


def test_realesrgan_x2_pixel_unshuffle():
    torch = pytest.importorskip("torch")
    # scale-2 checkpoints carry 12 input channels (2x2 unshuffle)
    torch.manual_seed(3)
    model = _torch_rrdbnet(torch, nf=8, nb=1, gc=4, in_ch=12).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, cfg = convert_esrgan(sd)
    assert cfg.scale == 2
    x = np.random.RandomState(1).rand(1, 8, 8, 3).astype(np.float32)
    ours = np.asarray(esrgan.apply(params, jax.numpy.asarray(x), cfg))
    with torch.no_grad():
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        xt = torch.nn.functional.pixel_unshuffle(xt, 2)
        want = model(xt).permute(0, 2, 3, 1).numpy()
    assert ours.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


def test_api_with_upscaler_and_hires(tiny_cfg, tiny_models, tiny_tokenizer):
    import pytorch_stable_diffusion_tpu as sdt

    key = jax.random.PRNGKey(5)
    ecfg = esrgan.tiny_esrgan_config()
    eparams = esrgan.init(key, ecfg)
    sd = sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg) \
        .with_upscaler((eparams, ecfg))
    img = (np.random.RandomState(0).rand(12, 12, 3) * 255).astype(np.uint8)
    up = sd.upscale(img)
    assert up.shape == (48, 48, 3) and up.dtype == np.uint8
    out = sd.hires_fix("a cat", height=32, width=32, base_height=16,
                       base_width=16, strength=0.6,
                       upscale_method="esrgan", seed=1,
                       n_inference_steps=2)
    assert out.shape == (32, 32, 3)
    with pytest.raises(ValueError, match="upscaler"):
        sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg) \
            .upscale(img)


def test_batched_upscale_keeps_rank():
    key = jax.random.PRNGKey(1)
    cfg = esrgan.tiny_esrgan_config()
    params = esrgan.init(key, cfg)
    imgs = (np.random.RandomState(4).rand(2, 10, 12, 3) * 255) \
        .astype(np.uint8)
    out = esrgan.upscale_image(params, imgs, cfg)
    assert out.shape == (2, 40, 48, 3) and out.dtype == np.uint8
    # per-sample equality with the unbatched path
    one = esrgan.upscale_image(params, imgs[0], cfg)
    np.testing.assert_array_equal(out[0], one)
