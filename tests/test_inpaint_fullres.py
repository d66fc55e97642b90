"""A1111 "inpaint at full resolution" (api.StableDiffusion.inpaint
full_res=True): crop the mask's padded bounding box, inpaint the crop at
the full processing resolution, downscale and blend back into the original.

No reference analog (the reference has no inpainting at all); host-side
choreography around the one compiled inpaint program, so the compiled
shape stays fixed regardless of the source image size.
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt

SRC = 64          # source image resolution
PROC = 32         # processing resolution (the compiled shape)


@pytest.fixture(scope="module")
def sd(tiny_models, tiny_tokenizer, tiny_cfg):
    return sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)


def _src():
    rs = np.random.RandomState(0)
    img = rs.uniform(0, 255, (SRC, SRC, 3)).astype(np.uint8)
    mask = np.zeros((SRC, SRC), np.float32)
    mask[20:32, 24:36] = 1.0  # small box well inside the image
    return img, mask


def test_fullres_keeps_outside_and_repaints_inside(sd):
    img, mask = _src()
    out = sd.inpaint("a cat", img, mask, full_res=True, full_res_padding=8,
                     height=PROC, width=PROC, n_inference_steps=2, seed=0)
    assert out.shape == (SRC, SRC, 3)
    assert out.dtype == np.uint8
    # far outside the padded crop: bit-identical to the source
    np.testing.assert_array_equal(out[:8], img[:8])
    np.testing.assert_array_equal(out[-8:], img[-8:])
    np.testing.assert_array_equal(out[:, :8], img[:, :8])
    # the masked region actually changed
    changed = np.abs(out[20:32, 24:36].astype(int)
                     - img[20:32, 24:36].astype(int))
    assert changed.mean() > 2


def test_fullres_crop_tracks_mask_position(sd):
    img, _ = _src()
    mask2 = np.zeros((SRC, SRC), np.float32)
    mask2[4:12, 4:12] = 1.0  # corner box
    out = sd.inpaint("a cat", img, mask2, full_res=True, full_res_padding=4,
                     height=PROC, width=PROC, n_inference_steps=2, seed=0)
    # opposite corner untouched
    np.testing.assert_array_equal(out[40:, 40:], img[40:, 40:])
    assert np.abs(out[4:12, 4:12].astype(int)
                  - img[4:12, 4:12].astype(int)).mean() > 2


def test_fullres_empty_mask_falls_back(sd):
    img = np.random.RandomState(1).uniform(
        0, 255, (PROC, PROC, 3)).astype(np.uint8)
    mask = np.zeros((PROC, PROC), np.float32)
    out = sd.inpaint("a cat", img, mask, full_res=True, height=PROC,
                     width=PROC, n_inference_steps=2, seed=0)
    # nothing to repaint: latent-blend keeps the whole image (up to the
    # VAE encode/decode round trip baked into the final exact projection)
    assert out.shape == (PROC, PROC, 3)


def test_fullres_mask_shape_mismatch_rejected(sd):
    img, _ = _src()
    with pytest.raises(ValueError, match="mask shape"):
        sd.inpaint("a cat", img, np.ones((8, 8), np.float32), full_res=True,
                   height=PROC, width=PROC, n_inference_steps=2)


# ------------------------------------------------------------- outpainting
def test_outpaint_grows_canvas_and_keeps_original(sd):
    img = (np.random.RandomState(5).uniform(0, 255, (PROC, PROC, 3))
           .astype(np.uint8))
    out = sd.outpaint("a cat", img, pixels=8, directions=("right", "down"),
                      n_inference_steps=2, seed=0, mask_blur=0)
    assert out.shape == (PROC + 8, PROC + 8, 3)
    # latent-blend inpaint keeps the original region through the VAE round
    # trip; with mask_blur=0 the kept area is sharply preserved
    kept = out[: PROC - 4, : PROC - 4].astype(np.float64)
    orig = img[: PROC - 4, : PROC - 4].astype(np.float64)
    # random-weight VAE is lossy; just require strong agreement vs the
    # repainted band being different
    new_band = out[:, PROC + 2:].astype(np.float64)
    fill_band = np.repeat(img[:, -1:][: PROC], 6, axis=1).astype(np.float64)
    assert np.mean(np.abs(kept - orig)) < np.mean(np.abs(new_band[:PROC]
                                                         - fill_band)) + 60


def test_outpaint_validates(sd):
    with pytest.raises(ValueError, match="directions"):
        sd.outpaint("a cat", np.zeros((PROC, PROC, 3), np.uint8),
                    directions=())
    with pytest.raises(ValueError, match="multiple"):
        sd.outpaint("a cat", np.zeros((PROC, PROC, 3), np.uint8), pixels=3,
                    directions=("right",))


def test_mask_blur_softens_boundary(sd, tiny_models, tiny_tokenizer,
                                    tiny_cfg):
    img = np.zeros((PROC, PROC, 3), np.uint8)
    mask = np.zeros((PROC, PROC), np.float32)
    mask[:, PROC // 2:] = 1.0
    kw = dict(n_inference_steps=2, seed=0, height=PROC, width=PROC)
    hard = sd.inpaint("a cat", img, mask, **kw)
    soft = sd.inpaint("a cat", img, mask, mask_blur=3, **kw)
    assert hard.shape == soft.shape == (PROC, PROC, 3)
    assert (hard != soft).any()


def test_near_black_uint8_not_rescaled():
    """Regression: a uint8 image whose max pixel is 1 must stay near-black
    (the [0,1]-float rescale heuristic only applies to float inputs)."""
    from pytorch_stable_diffusion_tpu.api import _to_rgb_float

    img = np.zeros((4, 4, 3), np.uint8)
    img[0, 0] = 1
    out = _to_rgb_float(img)
    assert out.max() == 1.0  # NOT blown up to 255
    outf = _to_rgb_float(img.astype(np.float32) / 255.0)
    assert abs(outf.max() - 1.0) < 1e-5  # float [0,1] rescaled to 0..255


# -------------------------------------------------------- masked content
def test_fill_masked_content(sd):
    img = np.zeros((PROC, PROC, 3), np.uint8)
    img[:, : PROC // 2] = 200                     # bright left half
    mask = np.zeros((PROC, PROC), np.float32)
    mask[8:16, 20:28] = 1.0                       # mask inside dark half
    filled = sd._fill_masked(img, mask)
    # unmasked pixels untouched
    np.testing.assert_array_equal(filled[:, : PROC // 2],
                                  img[:, : PROC // 2])
    # masked region pulled toward the surrounding/unmasked statistics
    assert filled[8:16, 20:28].mean() > img[8:16, 20:28].mean() + 10
    # end-to-end: fill mode runs and differs from original mode
    kw = dict(n_inference_steps=2, seed=0, height=PROC, width=PROC,
              strength=0.6)
    a = sd.inpaint("a cat", img, mask, masked_content="fill", **kw)
    b = sd.inpaint("a cat", img, mask, **kw)
    assert (a != b).any()
    with pytest.raises(ValueError, match="masked_content"):
        sd.inpaint("a cat", img, mask, masked_content="latent", **kw)
