"""ControlNet hint preprocessors (utils/annotators.py) — pure-numpy canny,
lineart, scribble, blur, invert; geometric properties validated on
synthetic shapes, plus an end-to-end hint -> ControlNet generate.
"""

import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.utils import annotators as an

H = W = 16


def _square(size=64, lo=16, hi=48):
    img = np.zeros((size, size), np.float32)
    img[lo:hi, lo:hi] = 1.0
    return img


def test_canny_finds_square_boundary():
    edges = an.canny(_square())
    assert set(np.unique(edges)) <= {0.0, 1.0}
    # edges concentrated on the square's boundary band, interior empty
    assert edges[30:34, 30:34].sum() == 0          # deep interior
    assert edges[14:19, 16:48].sum() > 20          # top boundary band
    assert edges[0:8].sum() == 0                   # far background


def test_canny_hysteresis_links_weak_edges():
    # a full-contrast square A joined to a half-contrast rectangle B:
    # B's weak boundary survives only by hysteresis linking through A's
    # strong corners; an identical-contrast but DISCONNECTED square C
    # must never fire, and with `high` above the max nothing fires
    img = np.zeros((64, 64), np.float32)
    img[8:32, 8:32] = 1.0     # A: strong edges
    img[8:32, 32:56] = 0.5    # B: weak edges, touching A
    img[44:56, 8:20] = 0.5    # C: weak edges, isolated
    linked = an.canny(img, low=0.3, high=0.8, sigma=1.0)
    strict = an.canny(img, low=0.8, high=0.8, sigma=1.0)
    no_seed = an.canny(img, low=0.3, high=1.01, sigma=1.0)
    assert no_seed.sum() == 0
    assert linked.sum() > strict.sum() > 0
    assert linked[40:60, :].sum() == 0  # C stayed dark (not linked)


def test_lineart_and_invert():
    la = an.lineart(_square())
    assert 0.0 <= la.min() and la.max() == 1.0
    assert la[30:34, 30:34].max() == 0.0  # flat interior -> no response
    inv = an.invert(np.zeros((8, 8), np.float32))
    assert (inv == 1.0).all()


def test_scribble_thickens():
    thin = an.scribble(_square(), thickness=0)
    thick = an.scribble(_square(), thickness=2)
    assert thick.sum() > thin.sum() > 0
    assert set(np.unique(thick)) <= {0.0, 1.0}


def test_blur_preserves_mean():
    rs = np.random.RandomState(0)
    img = rs.uniform(0, 1, (32, 32)).astype(np.float32)
    b = an.blur(img, sigma=2.0)
    assert abs(b.mean() - img.mean()) < 0.02
    assert b.std() < img.std()


def test_to_hint_and_rgb_roundtrip():
    rgb = (np.random.RandomState(1).uniform(0, 255, (8, 8, 3))
           .astype(np.uint8))
    g = an.to_hint(rgb)
    assert g.shape == (8, 8) and 0.0 <= g.min() and g.max() <= 1.0
    h = an.hint_rgb(g)
    assert h.shape == (8, 8, 3) and h.dtype == np.uint8


def test_hint_through_controlnet(tiny_cfg, tiny_models, tiny_tokenizer):
    import jax

    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.models import controlnet as cn

    net = cn.init(jax.random.PRNGKey(0), tiny_cfg.unet,
                  tiny_cfg.vae.downsample_factor)
    models = dict(tiny_models, controlnet=net)
    photo = (np.random.RandomState(2).uniform(0, 255, (H, W, 3))
             .astype(np.uint8))
    hint = an.hint_rgb(an.canny(photo, sigma=1.0))
    img = sdt.generate("a cat", models=models, tokenizer=tiny_tokenizer,
                       config=tiny_cfg, n_inference_steps=2, height=H,
                       width=W, seed=0, control_image=hint)
    assert img.shape == (H, W, 3)
