"""ToMe token merging (Bolya & Hoffman 2023; tomesd / A1111 "Token
merging ratio" semantics) — ops/tome.py.

ToMe is approximate by design (merged keys lose their softmax
multiplicity), so the exactness properties tested are the ones that DO
hold: ratio 0 is off, merging exact-duplicate tokens round-trips
losslessly through merge→unmerge, the plan partitions the grid, and the
pipeline variant runs and differs from the exact one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models.config import with_tome
from pytorch_stable_diffusion_tpu.ops import tome


def test_plan_partitions_the_grid():
    dst, src, r = tome.plan(8, 8, 2, 2, ratio=0.5)
    # tomesd semantics: ratio counts TOTAL tokens (0.5 * 64 = 32)
    assert len(dst) == 16 and len(src) == 48 and r == 32
    # clamped to the src population
    assert tome.plan(8, 8, 2, 2, ratio=0.9)[2] == 47
    assert sorted(np.concatenate([dst, src]).tolist()) == list(range(64))
    # dst = top-left of each 2x2 cell
    assert set(dst.tolist()) == {i * 8 + j for i in range(0, 8, 2)
                                 for j in range(0, 8, 2)}


def test_plan_validates_stride():
    with pytest.raises(ValueError, match="stride"):
        tome.plan(7, 8, 2, 2)


def test_merge_unmerge_lossless_on_duplicates():
    """Each 2x2 cell holds 4 copies of one distinct random token; merging
    any number of them into their own cell representative is lossless."""
    rs = np.random.RandomState(0)
    h = w = 8
    c = 16
    cells = rs.randn(h // 2, w // 2, c).astype(np.float32)
    x = np.repeat(np.repeat(cells, 2, axis=0), 2, axis=1)  # (8, 8, C)
    x = np.stack([x, x * 2.0])  # batch 2, distinct scales
    xt = jnp.asarray(x.reshape(2, h * w, c))
    dst, src, r = tome.plan(h, w, 2, 2, ratio=0.75)
    merged, info = tome.merge(xt, dst, src, r)
    assert merged.shape == (2, h * w - r, c)
    back = tome.unmerge(merged, info)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xt),
                               rtol=1e-5, atol=1e-5)


def test_unmerge_broadcasts_dst_outputs():
    """After merge, transform only the dst rows; unmerged src rows must be
    untouched and merged rows must copy their dst's transformed value."""
    rs = np.random.RandomState(1)
    h = w = 4
    c = 8
    cells = rs.randn(h // 2, w // 2, c).astype(np.float32)
    x = np.repeat(np.repeat(cells, 2, axis=0), 2, axis=1)
    xt = jnp.asarray(x.reshape(1, h * w, c))
    dst, src, r = tome.plan(h, w, 2, 2, ratio=0.5)
    merged, info = tome.merge(xt, dst, src, r)
    n_keep = len(src) - r
    bumped = merged.at[:, n_keep:].add(100.0)  # bump every dst token
    back = np.asarray(tome.unmerge(bumped, info)).reshape(h, w, c)
    # dst positions and merged src positions carry the bump; each position
    # must equal its own cell value (+100 where merged/dst)
    orig = x.reshape(h, w, c)
    for i in range(h):
        for j in range(w):
            d = back[i, j] - orig[i, j]
            assert np.allclose(d, 0.0, atol=1e-5) \
                or np.allclose(d, 100.0, atol=1e-4)
    # every dst position itself was bumped
    for fi in dst:
        i, j = divmod(int(fi), w)
        np.testing.assert_allclose(back[i, j] - orig[i, j], 100.0,
                                   rtol=1e-5)


def test_with_tome_config():
    cfg = sdt.tiny_sd_config()
    assert with_tome(cfg, 0.0).unet.tome is None
    t = with_tome(cfg, 0.4, min_tokens=32).unet.tome
    assert t == (0.4, 2, 2, 32)
    with pytest.raises(ValueError, match="ratio"):
        with_tome(cfg, 1.0)


def test_pipeline_tome_runs_and_differs(tiny_cfg, tiny_models,
                                        tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, height=16,
              width=16, n_inference_steps=2, seed=3, return_latents=True)
    base_img, base_lat = sdt.generate("a photo of a dog", config=tiny_cfg,
                                      **kw)
    # tiny latent grid is 8x8 = 64 tokens; threshold 16 turns ToMe on
    img, lat = sdt.generate("a photo of a dog",
                            config=with_tome(tiny_cfg, 0.5, min_tokens=16),
                            **kw)
    assert img.shape == base_img.shape
    assert np.abs(lat - base_lat).max() > 1e-5
    # threshold above the grid: ToMe compiles to the exact graph
    same_img, same_lat = sdt.generate(
        "a photo of a dog",
        config=with_tome(tiny_cfg, 0.5, min_tokens=4096), **kw)
    np.testing.assert_array_equal(same_lat, base_lat)


def test_pipeline_tome_kwarg(tiny_cfg, tiny_models, tiny_tokenizer):
    with pytest.raises(ValueError, match="ratio"):
        sdt.generate("a dog", models=tiny_models, tokenizer=tiny_tokenizer,
                     config=tiny_cfg, height=16, width=16,
                     n_inference_steps=2, tome_ratio=1.5)
