"""Fused GN->SiLU->conv3x3 Pallas kernel vs the shipping XLA composition.

Oracle provenance: the expected value is the package's own *already
golden-tested* composition ``conv.apply(conv_p, group_norm_silu(norm_p, x),
padding=1)`` (ops/norm.py + ops/conv.py, themselves verified against the
executed reference in tests/test_reference_exec.py) — i.e. the kernel is
tested against the independent XLA lowering of the same published math
(GroupNorm, Wu & He 2018; SiLU; SAME-pad conv), not against itself.

Interpret mode on CPU: fp32 exact to ~1e-5 (fp ordering); the bf16 path is
checked at looser tolerance (the kernel rounds (x+temb) later than the XLA
path).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.core.dtypes import FP32
from pytorch_stable_diffusion_tpu.ops import conv as conv_op
from pytorch_stable_diffusion_tpu.ops import norm
from pytorch_stable_diffusion_tpu.ops.pallas import conv as pconv


def _params(key, c_in, c_out, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    norm_p = {"scale": jax.random.normal(k1, (c_in,), dtype) * 0.2 + 1.0,
              "bias": jax.random.normal(k2, (c_in,), dtype) * 0.1}
    conv_p = conv_op.init(jax.random.fold_in(key, 3), c_in, c_out, 3,
                          dtype=dtype)
    return norm_p, conv_p


def _oracle(norm_p, conv_p, x, groups, temb=None):
    h = x if temb is None else x + temb[:, None, None, :].astype(x.dtype)
    h = norm.group_norm_silu(norm_p, h, groups, policy=FP32)
    return conv_op.apply(conv_p, h, padding=1, policy=FP32)


@pytest.mark.parametrize("shape,groups,kw", [
    ((2, 8, 8, 32), 4, {}),                       # whole-H block
    ((2, 16, 8, 32), 4, dict(block_h=4)),          # multi-H halo path
    ((4, 8, 8, 32), 4, dict(batch_group=2)),       # batch grid
    ((1, 8, 16, 64), 8, dict(co_block=32)),        # Co split
    ((2, 12, 8, 32), 4, dict(block_h=4)),          # 3 H-blocks (interior)
])
def test_matches_xla_composition(shape, groups, kw):
    key = jax.random.PRNGKey(0)
    b, h, w, c = shape
    co = kw.get("co_block", 0) * 2 or c
    norm_p, conv_p = _params(key, c, co)
    x = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    want = _oracle(norm_p, conv_p, x, groups)
    got = pconv.gn_silu_conv3x3(norm_p, conv_p, x, groups, interpret=True,
                                **kw)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_temb_folding_matches():
    """The res block's second half: stats over (h + t), t joins the shift —
    the kernel reads raw h and must equal the explicit-add composition."""
    key = jax.random.PRNGKey(7)
    b, h, w, c = 2, 8, 8, 32
    norm_p, conv_p = _params(key, c, c)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, c))
    t = jax.random.normal(jax.random.fold_in(key, 2), (b, c))
    want = _oracle(norm_p, conv_p, x, 4, temb=t)
    got = pconv.gn_silu_conv3x3(norm_p, conv_p, x, 4, temb=t,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_bf16_path_tolerance():
    key = jax.random.PRNGKey(3)
    b, h, w, c = 2, 8, 8, 32
    norm_p, conv_p = _params(key, c, c)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, c)
                          ).astype(jnp.bfloat16)
    t = jax.random.normal(jax.random.fold_in(key, 2), (b, c)
                          ).astype(jnp.bfloat16)
    want = _oracle(norm_p, conv_p, x, 4, temb=t)
    got = pconv.gn_silu_conv3x3(norm_p, conv_p, x, 4, temb=t,
                                interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def test_jit_and_grad_free_shapes():
    """jits cleanly and block chooser handles the real SD levels' shapes
    (scaled down in C to keep CPU interpret time sane)."""
    key = jax.random.PRNGKey(5)
    fn = jax.jit(functools.partial(pconv.gn_silu_conv3x3, num_groups=4,
                                   interpret=True))
    norm_p, conv_p = _params(key, 32, 32)
    x = jax.random.normal(key, (2, 16, 16, 32))
    y = fn(norm_p, conv_p, x)
    assert y.shape == (2, 16, 16, 32) and bool(jnp.isfinite(y).all())


def test_validation():
    key = jax.random.PRNGKey(0)
    norm_p, conv_p = _params(key, 32, 32)
    x = jax.random.normal(key, (2, 8, 12, 32))  # W not sublane multiple
    with pytest.raises(ValueError, match="sublane"):
        pconv.gn_silu_conv3x3(norm_p, conv_p, x, 4, interpret=True)
    x = jax.random.normal(key, (2, 8, 8, 32))
    with pytest.raises(ValueError, match="divide"):
        pconv.gn_silu_conv3x3(norm_p, conv_p, x, 4, block_h=3,
                              interpret=True)


def test_lane_alignment_gate(monkeypatch):
    """On hardware Mosaic rejects halo-DMA slices whose minor (channel)
    extent isn't 128-lane aligned ("Slice shape along dimension 3 must be
    aligned to tiling (128)" — observed live at SD's 320-ch level).
    eligible() must refuse c_in % 128 != 0 on the TPU backend, keep it on
    CPU (interpret mode has no such constraint), and the kernel entry
    must hard-error rather than hand Mosaic a doomed program."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not pconv.eligible((2, 64, 64, 320), (3, 3, 320, 320))
    assert not pconv.eligible((2, 32, 32, 960), (3, 3, 960, 960))
    assert pconv.eligible((2, 32, 32, 640), (3, 3, 640, 640))
    assert pconv.eligible((2, 16, 16, 1280), (3, 3, 1280, 1280))
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert pconv.eligible((2, 16, 16, 32), (3, 3, 32, 32))

    key = jax.random.PRNGKey(0)
    norm_p, conv_p = _params(key, 320, 320, jnp.bfloat16)
    x = jax.random.normal(key, (1, 8, 8, 320), jnp.bfloat16)
    with pytest.raises(ValueError, match="lane multiple"):
        pconv.gn_silu_conv3x3(norm_p, conv_p, x, 32, interpret=False)


def test_pipeline_conv_backend_opt_in(tiny_models, tiny_tokenizer):
    """conv_backend="pallas" routes every eligible UNet res block through
    the fused kernel (counted via a wrapper) and the image stays within a
    uint8 bin of the XLA path (fp32 CPU interpret: only fp-ordering
    differences)."""
    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config

    # 32px -> 16^2 latents -> UNet levels 16^2 and 8^2, both eligible
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=5,
              n_inference_steps=2, height=32, width=32)
    base = sdt.generate("a cat", "", config=tiny_sd_config(), **kw)

    calls = {"n": 0}
    orig = pconv.gn_silu_conv3x3

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    pconv.gn_silu_conv3x3 = counting
    try:
        fused = sdt.generate("a cat", "",
                             config=tiny_sd_config(conv_backend="pallas"),
                             **kw)
    finally:
        pconv.gn_silu_conv3x3 = orig
    assert calls["n"] > 0, "fused kernel never engaged"
    assert np.abs(fused.astype(np.int16) - base.astype(np.int16)).max() <= 1


def test_vmem_estimate_counts_fp32_temps():
    """Round-5 queue-10 regression: the block chooser must account for the
    kernel body's live fp32 activation temporaries.  At SDXL's
    (2,32,32,640->1280) level the old estimate picked bh=32 (12.94 MiB
    est) and Mosaic's stack allocation hit 16.17 MiB — over the 16 MiB
    scoped-vmem limit on hardware.  With the temps term the chooser must
    stay under budget at a smaller block."""
    bg, bh, co = pconv._pick_blocks(2, 32, 32, 640, 1280, 2)
    assert bh <= 16, (bg, bh, co)
    est = pconv._estimate_vmem(bg, bh, 32, 640, co, 2)
    assert est <= pconv._VMEM_BUDGET
    # the estimate for the block the old chooser picked must now exceed
    # the budget (that block measured 16.17M on hardware)
    assert pconv._estimate_vmem(1, 32, 32, 640, 256, 2) > pconv._VMEM_BUDGET


@pytest.mark.parametrize("with_temb", [False, True])
def test_folded_gn_silu_matches_exact(with_temb):
    """conv_backend="fold"'s normalize: group_norm_silu_folded equals the
    exact GN->SiLU composition (same published GroupNorm math through
    fold_gn_affine, itself pinned by the kernel tests above) up to fp
    ordering in fp32."""
    key = jax.random.PRNGKey(11)
    b, h, w, c = 2, 8, 8, 32
    norm_p, _ = _params(key, c, c)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, c))
    t = jax.random.normal(jax.random.fold_in(key, 2), (b, c)) \
        if with_temb else None
    v = x if t is None else x + t[:, None, None, :]
    want = norm.group_norm_silu(norm_p, v, 4, policy=FP32)
    got = norm.group_norm_silu_folded(norm_p, x, 4, policy=FP32, temb=t)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_folded_layer_norm_matches_exact():
    """conv_backend="fold" also folds the transformer-block LayerNorms:
    fp32 stats, compute-dtype affine apply — equal to ops/norm.layer_norm
    up to fp ordering in fp32, loose tolerance in bf16."""
    key = jax.random.PRNGKey(17)
    p = {"scale": jax.random.normal(key, (32,)) * 0.2 + 1.0,
         "bias": jax.random.normal(jax.random.fold_in(key, 1), (32,)) * 0.1}
    x = jax.random.normal(jax.random.fold_in(key, 2), (2, 64, 32))
    want = norm.layer_norm(p, x, policy=FP32)
    got = norm.layer_norm_folded(p, x, policy=FP32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    xb = x.astype(jnp.bfloat16)
    got_b = norm.layer_norm_folded(p, xb, policy=FP32)
    assert got_b.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got_b, np.float32),
                               np.asarray(norm.layer_norm(p, xb, policy=FP32),
                                          np.float32), rtol=0.05, atol=0.05)


def test_folded_gn_silu_bf16_tolerance():
    key = jax.random.PRNGKey(13)
    b, h, w, c = 2, 8, 8, 32
    norm_p, _ = _params(key, c, c)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, c)
                          ).astype(jnp.bfloat16)
    want = norm.group_norm_silu(norm_p, x, 4, policy=FP32)
    got = norm.group_norm_silu_folded(norm_p, x, 4, policy=FP32)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def test_pipeline_conv_backend_fold(tiny_models, tiny_tokenizer):
    """conv_backend="fold" routes every UNet res block through the folded
    normalize (counted) and stays within a uint8 bin of the exact path in
    fp32."""
    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config

    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=5,
              n_inference_steps=2, height=32, width=32)
    base = sdt.generate("a cat", "", config=tiny_sd_config(), **kw)

    calls = {"n": 0}
    orig = norm.group_norm_silu_folded

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    norm.group_norm_silu_folded = counting
    try:
        folded = sdt.generate("a cat", "",
                              config=tiny_sd_config(conv_backend="fold"),
                              **kw)
    finally:
        norm.group_norm_silu_folded = orig
    assert calls["n"] > 0, "folded normalize never engaged"
    assert np.abs(folded.astype(np.int16) - base.astype(np.int16)).max() <= 1


def test_pipeline_conv_backend_pallas_fold(tiny_models, tiny_tokenizer):
    """conv_backend="pallas_fold" engages BOTH tiers: the fused res-block
    kernel where eligible AND the folded norms in the attn blocks."""
    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config

    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=5,
              n_inference_steps=2, height=32, width=32)
    base = sdt.generate("a cat", "", config=tiny_sd_config(), **kw)

    calls = {"kernel": 0, "ln": 0}
    orig_k, orig_ln = pconv.gn_silu_conv3x3, norm.layer_norm_folded

    def ck(*a, **k):
        calls["kernel"] += 1
        return orig_k(*a, **k)

    def cl(*a, **k):
        calls["ln"] += 1
        return orig_ln(*a, **k)

    pconv.gn_silu_conv3x3, norm.layer_norm_folded = ck, cl
    try:
        both = sdt.generate(
            "a cat", "", config=tiny_sd_config(conv_backend="pallas_fold"),
            **kw)
    finally:
        pconv.gn_silu_conv3x3, norm.layer_norm_folded = orig_k, orig_ln
    assert calls["kernel"] > 0 and calls["ln"] > 0, calls
    assert np.abs(both.astype(np.int16) - base.astype(np.int16)).max() <= 1


def test_pipeline_conv_backend_falls_back_on_tiling(tiny_models,
                                                    tiny_tokenizer):
    """Seamless-tiling mode pads circularly; the kernel must NOT engage
    (zero-pad would break roll equivariance)."""
    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config

    calls = {"n": 0}
    orig = pconv.gn_silu_conv3x3

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    pconv.gn_silu_conv3x3 = counting
    try:
        img = sdt.generate("a cat", "",
                           config=tiny_sd_config(conv_backend="pallas"),
                           models=tiny_models, tokenizer=tiny_tokenizer,
                           seed=5, n_inference_steps=2, height=32, width=32,
                           tiling=True)
    finally:
        pconv.gn_silu_conv3x3 = orig
    assert calls["n"] == 0
    assert img.shape == (32, 32, 3)
