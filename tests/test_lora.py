"""LoRA adapter merging (weights/lora.py) — kohya + PEFT formats.

The reference has no adapter story (`/root/reference/sd/model_loader.py`
loads full checkpoints only); validation is therefore against the merge
rule itself: W' = W + scale*(alpha/rank)*up@down applied in the checkpoint
layout, checked by deconverting the merged pytree back to diffusers naming
and comparing with a numpy-side merge of the raw state dict.
"""

import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.core.pytree import flatten
from pytorch_stable_diffusion_tpu.weights import diffusers as dif
from pytorch_stable_diffusion_tpu.weights import lora


RANK = 4


def _kohya_name(dotted: str) -> str:
    root, rest = dotted.split(".", 1)
    prefix = {"unet": "lora_unet_", "text_encoder": "lora_te_",
              "text_encoder_2": "lora_te2_"}[root]
    return prefix + rest.replace(".", "_")


def _pick(targets, substr):
    matches = [k for k in targets if substr in k]
    assert matches, f"no target matching {substr!r}"
    return matches[0]


def _factors(rng, dotted, targets, models):
    """Random (down, up) in torch layout for one dotted target."""
    model, dst, kind = targets[dotted][0]
    leaf = np.asarray(flatten(models[model])[dst])
    if kind == "linear":
        out_d, in_d = leaf.shape[1], leaf.shape[0]
        down = rng.standard_normal((RANK, in_d)).astype(np.float32)
        up = rng.standard_normal((out_d, RANK)).astype(np.float32)
    else:  # conv kernel HWIO -> torch (out, in, kh, kw)
        kh, kw, in_d, out_d = leaf.shape
        down = rng.standard_normal((RANK, in_d, kh, kw)).astype(np.float32)
        up = rng.standard_normal((out_d, RANK, 1, 1)).astype(np.float32)
    return down, up


@pytest.fixture(scope="module")
def targets(tiny_cfg):
    return lora._weight_targets(tiny_cfg)


@pytest.fixture(scope="module")
def picked(targets):
    return {
        "self_q": _pick(targets, "attn1.to_q"),
        "cross_out": _pick(targets, "attn2.to_out.0"),
        "geglu": _pick(targets, "ff.net.0.proj"),
        "conv": _pick(targets, "resnets.0.conv1"),
        "te_q": _pick(targets, "self_attn.q_proj"),
    }


@pytest.fixture(scope="module")
def kohya_sd(targets, picked, tiny_models):
    rng = np.random.default_rng(0)
    sd = {}
    for dotted in picked.values():
        down, up = _factors(rng, dotted, targets, tiny_models)
        name = _kohya_name(dotted)
        sd[f"{name}.lora_down.weight"] = down
        sd[f"{name}.lora_up.weight"] = up
        sd[f"{name}.alpha"] = np.float32(2.0)
    return sd


def _expected_delta(sd, name, scale):
    down = sd[f"{name}.lora_down.weight"].astype(np.float32)
    up = sd[f"{name}.lora_up.weight"].astype(np.float32)
    alpha = float(sd.get(f"{name}.alpha", down.shape[0]))
    d = (up.reshape(up.shape[0], RANK) @ down.reshape(RANK, -1)).reshape(
        (up.shape[0],) + down.shape[1:])
    return scale * (alpha / RANK) * d


def test_kohya_merge_matches_checkpoint_layout(tiny_cfg, tiny_models,
                                               kohya_sd, picked):
    scale = 0.7
    merged = lora.apply_lora(tiny_models, tiny_cfg, kohya_sd, scale)
    unet_sd0, _, te_sd0 = dif.deconvert_diffusers(tiny_models, tiny_cfg)
    unet_sd1, _, te_sd1 = dif.deconvert_diffusers(merged, tiny_cfg)
    touched = set()
    for dotted in picked.values():
        root, rest = dotted.split(".", 1)
        base, out = (unet_sd0, unet_sd1) if root == "unet" else (te_sd0, te_sd1)
        key = rest + ".weight"
        want = base[key] + _expected_delta(kohya_sd, _kohya_name(dotted), scale)
        np.testing.assert_allclose(out[key], want, rtol=2e-6, atol=2e-5,
                                   err_msg=dotted)
        touched.add((root, key))
    # everything not targeted is bit-identical
    for name, (b, m) in (("unet", (unet_sd0, unet_sd1)),
                         ("te", (te_sd0, te_sd1))):
        for k in b:
            if (("unet" if name == "unet" else "text_encoder"), k) in touched:
                continue
            np.testing.assert_array_equal(b[k], m[k], err_msg=k)


def test_peft_dotted_equals_kohya(tiny_cfg, tiny_models, kohya_sd, picked):
    peft = {}
    for dotted in picked.values():
        name = _kohya_name(dotted)
        # PEFT layout: dotted module, lora_A/lora_B, alpha == rank
        peft[f"{dotted}.lora_A.weight"] = kohya_sd[f"{name}.lora_down.weight"]
        peft[f"{dotted}.lora_B.weight"] = kohya_sd[f"{name}.lora_up.weight"]
    a = flatten(lora.apply_lora(tiny_models, tiny_cfg, peft, 1.0))
    # kohya with alpha forced to rank should match exactly
    kh = {k: (np.float32(RANK) if k.endswith(".alpha") else v)
          for k, v in kohya_sd.items()}
    b = flatten(lora.apply_lora(tiny_models, tiny_cfg, kh, 1.0))
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_scale_zero_is_identity(tiny_cfg, tiny_models, kohya_sd):
    merged = lora.apply_lora(tiny_models, tiny_cfg, kohya_sd, 0.0)
    a, b = flatten(tiny_models), flatten(merged)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_stacked_adapters_add(tiny_cfg, tiny_models, kohya_sd):
    once = flatten(lora.apply_lora(tiny_models, tiny_cfg, kohya_sd, 1.0))
    twice = flatten(lora.apply_loras(tiny_models, tiny_cfg,
                                     [(kohya_sd, 0.5), (kohya_sd, 0.5)]))
    for k in once:
        np.testing.assert_allclose(np.asarray(once[k]), np.asarray(twice[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_unknown_module_strict(tiny_cfg, tiny_models, kohya_sd):
    bad = dict(kohya_sd)
    bad["lora_unet_nonexistent_block_to_q.lora_down.weight"] = \
        np.zeros((RANK, 8), np.float32)
    bad["lora_unet_nonexistent_block_to_q.lora_up.weight"] = \
        np.zeros((8, RANK), np.float32)
    with pytest.raises(KeyError, match="no target"):
        lora.apply_lora(tiny_models, tiny_cfg, bad, 1.0)
    merged = lora.apply_lora(tiny_models, tiny_cfg, bad, 1.0, strict=False)
    ref = lora.apply_lora(tiny_models, tiny_cfg, kohya_sd, 1.0)
    a, b = flatten(merged), flatten(ref)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_unparseable_key_raises(tiny_cfg, tiny_models):
    with pytest.raises(ValueError, match="unrecognized LoRA key"):
        lora.apply_lora(tiny_models, tiny_cfg,
                        {"lora_unet_x.hada_w1_a": np.zeros((2, 2))}, 1.0)


def test_zero_matches_raises(tiny_cfg, tiny_models):
    sd = {"lora_unet_bogus.lora_down.weight": np.zeros((RANK, 4), np.float32),
          "lora_unet_bogus.lora_up.weight": np.zeros((4, RANK), np.float32)}
    with pytest.raises((ValueError, KeyError)):
        lora.apply_lora(tiny_models, tiny_cfg, sd, 1.0, strict=False)


def test_sdxl_towers_and_depth(tiny_models):
    """SDXL resolution: depth>1 transformer_blocks and the te2 tower."""
    import jax

    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod
    from pytorch_stable_diffusion_tpu.models import vae as vae_mod
    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config

    cfg = tiny_sdxl_config()
    key = jax.random.PRNGKey(3)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "clip2": clip_mod.init(jax.random.fold_in(key, 4), cfg.clip2),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    targets = lora._weight_targets(cfg)
    deep = _pick(targets, "transformer_blocks.1.attn2.to_k")
    te2 = [k for k in targets if k.startswith("text_encoder_2.")
           and "q_proj" in k][0]
    rng = np.random.default_rng(1)
    sd = {}
    for dotted in (deep, te2):
        down, up = _factors(rng, dotted, targets, models)
        name = _kohya_name(dotted)
        sd[f"{name}.lora_down.weight"] = down
        sd[f"{name}.lora_up.weight"] = up
    merged = lora.apply_lora(models, cfg, sd, 1.0)
    for dotted in (deep, te2):
        model, dst, kind = targets[dotted][0]
        base = np.asarray(flatten(models[model])[dst])
        got = np.asarray(flatten(merged[model])[dst])
        assert not np.array_equal(base, got), dotted


def test_with_lora_api_changes_generation(tiny_cfg, tiny_models,
                                          tiny_tokenizer, kohya_sd):
    """StableDiffusion.with_lora produces a different (still deterministic)
    image without touching the base bundle."""
    from pytorch_stable_diffusion_tpu.api import StableDiffusion

    sd = StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)
    tuned = sd.with_lora(kohya_sd, scale=0.5)
    kw = dict(seed=11, n_inference_steps=2, height=16, width=16)
    base = sd.txt2img("a cat", **kw)
    mod = tuned.txt2img("a cat", **kw)
    assert base.shape == mod.shape and not np.array_equal(base, mod)
    np.testing.assert_array_equal(mod, tuned.txt2img("a cat", **kw))
    # base bundle untouched
    np.testing.assert_array_equal(base, sd.txt2img("a cat", **kw))
