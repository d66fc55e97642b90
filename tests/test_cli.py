"""CLI entry point (python -m pytorch_stable_diffusion_tpu) — the complete
file-driven user path: checkpoint file + tokenizer assets -> PNG on disk."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pytorch_stable_diffusion_tpu.__main__ import build_parser, main
from pytorch_stable_diffusion_tpu.weights.save import save_safetensors
from pytorch_stable_diffusion_tpu.weights.tokenizer import bytes_to_unicode


def write_tokenizer_assets(tmpdir, words):
    """Char-level vocab/merges FILES (same scheme as make_test_tokenizer)."""
    btu = bytes_to_unicode()
    vocab, merges, seen = {}, [], set()

    def add(tok):
        if tok not in vocab:
            vocab[tok] = len(vocab)

    for ch in btu.values():
        add(ch)
        add(ch + "</w>")
    for w in words:
        chars = [btu[b] for b in w.encode("utf-8")]
        chars[-1] += "</w>"
        while len(chars) > 1:
            pair = (chars[0], chars[1])
            if pair not in seen:
                seen.add(pair)
                merges.append(pair)
                add(pair[0] + pair[1])
            chars[:2] = [chars[0] + chars[1]]
    add("<|startoftext|>")
    add("<|endoftext|>")
    vocab_path = os.path.join(tmpdir, "vocab.json")
    merges_path = os.path.join(tmpdir, "merges.txt")
    with open(vocab_path, "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    with open(merges_path, "w", encoding="utf-8") as f:
        f.write("#version: test\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return vocab_path, merges_path


@pytest.fixture(scope="module")
def assets(tmp_path_factory, tiny_cfg, tiny_models):
    d = str(tmp_path_factory.mktemp("cli"))
    ckpt = os.path.join(d, "tiny.safetensors")
    save_safetensors(tiny_models, tiny_cfg, ckpt)
    vocab, merges = write_tokenizer_assets(d, ["a", "cat", "dog"])
    return d, ckpt, vocab, merges


def test_cli_txt2img(assets):
    d, ckpt, vocab, merges = assets
    out = os.path.join(d, "t2i.png")
    rc = main(["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
               "--prompt", "a cat", "--steps", "2", "--seed", "3",
               "--width", "16", "--height", "16", "--config-preset", "tiny",
               "--out", out])
    assert rc == 0 and os.path.exists(out)
    img = np.asarray(Image.open(out))
    assert img.shape == (16, 16, 3)

    # determinism: same seed -> identical file content
    out2 = os.path.join(d, "t2i_b.png")
    main(["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
          "--prompt", "a cat", "--steps", "2", "--seed", "3",
          "--width", "16", "--height", "16", "--config-preset", "tiny",
          "--out", out2])
    np.testing.assert_array_equal(img, np.asarray(Image.open(out2)))


def test_cli_img2img(assets):
    d, ckpt, vocab, merges = assets
    init = os.path.join(d, "init.png")
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
                    ).save(init)
    out = os.path.join(d, "i2i.png")
    rc = main(["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
               "--prompt", "a dog", "--image", init, "--strength", "0.7",
               "--steps", "2", "--width", "16", "--height", "16",
               "--config-preset", "tiny", "--out", out])
    assert rc == 0
    assert np.asarray(Image.open(out)).shape == (16, 16, 3)


def test_cli_parser_defaults():
    args = build_parser().parse_args(
        ["--ckpt", "c", "--vocab", "v", "--merges", "m", "--prompt", "p"])
    # reference demo anchors
    assert args.steps == 50 and args.seed == 1337
    assert args.sampler == "ddpm" and args.width == args.height == 512


def test_cli_lora(assets, tiny_cfg, tiny_models):
    """--lora merges an adapter and changes the image (scale via :suffix)."""
    from safetensors.numpy import save_file

    from pytorch_stable_diffusion_tpu.weights import lora as lora_mod

    d, ckpt, vocab, merges = assets
    targets = lora_mod._weight_targets(tiny_cfg)
    dotted = [k for k in targets if "attn2.to_q" in k][0]
    _, dst, _ = targets[dotted][0]
    from pytorch_stable_diffusion_tpu.core.pytree import flatten

    in_d, out_d = np.asarray(flatten(tiny_models["diffusion"])[dst]).shape
    rng = np.random.RandomState(5)
    name = "lora_unet_" + dotted.split(".", 1)[1].replace(".", "_")
    lora_path = os.path.join(d, "adapter.safetensors")
    save_file({
        f"{name}.lora_down.weight": rng.randn(2, in_d).astype(np.float32),
        f"{name}.lora_up.weight": rng.randn(out_d, 2).astype(np.float32),
        f"{name}.alpha": np.array(2.0, np.float32),
    }, lora_path)

    base = os.path.join(d, "lora_base.png")
    main(["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
          "--prompt", "a cat", "--steps", "2", "--seed", "3",
          "--width", "16", "--height", "16", "--config-preset", "tiny",
          "--out", base])
    out = os.path.join(d, "lora_on.png")
    rc = main(["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
               "--prompt", "a cat", "--steps", "2", "--seed", "3",
               "--width", "16", "--height", "16", "--config-preset", "tiny",
               "--lora", f"{lora_path}:0.5", "--out", out])
    assert rc == 0
    a, b = np.asarray(Image.open(base)), np.asarray(Image.open(out))
    assert a.shape == b.shape and not np.array_equal(a, b)


def test_cli_family_presets_exposed():
    """All four family presets are reachable from the CLI."""
    p = build_parser()
    a = p.parse_args(["--ckpt", "x", "--vocab", "v", "--merges", "m",
                      "--prompt", "p", "--config-preset", "sdxl"])
    assert a.config_preset == "sdxl"
    a = p.parse_args(["--ckpt", "x", "--vocab", "v", "--merges", "m",
                      "--prompt", "p", "--config-preset", "sdxl_refiner"])
    assert a.config_preset == "sdxl_refiner"


def test_cli_multi_controlnet(assets, tiny_cfg):
    """Two --controlnet/--control-image/--controlnet-scale triples drive
    the multi-ControlNet path file-to-PNG."""
    import jax
    from safetensors.numpy import save_file

    from pytorch_stable_diffusion_tpu.models import controlnet
    from pytorch_stable_diffusion_tpu.weights.convert import (
        deconvert_controlnet)

    d, ckpt, vocab, merges = assets
    cn_paths, img_paths = [], []
    for i in range(2):
        p = controlnet.init(jax.random.PRNGKey(20 + i), tiny_cfg.unet,
                            downsample_factor=tiny_cfg.vae.downsample_factor)
        sd = deconvert_controlnet(p, tiny_cfg)
        path = os.path.join(d, f"cn{i}.safetensors")
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
        cn_paths.append(path)
        img = os.path.join(d, f"hint{i}.png")
        Image.fromarray(np.random.RandomState(30 + i).randint(
            0, 256, (16, 16, 3)).astype(np.uint8)).save(img)
        img_paths.append(img)

    out = os.path.join(d, "mc.png")
    rc = main(["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
               "--prompt", "a cat", "--steps", "2", "--seed", "3",
               "--width", "16", "--height", "16", "--config-preset", "tiny",
               "--controlnet", cn_paths[0], "--controlnet", cn_paths[1],
               "--control-image", img_paths[0],
               "--control-image", img_paths[1],
               "--controlnet-scale", "1.0", "--controlnet-scale", "0.5",
               "--out", out])
    assert rc == 0 and os.path.exists(out)
    assert np.asarray(Image.open(out)).shape == (16, 16, 3)

    # mismatched counts fail loudly
    with pytest.raises(SystemExit):
        main(["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
              "--prompt", "a cat", "--config-preset", "tiny",
              "--controlnet", cn_paths[0], "--controlnet", cn_paths[1],
              "--control-image", img_paths[0], "--out", out])
    # --reference-mode without --reference-image is a typo'd invocation,
    # not a silent plain generation (ADVICE r3)
    with pytest.raises(SystemExit, match="reference-image"):
        main(["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
              "--prompt", "a cat", "--config-preset", "tiny",
              "--reference-mode", "adain", "--out", out])


def test_cli_zero_snr_and_new_samplers(assets):
    """--zero-snr + --spacing trailing + --sampler plms/lcm drive through
    the file path; flags actually change the output."""
    d, ckpt, vocab, merges = assets
    base = ["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
            "--prompt", "a dog", "--steps", "2", "--width", "16",
            "--height", "16", "--config-preset", "tiny"]
    out_a = os.path.join(d, "zs_a.png")
    rc = main(base + ["--sampler", "plms", "--out", out_a])
    assert rc == 0
    out_b = os.path.join(d, "zs_b.png")
    rc = main(base + ["--sampler", "plms", "--zero-snr",
                      "--spacing", "trailing", "--guidance-rescale", "0.7",
                      "--out", out_b])
    assert rc == 0
    a = np.asarray(Image.open(out_a))
    b = np.asarray(Image.open(out_b))
    assert a.shape == b.shape == (16, 16, 3) and (a != b).any()
    out_c = os.path.join(d, "zs_c.png")
    rc = main(base + ["--sampler", "lcm", "--no-cfg", "--out", out_c])
    assert rc == 0


def test_cli_png_infotext(assets):
    """A1111 infotext: PNGs carry a 'parameters' tEXt chunk with the
    generation settings."""
    d, ckpt, vocab, merges = assets
    out = os.path.join(d, "meta.png")
    rc = main(["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
               "--prompt", "a cat", "--uncond-prompt", "a dog",
               "--steps", "2", "--seed", "9", "--width", "16",
               "--height", "16", "--config-preset", "tiny", "--out", out])
    assert rc == 0
    meta = Image.open(out).text
    assert "parameters" in meta
    p = meta["parameters"]
    assert p.startswith("a cat")
    assert "Negative prompt: a dog" in p
    assert "Seed: 9" in p and "Steps: 2" in p and "Size: 16x16" in p


def test_cli_color_correction(assets):
    d, ckpt, vocab, merges = assets
    init = os.path.join(d, "cc_init.png")
    rng = np.random.RandomState(1)
    Image.fromarray(rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
                    ).save(init)
    out = os.path.join(d, "cc.png")
    rc = main(["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
               "--prompt", "a dog", "--image", init, "--strength", "0.7",
               "--steps", "2", "--width", "16", "--height", "16",
               "--config-preset", "tiny", "--color-correction",
               "--out", out])
    assert rc == 0
    got = np.asarray(Image.open(out)).astype(np.float64)
    ref = np.asarray(Image.open(init)).astype(np.float64)
    # histogram-matched output: per-channel means track the init image
    assert np.abs(got.mean(axis=(0, 1)) - ref.mean(axis=(0, 1))).max() < 12


def test_cli_fast_preset(assets):
    """--fast applies the measured hypertile+deepcache bundle: image
    produced; hypertile engages at the config level (min-token threshold
    keeps tiny 16px latents un-tiled, so check the config wiring) and
    deepcache defaults to 3 unless --deepcache is explicit."""
    d, ckpt, vocab, merges = assets
    out = os.path.join(d, "fast.png")
    rc = main(["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
               "--prompt", "a cat", "--steps", "3", "--seed", "3",
               "--width", "16", "--height", "16", "--config-preset", "tiny",
               "--fast", "--out", out])
    assert rc == 0 and os.path.exists(out)
    assert np.asarray(Image.open(out)).shape == (16, 16, 3)


def test_fast_preset_helper():
    from pytorch_stable_diffusion_tpu.models.config import (fast_preset,
                                                            sd15_config)

    cfg, kw = fast_preset(sd15_config())
    assert cfg.unet.hypertile[0] == 32
    assert kw == {"deepcache": 3}
