"""One-command real-weight validation matrix (round 4, VERDICT #5/#8).

This environment has no egress, so every family ships validated against
synthetic weights + torch/transformers oracles.  The day checkpoints CAN be
fetched, this script takes their paths and emits the full validation table
against BASELINE.json's bar (image/latent PSNR > 40 dB where an executable
oracle exists; structural checks otherwise).

Artifacts to fetch (gitignored; see also examples/inference_demo.py):
  --sd15        v1-5-pruned-emaonly.safetensors (or .ckpt)
                huggingface.co/stable-diffusion-v1-5/stable-diffusion-v1-5
  --vocab/--merges  CLIP tokenizer vocab.json + merges.txt from the same
                repo (tokenizer/ subfolder)
  --sd21        v2-1_768-ema-pruned.safetensors  (stabilityai/stable-diffusion-2-1)
  --sdxl        sd_xl_base_1.0.safetensors       (stabilityai/stable-diffusion-xl-base-1.0)
  --refiner     sd_xl_refiner_1.0.safetensors    (stabilityai/stable-diffusion-xl-refiner-1.0)
  --lora        any SD-1.5/SDXL LoRA .safetensors (kohya or diffusers layout)
  --controlnet  control_v11p_sd15_canny.pth      (lllyasviel/ControlNet-v1-1)
  --ip-adapter  ip-adapter_sd15.safetensors      (h94/IP-Adapter)
  --clip-vision CLIP-ViT-H-14 image encoder state dict (same repo, models/)
  --esrgan      RealESRGAN_x4plus.pth / ESRGAN RRDBNet .pth
  --lcm         LCM-LoRA or LCM distilled UNet (latent-consistency/...)

Oracles per leg:
  sd15     the EXECUTED reference (/root/reference/sd) loaded with the SAME
           checkpoint, every torch.Generator draw captured and replayed
           through our fixed-noise pipeline (the tests/record_reference_
           pipeline.py machinery) -> latent + uint8-image PSNR vs the
           40 dB bar at the demo anchor settings (seed 1337, cfg 5, DDPM).
  esrgan   the tests' independent torch RRDBNet re-derivation loaded with
           the same weights -> output PSNR (> 40 dB bar).
  others   no executable offline oracle (the reference is SD-1.5-only and
           diffusers is not installed): load through our converters
           (coverage is exact by construction — converters reject leftover
           keys), generate, and check finiteness, determinism, and that the
           adapter visibly conditions the output.  PNGs are written to
           --out for visual inspection.

Dry run (no downloads needed; proves the harness end-to-end):
    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python \
        examples/validate_real_weights.py --dry-run
synthesizes the deterministic full-size SD-1.5 checkpoint on disk and runs
the sd15 leg against the executed reference at 128^2 / 3 steps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
for p in (_REPO, os.path.join(_REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np  # noqa: E402

ROWS = []


def row(artifact, check, value, bar, ok):
    ROWS.append({"artifact": artifact, "check": check, "value": value,
                 "bar": bar, "ok": bool(ok)})
    print(f"  [{'PASS' if ok else 'FAIL'}] {artifact}: {check} = {value} "
          f"(bar: {bar})", flush=True)


def psnr(a, b, peak=None):
    # The BASELINE.json metric — same implementation as the test suite's
    # (utils/metrics.py), so the 40 dB bar here cannot drift from it.
    from pytorch_stable_diffusion_tpu.utils.metrics import psnr as _psnr
    return _psnr(a, b, peak=peak)


def save_png(img, path):
    try:
        from PIL import Image  # noqa: WPS433

        Image.fromarray(np.asarray(img, np.uint8)).save(path)
        print(f"  wrote {path}", flush=True)
    except ImportError:
        np.save(path + ".npy", np.asarray(img))
        print(f"  (no PIL) wrote {path}.npy", flush=True)


# --------------------------------------------------------------- sd15 leg
def leg_sd15(args):
    """Full-fidelity leg: executed reference vs our fixed-noise replay."""
    import torch

    import record_reference_pipeline as rec
    from pytorch_stable_diffusion_tpu import pipeline
    from pytorch_stable_diffusion_tpu.models.config import sd15_config

    size = args.size
    rec.IMG_HW, rec.LAT_HW = size, size // 8
    rec.N_STEPS = args.steps
    import fullsize_utils

    fullsize_utils.IMG_HW, fullsize_utils.LAT_HW = size, size // 8

    cfg = sd15_config(reference_quirks=True)

    print(f"[sd15] loading reference models from {args.sd15} ...", flush=True)
    import reference_modules
    assert reference_modules.available, "/root/reference not importable"
    import model_loader  # reference module

    if args.sd15.endswith(".safetensors"):
        # the reference's own loader wants torch.load format; adapt
        from pytorch_stable_diffusion_tpu.weights.convert import (
            load_state_dict)

        sd = load_state_dict(args.sd15)
        tmp = os.path.join(args.out, "sd15_as_ckpt.pt")
        torch.save({"state_dict": {k: torch.as_tensor(np.asarray(v))
                                   for k, v in sd.items()}}, tmp)
        del sd
        ref_models = model_loader.preload_models_from_standard_weights(
            tmp, "cpu")
    else:
        ref_models = model_loader.preload_models_from_standard_weights(
            args.sd15, "cpu")

    if args.vocab and args.merges:
        from pytorch_stable_diffusion_tpu.weights.tokenizer import (
            CLIPTokenizer)

        our_tok = CLIPTokenizer.from_files(args.vocab, args.merges,
                                           max_len=cfg.clip.max_len)

        class _Adapter:
            def batch_encode_plus(self, prompts, **kw):
                import types

                return types.SimpleNamespace(
                    input_ids=our_tok.batch_encode(prompts))

            def batch_encode(self, prompts):
                return our_tok.batch_encode(prompts)

        tok = _Adapter()
    else:
        table = rec.make_token_table(cfg.clip.vocab_size, cfg.clip.max_len)
        tok = rec.StubTokenizer(table)
        print("[sd15] no --vocab/--merges: using the synthetic token table",
              flush=True)

    print(f"[sd15] reference generate() txt2img {size}^2/{args.steps} steps "
          "(capturing noise) ...", flush=True)
    t0 = time.time()
    ref_img, ref_lat, draws = rec.run_reference(ref_models, tok)
    print(f"[sd15] reference done in {time.time()-t0:.0f}s "
          f"({len(draws)} noise draws)", flush=True)
    del ref_models

    print("[sd15] loading the same checkpoint through OUR converter ...",
          flush=True)
    from pytorch_stable_diffusion_tpu.weights.convert import (
        load_sd_checkpoint)

    params = load_sd_checkpoint(args.sd15, cfg)

    # draw order (reference pipeline.py:196, ddpm.py:131): latent init,
    # then one per step with t > 0; our fixed-noise path wants NHWC with a
    # zero slot for the final t=0 step (record_reference_pipeline.py)
    def nhwc(d):
        return np.transpose(d, (0, 2, 3, 1))

    latent_init = nhwc(draws[0])
    sampler_noise = np.stack([nhwc(d) for d in draws[1:]]
                             + [np.zeros_like(nhwc(draws[0]))])
    image, latents = pipeline.generate(
        rec.PROMPT,
        uncond_prompt=rec.UNCOND_PROMPT,
        do_cfg=True,
        cfg_scale=rec.CFG_SCALE,
        sampler_name="ddpm",
        n_inference_steps=args.steps,
        models=params,
        seed=rec.SEED,
        tokenizer=tok,
        config=cfg,
        height=size,
        width=size,
        return_latents=True,
        fixed_noise={"latent_init": latent_init,
                     "sampler_noise": sampler_noise},
    )
    lat_score = psnr(np.transpose(latents, (0, 3, 1, 2)), ref_lat)
    img_score = psnr(image.astype(np.float32), ref_img.astype(np.float32),
                     peak=255.0)
    row("sd15", "txt2img latent PSNR vs executed reference",
        f"{lat_score:.1f} dB", "> 40 dB", lat_score > 40)
    row("sd15", "txt2img image PSNR vs executed reference",
        f"{img_score:.1f} dB", "> 40 dB", img_score > 40)
    save_png(image, os.path.join(args.out, "sd15_txt2img.png"))
    return params, cfg, tok


# ------------------------------------------------------- structural legs
#: dry-run shrinks every structural-leg generate (full-size weights on a
#: 1-core CPU host): main() sets height/width/steps here.
GEN_KW = {}


def _gen(params, cfg, tok, **kw):
    from pytorch_stable_diffusion_tpu import pipeline

    base = dict(uncond_prompt="", do_cfg=True, cfg_scale=7.5,
                sampler_name="euler", n_inference_steps=4, models=params,
                seed=11, tokenizer=tok, config=cfg, height=256, width=256)
    base.update(GEN_KW)
    base.update(kw)
    return pipeline.generate("a photograph of an astronaut riding a horse",
                             **base)


def leg_family(name, path, make_cfg, args, loader=None, gen_kw=None):
    """Load + generate + determinism for families with no offline oracle."""
    from pytorch_stable_diffusion_tpu.weights.convert import (
        load_sd_checkpoint)

    cfg = make_cfg()
    print(f"[{name}] loading {path} ...", flush=True)
    params = (loader or load_sd_checkpoint)(path, cfg)
    tok = _require_tok(args, cfg)
    a = _gen(params, cfg, tok, **(gen_kw or {}))
    b = _gen(params, cfg, tok, **(gen_kw or {}))
    row(name, "generate finite", bool(np.isfinite(a.astype(np.float32)).all()),
        "True", np.isfinite(a.astype(np.float32)).all())
    row(name, "deterministic (same seed)", bool((a == b).all()), "True",
        (a == b).all())
    save_png(a, os.path.join(args.out, f"{name}.png"))
    return params, cfg, tok


def _require_tok(args, cfg):
    if args.vocab and args.merges:
        from pytorch_stable_diffusion_tpu.weights.tokenizer import (
            CLIPTokenizer)

        return CLIPTokenizer.from_files(args.vocab, args.merges,
                                        max_len=cfg.clip.max_len)
    from pytorch_stable_diffusion_tpu.weights.tokenizer import (
        make_test_tokenizer)

    return make_test_tokenizer(
        ["a", "photograph", "of", "an", "astronaut", "riding", "horse"],
        max_len=cfg.clip.max_len)


def leg_esrgan(args):
    """Real-oracle leg: same weights through torch RRDBNet and our JAX port."""
    import torch

    from test_esrgan import _torch_rrdbnet
    from pytorch_stable_diffusion_tpu.models import esrgan
    from pytorch_stable_diffusion_tpu.weights.esrgan import load_esrgan

    params, ecfg = load_esrgan(args.esrgan)
    model = _torch_rrdbnet(torch, nf=ecfg.features, nb=ecfg.num_blocks,
                           gc=ecfg.growth).eval()
    raw = torch.load(args.esrgan, map_location="cpu", weights_only=True)
    raw = raw.get("params_ema", raw.get("params", raw))
    model.load_state_dict({k: torch.as_tensor(np.asarray(v))
                           for k, v in raw.items()})
    rng = np.random.RandomState(0)
    img = rng.rand(1, 64, 64, 3).astype(np.float32)
    ours = np.asarray(esrgan.apply(params, img, ecfg))
    with torch.no_grad():
        want = model(torch.as_tensor(np.transpose(img, (0, 3, 1, 2)))
                     ).numpy().transpose(0, 2, 3, 1)
    score = psnr(ours, want, peak=1.0)
    row("esrgan", "output PSNR vs torch RRDBNet oracle (same weights)",
        f"{score:.1f} dB", "> 40 dB", score > 40)


def leg_lora(args, base):
    params, cfg, tok = base
    from pytorch_stable_diffusion_tpu.weights.lora import (apply_lora,
                                                           load_lora)

    tree = load_lora(args.lora)
    plain = _gen(params, cfg, tok)
    merged = apply_lora(params, cfg, tree, scale=1.0)
    with_lora = _gen(merged, cfg, tok)
    row("lora", "conditions the output (scale 1 != base)",
        bool((plain != with_lora).any()), "True", (plain != with_lora).any())
    row("lora", "finite", bool(np.isfinite(
        with_lora.astype(np.float32)).all()), "True",
        np.isfinite(with_lora.astype(np.float32)).all())
    save_png(with_lora, os.path.join(args.out, "lora.png"))


def leg_controlnet(args, base):
    params, cfg, tok = base
    from pytorch_stable_diffusion_tpu.weights.convert import load_controlnet

    net = load_controlnet(args.controlnet, cfg)
    # hint must match the generate geometry, which the dry run shrinks
    h = GEN_KW.get("height", 256)
    w = GEN_KW.get("width", 256)
    hint = np.zeros((h, w, 3), np.float32)
    hint[h // 4:3 * h // 4, w // 4:3 * w // 4] = 1.0
    models = dict(params, controlnet=net)
    out = _gen(models, cfg, tok, control_image=hint)
    plain = _gen(params, cfg, tok)
    row("controlnet", "conditions the output", bool((out != plain).any()),
        "True", (out != plain).any())
    save_png(out, os.path.join(args.out, "controlnet.png"))


def leg_ip_adapter(args, base):
    params, cfg, tok = base
    from pytorch_stable_diffusion_tpu.models import clip_vision as cv
    from pytorch_stable_diffusion_tpu.weights.ip_adapter import (
        load_clip_vision, load_ip_adapter)

    # real h94 adapters pair with ViT-H/14; the dry run synthesizes a tiny
    # tower (the conversion/pipeline plumbing is identical)
    vcfg = getattr(args, "dry_vision_cfg", None) or cv.vit_h14()
    adapter = load_ip_adapter(args.ip_adapter, cfg.unet)
    vision = load_clip_vision(args.clip_vision, vcfg)
    models = dict(params, ip_adapter=adapter, clip_vision=vision)
    rng = np.random.RandomState(2)
    # raw arrays must already be at the vision tower's input size (the
    # dry run's synthetic tower is 16x16; real ViT-H/14 is 224)
    s = vcfg.image_size
    ipp = (rng.rand(s, s, 3) * 255).astype(np.uint8)
    out = _gen(models, cfg, tok, ip_adapter_image=ipp,
               clip_vision_config=vcfg)
    off = _gen(models, cfg, tok, ip_adapter_image=ipp, ip_adapter_scale=0.0,
               clip_vision_config=vcfg)
    row("ip_adapter", "scale conditions the output",
        bool((out != off).any()), "True", (out != off).any())
    save_png(out, os.path.join(args.out, "ip_adapter.png"))


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    for flag in ("sd15", "sd21", "sdxl", "refiner", "lora", "controlnet",
                 "ip-adapter", "clip-vision", "esrgan", "lcm", "vocab",
                 "merges"):
        ap.add_argument(f"--{flag}")
    ap.add_argument("--out", default="/tmp/sdt_validate")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--dry-run", action="store_true",
                    help="synthesize every leg's artifact (full-size SD-1.5 "
                         "ckpt + esrgan/lora/controlnet/ip-adapter) and run "
                         "the whole matrix at 128^2 (no downloads)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.dry_run:
        import jax
        import torch

        import fullsize_utils
        from pytorch_stable_diffusion_tpu.models.config import sd15_config
        from pytorch_stable_diffusion_tpu.weights import convert

        args.steps, args.size = 3, 128
        GEN_KW.update(height=128, width=128, n_inference_steps=2)
        ckpt = os.path.join(args.out, "synthetic_sd15.ckpt")
        if not os.path.exists(ckpt):
            print("[dry-run] synthesizing full-size SD-1.5 ckpt ...",
                  flush=True)
            params = fullsize_utils.init_fullsize_params(
                sd15_config(reference_quirks=True))
            sd = convert.deconvert(params, sd15_config())
            torch.save({"state_dict": {k: torch.as_tensor(v)
                                       for k, v in sd.items()}}, ckpt)
            del params, sd
        args.sd15 = ckpt

        # --- the remaining legs' artifacts (VERDICT r4 next #7): every
        # loader/converter/pipeline path the real files will flow through
        if not args.esrgan:
            from test_esrgan import _torch_rrdbnet

            ep = os.path.join(args.out, "synthetic_esrgan.pth")
            if not os.path.exists(ep):
                torch.manual_seed(0)
                torch.save(_torch_rrdbnet(torch, nf=8, nb=2,
                                          gc=4).state_dict(), ep)
            args.esrgan = ep
        if not args.lora:
            # rank-4 kohya factors at the FULL SD-1.5 target shapes
            # (shapes via eval_shape — no need to load the 4.3 GB ckpt)
            from pytorch_stable_diffusion_tpu.core.pytree import flatten
            from pytorch_stable_diffusion_tpu.models import clip, unet
            from pytorch_stable_diffusion_tpu.weights import lora as lora_mod

            lp = os.path.join(args.out, "synthetic_lora.pt")
            if not os.path.exists(lp):
                cfg15 = sd15_config()
                shapes = {
                    "diffusion": jax.eval_shape(
                        lambda: unet.init(jax.random.PRNGKey(0), cfg15.unet)),
                    "clip": jax.eval_shape(
                        lambda: clip.init(jax.random.PRNGKey(0), cfg15.clip)),
                }
                targets = lora_mod._weight_targets(cfg15)
                rng = np.random.RandomState(3)
                sd = {}
                for substr in ("attn1.to_q", "attn2.to_out.0",
                               "self_attn.q_proj"):
                    dotted = next(k for k in targets if substr in k)
                    model, dst, kind = targets[dotted][0]
                    leaf = flatten(shapes[model])[dst]
                    out_d, in_d = leaf.shape[1], leaf.shape[0]
                    root = dotted.split(".", 1)[0]
                    name = {"unet": "lora_unet_", "text_encoder": "lora_te_"}[
                        root] + dotted.split(".", 1)[1].replace(".", "_")
                    sd[f"{name}.lora_down.weight"] = torch.as_tensor(
                        rng.randn(4, in_d).astype(np.float32) * 0.05)
                    sd[f"{name}.lora_up.weight"] = torch.as_tensor(
                        rng.randn(out_d, 4).astype(np.float32) * 0.05)
                    sd[f"{name}.alpha"] = torch.tensor(4.0)
                torch.save(sd, lp)
            args.lora = lp
        if not args.controlnet:
            from pytorch_stable_diffusion_tpu.models import controlnet as cn
            from pytorch_stable_diffusion_tpu.weights.convert import (
                deconvert_controlnet)

            cp = os.path.join(args.out, "synthetic_controlnet.pth")
            if not os.path.exists(cp):
                print("[dry-run] synthesizing full-size ControlNet ...",
                      flush=True)
                cfg15 = sd15_config()
                ctrl = cn.init(jax.random.PRNGKey(5), cfg15.unet,
                               downsample_factor=cfg15.vae.downsample_factor)
                # a fresh ControlNet is a mathematical no-op (the zero
                # convs ARE zeros, faithful to the published init), so
                # the "conditions the output" check needs them perturbed
                # the way training would
                import jax.numpy as jnp_

                rngz = np.random.RandomState(7)
                for z in (list(ctrl["zero_convs"]) + [ctrl["mid_out"]]
                          + [ctrl["hint_block"][-1]]):
                    z["kernel"] = jnp_.asarray(
                        rngz.randn(*np.shape(z["kernel"])) * 0.05,
                        jnp_.float32)
                sd = deconvert_controlnet(ctrl, cfg15)
                torch.save({k: torch.as_tensor(np.asarray(v))
                            for k, v in sd.items()}, cp)
                del ctrl, sd
            args.controlnet = cp
        if not getattr(args, "ip_adapter", None):
            from pytorch_stable_diffusion_tpu.models import clip_vision as cv
            from pytorch_stable_diffusion_tpu.weights import ip_adapter as ipw

            vcfg = cv.tiny_vision_config()
            args.dry_vision_cfg = vcfg
            ip_p = os.path.join(args.out, "synthetic_ip_adapter.bin")
            vis_p = os.path.join(args.out, "synthetic_clip_vision.bin")
            if not os.path.exists(ip_p):
                state = ipw.synthetic_ip_state(
                    sd15_config().unet, embed_dim=vcfg.proj_dim, seed=5)
                torch.save({g: {k: torch.as_tensor(v)
                                for k, v in d.items()}
                            for g, d in state.items()}, ip_p)
            if not os.path.exists(vis_p):
                from transformers import CLIPVisionConfig as HFCfg
                from transformers import CLIPVisionModelWithProjection

                hf_cfg = HFCfg(hidden_size=vcfg.width,
                               intermediate_size=vcfg.d_ff,
                               num_hidden_layers=vcfg.n_layers,
                               num_attention_heads=vcfg.n_heads,
                               image_size=vcfg.image_size,
                               patch_size=vcfg.patch_size,
                               projection_dim=vcfg.proj_dim,
                               hidden_act="gelu")
                torch.manual_seed(7)
                torch.save(CLIPVisionModelWithProjection(hf_cfg).eval()
                           .state_dict(), vis_p)
            args.ip_adapter, args.clip_vision = ip_p, vis_p

    base = None
    if args.sd15:
        try:
            base = leg_sd15(args)
        except Exception as e:  # noqa: BLE001
            row("sd15", "leg crashed", repr(e), "no crash", False)
    if args.sd21:
        from pytorch_stable_diffusion_tpu.models.config import sd21_config

        try:
            leg_family("sd21", args.sd21, sd21_config, args)
        except Exception as e:  # noqa: BLE001
            row("sd21", "leg crashed", repr(e), "no crash", False)
    if args.sdxl:
        from pytorch_stable_diffusion_tpu.models.config import sdxl_config

        try:
            leg_family("sdxl", args.sdxl, sdxl_config, args)
        except Exception as e:  # noqa: BLE001
            row("sdxl", "leg crashed", repr(e), "no crash", False)
    if args.refiner:
        from pytorch_stable_diffusion_tpu.models.config import (
            sdxl_refiner_config)

        try:
            leg_family("refiner", args.refiner, sdxl_refiner_config, args)
        except Exception as e:  # noqa: BLE001
            row("refiner", "leg crashed", repr(e), "no crash", False)
    if args.lora and base:
        try:
            leg_lora(args, base)
        except Exception as e:  # noqa: BLE001
            row("lora", "leg crashed", repr(e), "no crash", False)
    if args.controlnet and base:
        try:
            leg_controlnet(args, base)
        except Exception as e:  # noqa: BLE001
            row("controlnet", "leg crashed", repr(e), "no crash", False)
    if getattr(args, "ip_adapter", None) and args.clip_vision and base:
        try:
            leg_ip_adapter(args, base)
        except Exception as e:  # noqa: BLE001
            row("ip_adapter", "leg crashed", repr(e), "no crash", False)
    if args.lcm:
        from pytorch_stable_diffusion_tpu.models.config import (
            sd15_lcm_config)

        try:
            # LCM distilled UNet: its own sampler/grid, guidance-free
            leg_family("lcm", args.lcm, sd15_lcm_config, args,
                       gen_kw=dict(sampler_name="lcm", do_cfg=False,
                                   n_inference_steps=4))
        except Exception as e:  # noqa: BLE001
            row("lcm", "leg crashed", repr(e), "no crash", False)
    if args.esrgan:
        try:
            leg_esrgan(args)
        except Exception as e:  # noqa: BLE001
            row("esrgan", "leg crashed", repr(e), "no crash", False)

    print("\n== validation matrix ==", flush=True)
    for r in ROWS:
        print(f"{'PASS' if r['ok'] else 'FAIL'}  {r['artifact']:<11} "
              f"{r['check']}: {r['value']} (bar {r['bar']})", flush=True)
    out_json = os.path.join(args.out, "matrix.json")
    with open(out_json, "w") as f:
        json.dump(ROWS, f, indent=1)
    print(f"wrote {out_json}", flush=True)
    sys.exit(0 if all(r["ok"] for r in ROWS) and ROWS else 1)


if __name__ == "__main__":
    main()
