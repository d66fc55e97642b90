"""Script equivalent of the reference demo notebook
(``/root/reference/sd/inference_demo.ipynb``).

Artifacts (gitignored, same as the reference's ``data/links.txt``):
  * SD-1.5 weights: v1-5-pruned-emaonly.ckpt (or .safetensors) from
    huggingface.co/stable-diffusion-v1-5/stable-diffusion-v1-5
  * tokenizer assets: vocab.json + merges.txt from the same repo's
    ``tokenizer/`` directory

Usage:
  python examples/inference_demo.py --ckpt v1-5-pruned-emaonly.safetensors \
      --vocab data/vocab.json --merges data/merges.txt \
      [--image images/dog.jpg --strength 0.9] [--out output.png]
"""

from __future__ import annotations

import argparse
import time

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--merges", required=True)
    ap.add_argument("--prompt", default=(
        "A highly detailed photograph of a golden retriever playing in a "
        "sunlit meadow"))
    ap.add_argument("--uncond-prompt", default="")
    ap.add_argument("--image", default=None, help="init image for img2img")
    ap.add_argument("--strength", type=float, default=0.9)
    ap.add_argument("--cfg-scale", type=float, default=5.0)   # notebook cell 3
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sampler", default="ddpm",
                    help="ddpm|ddim|dpm++|euler|euler_a|heun|unipc")
    ap.add_argument("--seed", type=int, default=1337)          # notebook cell 5
    ap.add_argument("--out", default="output.png")
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    args = ap.parse_args()

    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"Using device: {jax.devices()[0]}")   # notebook cell 1 equivalent

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    policy = sdt.BF16 if args.bf16 else sdt.FP32
    cfg = sdt.sd15_config(policy=policy, attention_backend=backend)

    tokenizer = sdt.CLIPTokenizer.from_files(args.vocab, args.merges)
    t0 = time.time()
    models = sdt.load_models(args.ckpt, cfg)
    print(f"Loaded checkpoint in {time.time() - t0:.1f}s")

    input_image = None
    if args.image:
        from PIL import Image

        input_image = Image.open(args.image)

    t0 = time.time()
    image = sdt.generate(
        prompt=args.prompt,
        uncond_prompt=args.uncond_prompt,
        input_image=input_image,
        strength=args.strength,
        do_cfg=True,
        cfg_scale=args.cfg_scale,
        sampler_name=args.sampler,
        n_inference_steps=args.steps,
        models=models,
        seed=args.seed,
        tokenizer=tokenizer,
        config=cfg,
    )
    print(f"Generated in {time.time() - t0:.1f}s (includes compile on first run)")

    from PIL import Image

    Image.fromarray(image).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()
