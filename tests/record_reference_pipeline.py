"""Record WHOLE-PIPELINE goldens from the EXECUTED reference `generate()`.

Run manually (CPU, a few minutes on the 1-core host):

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tests/record_reference_pipeline.py

Round 2's goldens (record_reference_goldens.py) cover single full-size
forwards of CLIP / Diffusion / VAE; this script closes the last gap by
recording the reference's `generate()` *composition* itself
(/root/reference/sd/pipeline.py:13-262): the N-step denoise loop, the CFG
`chunk(2)` cond/uncond ordering (pipeline.py:230-233), the img2img
encode -> set_strength -> add_noise glue (pipeline.py:149-191), and the
rescale-to-uint8 output contract (pipeline.py:253-262).

Mechanics:
  1. Rebuild the deterministic full-size synthetic SD-1.5 weights
     (tests/fullsize_utils.py), export via `deconvert`, and load through the
     reference's OWN converter + strict loader — same proof chain as the
     module goldens.
  2. Shrink the reference pipeline's hard-coded 512x512 geometry
     (pipeline.py:7-10 module globals) to 128x128 so the CPU run is
     tractable; the models are fully convolutional, and the *composition*
     under test is resolution-independent.
  3. Intercept `torch.randn` to capture every draw made with the pipeline's
     seeded Generator in call order (pipeline.py:177,196; ddpm.py:131,184),
     so our fixed-noise path can replay the exact noise.
  4. Run txt2img (5 steps, seed 1337, cfg 5 — the demo anchor settings) and
     img2img (strength 0.9, images/dog.jpg — notebook cell 4), capturing the
     final latents (decoder pre-hook, cloned BEFORE the decoder's in-place
     `x /= 0.18215`) and the uint8 image output.

tests/test_reference_pipeline.py then replays the noise through OUR
pipeline (reference_quirks=True, fixed_noise) and requires end-to-end
PSNR > 55 dB on latents and the uint8 image.
"""

import os
import sys
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
for p in (_REPO, _HERE):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np  # noqa: E402
import torch  # noqa: E402

import fullsize_utils  # noqa: E402
import reference_modules  # noqa: E402

from pytorch_stable_diffusion_tpu.models.config import sd15_config  # noqa: E402
from pytorch_stable_diffusion_tpu.weights import convert  # noqa: E402

# pipeline-golden geometry (matches fullsize_utils: 128^2 image, 16^2 latent)
IMG_HW = fullsize_utils.IMG_HW
LAT_HW = fullsize_utils.LAT_HW
SEED = 1337          # demo anchor (inference_demo.ipynb cell 5)
CFG_SCALE = 5.0      # demo anchor (cell 3)
N_STEPS = 5          # few-step run per VERDICT; timesteps [800,600,400,200,0]
STRENGTH = 0.9       # demo img2img anchor (cell 4)
DOG_JPG = "/root/reference/images/dog.jpg"

PROMPT = "a photograph of an astronaut riding a horse"
UNCOND_PROMPT = ""


def make_token_table(vocab_size: int, max_len: int):
    """Deterministic synthetic token ids (tokenization is fuzz-tested
    separately; the pipeline golden pins the *model* path)."""
    rng = np.random.RandomState(4321)
    table = {}
    for prompt in (PROMPT, UNCOND_PROMPT):
        ids = rng.randint(1, vocab_size - 2, size=(max_len,))
        ids[0] = vocab_size - 2       # sot
        ids[-1] = vocab_size - 1      # eot
        table[prompt] = ids.astype(np.int64).tolist()
    return table


class StubTokenizer:
    """Duck-types transformers' batch_encode_plus(...).input_ids, which is
    all the reference pipeline uses (pipeline.py:109,115)."""

    def __init__(self, table):
        self.table = table

    def batch_encode_plus(self, prompts, **kw):
        return types.SimpleNamespace(
            input_ids=[list(self.table[p]) for p in prompts])

    # our pipeline duck-types on batch_encode (weights/tokenizer.py API)
    def batch_encode(self, prompts):
        return [list(self.table[p]) for p in prompts]


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def run_reference(models, tokenizer, *, input_image=None):
    """One reference generate() call at the shrunk geometry, capturing
    noise draws and the pre-decoder latents."""
    import pipeline as ref_pipeline  # reference module

    # shrink the hard-coded geometry (pipeline.py:7-10)
    ref_pipeline.WIDTH = IMG_HW
    ref_pipeline.HEIGHT = IMG_HW
    ref_pipeline.LATENTS_WIDTH = LAT_HW
    ref_pipeline.LATENTS_HEIGHT = LAT_HW

    captured = {}

    def save_latents(module, inputs):
        # clone is load-bearing: the decoder's first op is in-place
        # `x /= 0.18215` on its input (decoder.py forward)
        captured["latents"] = inputs[0].detach().clone().numpy()

    hook = models["decoder"].register_forward_pre_hook(save_latents)

    # capture the Generator that generate() constructs (pipeline.py:92), and
    # every randn drawn with it (pipeline.py:177,196; ddpm.py:131,184).
    # torch.Generator is only *instantiated* by the reference, so a factory
    # function stands in fine (the C type can't be subclassed reliably).
    generator_box = {}
    draws = []
    orig_generator_cls = torch.Generator
    orig_randn = torch.randn

    def tracked_generator(*a, **kw):
        g = orig_generator_cls(*a, **kw)
        generator_box["g"] = g
        return g

    def tracked_randn(*args, **kw):
        out = orig_randn(*args, **kw)
        g = kw.get("generator")
        if g is not None and g is generator_box.get("g"):
            draws.append(out.detach().cpu().numpy().copy())
        return out

    torch.Generator = tracked_generator
    torch.randn = tracked_randn
    try:
        image = ref_pipeline.generate(
            prompt=PROMPT,
            uncond_prompt=UNCOND_PROMPT,
            input_image=input_image,
            strength=STRENGTH,
            do_cfg=True,
            cfg_scale=CFG_SCALE,
            sampler_name="ddpm",
            n_inference_steps=N_STEPS,
            models=models,
            seed=SEED,
            device="cpu",
            idle_device=None,
            tokenizer=tokenizer,
        )
    finally:
        torch.Generator = orig_generator_cls
        torch.randn = orig_randn
        hook.remove()

    return image, captured["latents"], draws


def main():
    assert reference_modules.available, "/root/reference not present"
    out_path = os.path.join(_HERE, "goldens", "reference_pipeline.npz")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    cfg = sd15_config()
    print("[1/6] init full-size params (jitted) ...", flush=True)
    params = fullsize_utils.init_fullsize_params(cfg)

    print("[2/6] deconvert -> CompVis state dict ...", flush=True)
    sd = convert.deconvert(params, cfg)
    fp = fullsize_utils.fingerprint(sd)
    del params

    ckpt_path = "/tmp/sdt_golden_synthetic.ckpt"
    print(f"[3/6] torch.save {len(sd)} keys -> {ckpt_path} ...", flush=True)
    torch.save({"state_dict": {k: torch.as_tensor(v) for k, v in sd.items()}},
               ckpt_path)
    del sd

    print("[4/6] reference preload_models_from_standard_weights ...", flush=True)
    import model_loader  # reference module

    models = model_loader.preload_models_from_standard_weights(ckpt_path, "cpu")

    table = make_token_table(cfg.clip.vocab_size, cfg.clip.max_len)
    tokenizer = StubTokenizer(table)

    payload = {
        "cond_tokens": np.asarray([table[PROMPT]], np.int64),
        "uncond_tokens": np.asarray([table[UNCOND_PROMPT]], np.int64),
        "n_steps": np.int64(N_STEPS),
        "cfg_scale": np.float64(CFG_SCALE),
        "strength": np.float64(STRENGTH),
    }
    payload.update({f"fp_{k}": v for k, v in fp.items()})

    print("[5/6] reference txt2img generate() ...", flush=True)
    image, latents, draws = run_reference(models, tokenizer)
    # draw order (pipeline.py:196, ddpm.py:131): latent init, then one per
    # step with t > 0 (the final t=0 step draws nothing)
    assert len(draws) == 1 + (N_STEPS - 1), f"txt2img draws: {len(draws)}"
    payload["t2i_image"] = image                        # (H, W, 3) uint8
    payload["t2i_latents"] = latents                    # (1, 4, 16, 16) f32
    payload["t2i_latent_init"] = nchw_to_nhwc(draws[0])
    step_noise = np.stack([nchw_to_nhwc(d) for d in draws[1:]]
                          + [np.zeros_like(nchw_to_nhwc(draws[0]))])
    payload["t2i_sampler_noise"] = step_noise           # (5, 1, 16, 16, 4)

    print("[6/6] reference img2img generate() ...", flush=True)
    from PIL import Image

    dog = Image.open(DOG_JPG).convert("RGB")
    # record the post-resize uint8 array so our side sees identical pixels
    # (PIL resampling stays out of the comparison)
    dog_small = dog.resize((IMG_HW, IMG_HW))
    payload["i2i_input_image"] = np.asarray(dog_small, np.uint8)

    image2, latents2, draws2 = run_reference(models, tokenizer,
                                             input_image=dog_small)
    # draw order (pipeline.py:177, ddpm.py:184, ddpm.py:131): encoder noise,
    # add_noise noise, then one per denoise step with t > 0.  strength 0.9 /
    # 5 steps => start_step 1 => loop over [600,400,200,0] => 3 step draws.
    n_loop = N_STEPS - (N_STEPS - int(N_STEPS * STRENGTH))  # ddpm.py:97-99
    assert len(draws2) == 2 + (n_loop - 1), f"img2img draws: {len(draws2)}"
    payload["i2i_image"] = image2
    payload["i2i_latents"] = latents2
    payload["i2i_encoder_noise"] = nchw_to_nhwc(draws2[0])
    payload["i2i_latent_init"] = nchw_to_nhwc(draws2[1])  # add_noise draw
    zeros = np.zeros_like(nchw_to_nhwc(draws2[0]))
    start_step = N_STEPS - n_loop
    step_noise2 = [zeros] * start_step \
        + [nchw_to_nhwc(d) for d in draws2[2:]] + [zeros]
    assert len(step_noise2) == N_STEPS
    payload["i2i_sampler_noise"] = np.stack(step_noise2)
    payload["i2i_start_step"] = np.int64(start_step)

    np.savez_compressed(out_path, **payload)
    print(f"wrote {out_path} ({os.path.getsize(out_path) / 1e6:.1f} MB)",
          flush=True)


if __name__ == "__main__":
    main()
