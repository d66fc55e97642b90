"""Full-scale public-API run on the real chip."""
import time, numpy as np, jax
import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer
from bench import build_models

enable_compilation_cache()
cfg = sdt.sd15_config(policy=sdt.BF16, attention_backend="pallas")
models = build_models(cfg)
tok = make_test_tokenizer(["a","photo","of","dog","cat","golden","meadow"], max_len=77)

t0 = time.time()
img = sdt.generate("a photo of a golden dog", "a cat", models=models,
                   tokenizer=tok, seed=1337, cfg_scale=7.5,
                   n_inference_steps=50, config=cfg)
print("txt2img 512:", img.shape, img.dtype, "range", int(img.min()), int(img.max()),
      f"({time.time()-t0:.1f}s incl compile)", flush=True)

t0 = time.time()
img2 = sdt.generate("a photo of a golden dog", "a cat", models=models,
                    tokenizer=tok, seed=1337, cfg_scale=7.5,
                    n_inference_steps=50, config=cfg)
print("repeat:", f"{time.time()-t0:.2f}s", "deterministic:", bool((img == img2).all()), flush=True)

t0 = time.time()
init = (np.random.RandomState(0).rand(512, 512, 3) * 255).astype(np.uint8)
img3 = sdt.generate("a dog", input_image=init, strength=0.8, models=models,
                    tokenizer=tok, seed=42, n_inference_steps=50, config=cfg)
print("img2img 512:", img3.shape, f"({time.time()-t0:.1f}s incl compile)", flush=True)

t0 = time.time()
img4 = sdt.generate("a dog", sampler_name="dpm++", models=models, tokenizer=tok,
                    seed=7, n_inference_steps=20, config=cfg)
print("dpm++ 20-step:", img4.shape, f"({time.time()-t0:.1f}s incl compile)", flush=True)
