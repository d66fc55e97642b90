"""TPU-native Stable Diffusion framework (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of the capabilities of dawmro/pytorch_stable_diffusion
(SD-1.5 inference: CLIP text encoder, VAE, UNet, DDPM, txt2img/img2img
pipeline, CompVis checkpoint ingestion) designed TPU-first: NHWC layouts,
bf16 MXU compute with fp32 norms/softmax, Pallas flash attention, the whole
denoise loop as one compiled lax.scan, and data-parallel scaling over a
jax.sharding.Mesh.

Quick start::

    from pytorch_stable_diffusion_tpu import generate, load_models, CLIPTokenizer

    tokenizer = CLIPTokenizer.from_files("vocab.json", "merges.txt")
    models = load_models("v1-5-pruned-emaonly.ckpt")   # or .safetensors
    image = generate("a photo of a dog", models=models, tokenizer=tokenizer,
                     seed=1337, cfg_scale=7.5, n_inference_steps=50)
"""

from .api import StableDiffusion
from .models.config import (CLIPConfig, SDConfig, UNetConfig, VAEConfig,
                            sd15_config, sd15_inpaint_config,
                            sd15_ip2p_config,
                            sd15_lcm_config, sd2_inpaint_config,
                            sd21_config, sdxl_config, sdxl_lcm_config,
                            sdxl_refiner_config, tiny_sd_config,
                            with_clip_skip, with_freeu,
                            with_hypertile, with_tome)
from .core.dtypes import BF16, FP32, MIXED, Policy
from .pipeline import (generate, generate_images, generate_many,
                       get_time_embedding, rescale)
from .weights.convert import load_sd_checkpoint as load_models
from .weights.diffusers import load_diffusers_pipeline as load_diffusers_models
from .weights.stream import load_sd_checkpoint_streamed as load_models_streamed
from .weights.tokenizer import CLIPTokenizer

__version__ = "0.1.0"

__all__ = [
    "StableDiffusion",
    "generate", "generate_images", "generate_many", "load_models",
    "load_diffusers_models", "load_models_streamed", "CLIPTokenizer",
    "SDConfig", "CLIPConfig", "UNetConfig", "VAEConfig",
    "sd15_config", "sd15_inpaint_config", "sd15_ip2p_config",
    "sd15_lcm_config",
    "sd2_inpaint_config", "sd21_config", "sdxl_config",
    "sdxl_lcm_config", "sdxl_refiner_config",
    "tiny_sd_config", "with_clip_skip", "with_freeu", "with_hypertile",
    "with_tome", "Policy", "FP32",
    "BF16", "MIXED",
    "get_time_embedding", "rescale",
]
