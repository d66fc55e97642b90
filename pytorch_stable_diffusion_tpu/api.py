"""High-level convenience API.

The reference exposes a bare ``generate()`` plus a manual preload step
(``sd/model_loader.py``); this wrapper bundles checkpoint, tokenizer, config,
and (optionally) a device mesh into one object for repeated generation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from . import pipeline as pipeline_mod
from .models.config import SDConfig, sd15_config
from .weights.convert import load_sd_checkpoint
from .weights.tokenizer import CLIPTokenizer


# The standard (non-adapter) model entries that carry Megatron shardings
# on a tensor-parallel mesh.  One constant shared by _place_host_arrays's
# TP guard and _clone(reshard=True) — keeping two copies risked the guard
# going blind to a key only one site learned about (round-5 review).
_STD_MODEL_KEYS = ("clip", "clip2", "encoder", "decoder", "diffusion")


def _place_host_arrays(tree, mesh):
    """Device-put numpy leaves in a models pytree ONCE, at attach time.

    Adapter loaders (ip_adapter, hypernetwork, esrgan, animatediff,
    controlnet) emit numpy fp32 trees.  A numpy leaf that stays in
    ``models`` is re-uploaded host->device on EVERY jitted generate call
    (jit arguments, not closure constants) — for the ~90 MB IP-Adapter
    over the axon relay tunnel that measured +3.5 s/image at 512^2/20
    while the UNet lane itself cost +0.7%/step (exp_ip_insitu.py).
    Placement is replicated over ``mesh`` when one is attached, default
    device otherwise; already-placed jax.Arrays pass through untouched.

    On a tensor-parallel mesh (model axis > 1) the standard model entries
    (clip/diffusion/...) carry Megatron shardings — replicating a numpy
    leaf there would be silently correct (XLA reshards at dispatch) but an
    HBM/perf footgun, so builders must route fresh std-key host arrays
    through ``_clone(reshard=True)`` FIRST; this function raises if one
    reaches it un-sharded.
    """
    import jax

    if mesh is not None and mesh.shape.get("model", 1) > 1 \
            and isinstance(tree, dict):
        for k in _STD_MODEL_KEYS:
            if k in tree and any(isinstance(l, np.ndarray)
                                 for l in jax.tree_util.tree_leaves(tree[k])):
                raise RuntimeError(
                    f"models[{k!r}] holds host (numpy) arrays on a "
                    "tensor-parallel mesh; route them through "
                    "_clone(reshard=True) / parallel.tp.shard_models so "
                    "they get their Megatron shardings instead of full "
                    "replication")

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec())
        place = lambda x: jax.device_put(x, sharding)  # noqa: E731
    else:
        place = jax.device_put

    def leaf(x):
        return place(x) if isinstance(x, np.ndarray) else x

    return jax.tree_util.tree_map(leaf, tree)


def _to_rgb_float(image) -> np.ndarray:
    """Any image input -> (H, W, 3) float32 in 0..255 (grayscale stacked,
    alpha dropped, [0, 1]-ranged FLOAT inputs rescaled — integer inputs
    are always 0..255 already; a near-black uint8 image whose max pixel
    is 1 must NOT be blown up to white)."""
    arr = np.asarray(image)
    is_float = arr.dtype.kind == "f"
    img = arr.astype(np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    img = img[..., :3]
    if is_float and img.max() <= 1.0:
        img = img * 255.0
    return img


class StableDiffusion:
    """Loaded SD model bundle.

    Example::

        sd = StableDiffusion.from_checkpoint(
            "v1-5.safetensors", "vocab.json", "merges.txt",
            config=sd15_config(policy=BF16, attention_backend="pallas"))
        image = sd.txt2img("a photo of a dog", seed=1337)
        image = sd.img2img("a cat", init_image, strength=0.8)
        images = sd.generate_batch(["a dog"] * 8, seed=0)
    """

    def __init__(self, models, tokenizer, config: Optional[SDConfig] = None,
                 mesh=None):
        self.models = models
        self.tokenizer = tokenizer
        self.config = config or sd15_config()
        self.mesh = mesh
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            from .parallel.tp import shard_models

            self.models = shard_models(self.models, mesh)
        elif mesh is not None:
            from .parallel.dp import replicate_params

            self.models = replicate_params(self.models, mesh)
        self.models = _place_host_arrays(self.models, self.mesh)

    @classmethod
    def from_checkpoint(cls, ckpt_path: str, vocab_path: str, merges_path: str,
                        config: Optional[SDConfig] = None, mesh=None,
                        loras: Optional[Sequence] = None):
        """``loras``: optional adapters merged into the weights before any
        mesh sharding — each entry a path, or a ``(path, scale)`` pair."""
        config = config or sd15_config()
        models = load_sd_checkpoint(ckpt_path, config)
        if loras:
            from .weights import lora as lora_mod

            pairs = [(lora_mod.load_lora(l), 1.0) if isinstance(l, (str,))
                     else (lora_mod.load_lora(l[0]), float(l[1]))
                     for l in loras]
            models = lora_mod.apply_loras(models, config, pairs)
        tokenizer = CLIPTokenizer.from_files(vocab_path, merges_path,
                                             max_len=config.clip.max_len)
        return cls(models, tokenizer, config, mesh)

    def with_lora(self, lora, scale: float = 1.0, *, strict: bool = True):
        """Return a new bundle with a LoRA adapter merged in
        (``weights/lora.py``).  ``lora`` is a file path or a raw LoRA state
        dict; ``scale`` is the user strength multiplier.  Merging is a pure
        weight transform, so the jitted pipeline recompiles nothing."""
        from .weights import lora as lora_mod

        sd = lora_mod.load_lora(lora) if isinstance(lora, str) else lora
        merged = lora_mod.apply_lora(self.models, self.config, sd, scale,
                                     strict=strict)
        return self._clone(models=merged, reshard=True)

    def _kw(self, kwargs):
        kwargs.setdefault("models", self.models)
        kwargs.setdefault("tokenizer", self.tokenizer)
        kwargs.setdefault("config", self.config)
        if self.mesh is not None:
            kwargs.setdefault("mesh", self.mesh)
        if getattr(self, "_hyper", None) is not None:
            kwargs.setdefault("hypernetwork", self._hyper[0])
            kwargs.setdefault("hypernetwork_strength", self._hyper[1])
        if getattr(self, "_ip_vision", None) is not None:
            kwargs.setdefault("clip_vision_config", self._ip_vision)
        return kwargs

    def _clone(self, *, models=None, tokenizer=None, config=None,
               reshard: bool = False):
        """New bundle sharing this one's state (INCLUDING the attached
        hypernetwork — every ``with_*`` builder must go through here or an
        active feature silently drops off the clone).  ``reshard=True``
        re-applies the mesh placement to ``models`` — required whenever a
        builder installs freshly loaded host arrays on a meshed bundle."""
        out = type(self).__new__(type(self))
        out.models = self.models if models is None else models
        out.tokenizer = self.tokenizer if tokenizer is None else tokenizer
        out.config = self.config if config is None else config
        out.mesh = self.mesh
        out._hyper = getattr(self, "_hyper", None)
        out._ip_vision = getattr(self, "_ip_vision", None)
        out._upscaler = getattr(self, "_upscaler", None)
        out._motion_max = getattr(self, "_motion_max", None)
        if reshard and self.mesh is not None:
            # re-place only the standard model entries; extras (controlnet
            # list, hypernetwork tree) keep their existing placement
            std = {k: v for k, v in out.models.items()
                   if k in _STD_MODEL_KEYS}
            if self.mesh.shape.get("model", 1) > 1:
                from .parallel.tp import shard_models

                std = shard_models(std, self.mesh)
            else:
                from .parallel.dp import replicate_params

                std = replicate_params(std, self.mesh)
            out.models = {**out.models, **std}
        out.models = _place_host_arrays(out.models, out.mesh)
        return out

    def with_vae(self, vae):
        """Return a bundle with a standalone VAE swapped in (the A1111
        "SD VAE" override, e.g. ``vae-ft-mse-840000``): a CompVis-layout
        ``.vae.pt``/``.ckpt``/``.safetensors`` file, a diffusers ``vae/``
        directory, or a ready ``(encoder, decoder)`` pytree pair."""
        if isinstance(vae, str):
            from .weights.convert import load_vae

            enc, dec = load_vae(vae, self.config)
        else:
            enc, dec = vae
        return self._clone(models=dict(self.models, encoder=enc,
                                       decoder=dec), reshard=True)

    def merged_with(self, other, alpha: float = 0.5, third=None):
        """A1111 checkpoint merger: weighted-sum this bundle's weights with
        ``other``'s at ``alpha`` (0 = self, 1 = other), or add-difference
        ``self + alpha·(other − third)`` when ``third`` is given.
        ``other``/``third`` may be bundles or raw models dicts."""
        from .weights.merge import merge_models

        def _models(x):
            return x.models if isinstance(x, StableDiffusion) else x

        keys = [k for k in ("clip", "clip2", "encoder", "decoder",
                            "diffusion") if k in self.models]
        ours = {k: self.models[k] for k in keys}
        theirs = {k: _models(other)[k] for k in keys}
        merged = merge_models(
            ours, theirs, alpha,
            None if third is None else {k: _models(third)[k] for k in keys})
        return self._clone(models=dict(self.models, **merged), reshard=True)

    def with_hypernetwork(self, hypernetwork, strength: float = 1.0):
        """Return a bundle with an A1111 hypernetwork active
        (weights/hypernetwork.py): small residual MLPs transform the
        cross-attention context (k and v separately) at every layer.

        ``hypernetwork`` is a ``.pt`` path or the loader's
        ``(tree, (activation, activate_output))`` pair; ``strength`` is
        A1111's multiplier (traced — changing it recompiles nothing)."""
        from .weights import hypernetwork as hyper_mod

        tree, meta = hyper_mod.load_hypernetwork(hypernetwork) \
            if isinstance(hypernetwork, str) else hypernetwork
        if self.mesh is not None:
            # place the freshly loaded host arrays once, like every other
            # model entry (replicated — the tiny MLPs never need TP)
            from .parallel.dp import replicate_params

            tree = replicate_params(tree, self.mesh)
        out = self._clone(models=dict(self.models, hypernetwork=tree))
        out._hyper = (meta, float(strength))
        return out

    def txt2img(self, prompt: str, uncond_prompt: str = "", **kwargs) -> np.ndarray:
        return pipeline_mod.generate(prompt, uncond_prompt, **self._kw(kwargs))

    def img2img(self, prompt: str, init_image, strength: float = 0.8,
                uncond_prompt: str = "", **kwargs) -> np.ndarray:
        return pipeline_mod.generate(prompt, uncond_prompt,
                                     input_image=init_image, strength=strength,
                                     **self._kw(kwargs))

    def edit(self, prompt: str, image, image_guidance_scale: float = 1.5,
             uncond_prompt: str = "", **kwargs) -> np.ndarray:
        """InstructPix2Pix editing: ``prompt`` is the edit INSTRUCTION
        ("make it a watercolor"), ``image`` the picture to edit.  Needs an
        8-channel ip2p checkpoint (``sd15_ip2p_config``).  Denoising runs
        from pure noise under dual guidance — ``cfg_scale`` pulls toward
        the instruction, ``image_guidance_scale`` toward the input image
        (Brooks et al. 2023; diffusers instruct_pix2pix semantics)."""
        return pipeline_mod.generate(prompt, uncond_prompt,
                                     edit_image=image,
                                     image_guidance_scale=image_guidance_scale,
                                     **self._kw(kwargs))

    def hires_fix(self, prompt: str, uncond_prompt: str = "", *,
                  height: int = 1024, width: int = 1024,
                  base_height: Optional[int] = None,
                  base_width: Optional[int] = None,
                  strength: float = 0.6,
                  upscale_method: str = "bilinear", **kwargs) -> np.ndarray:
        """Two-pass hi-res generation (the community "highres fix").

        Pass 1 runs txt2img at the base resolution (default: half the
        target, the model's native scale); its LATENTS are bilinearly
        upscaled and denoised again at the target size via the
        latent-space img2img path (``init_latents`` — no decode/encode
        round trip).  ``strength`` is the second pass's denoise strength.
        """
        import jax
        import jax.numpy as jnp

        bh, bw = base_height or height // 2, base_width or width // 2
        kw = self._kw(dict(kwargs))
        if upscale_method == "esrgan":
            # pixel-space upscale through the attached ESRGAN (A1111's
            # "upscaler" hires-fix modes): decode the base pass, upscale,
            # lanczos to the exact target if the model scale overshoots,
            # then img2img at the target size
            if getattr(self, "_upscaler", None) is None:
                raise ValueError("upscale_method='esrgan' needs an "
                                 "attached upscaler (with_upscaler)")
            base_img = pipeline_mod.generate(prompt, uncond_prompt,
                                             height=bh, width=bw, **kw)
            up_img = self.upscale(base_img)  # keeps the batch rank
            want = (height, width) if up_img.ndim == 3 \
                else (up_img.shape[0], height, width)
            if up_img.shape[:up_img.ndim - 1] != want:
                shape = want + (3,)
                up_img = np.clip(np.round(np.asarray(jax.image.resize(
                    jnp.asarray(up_img, jnp.float32), shape,
                    "lanczos3"))), 0, 255).astype(np.uint8)
            return pipeline_mod.generate(prompt, uncond_prompt,
                                         height=height, width=width,
                                         input_image=up_img,
                                         strength=strength, **kw)
        _, lat = pipeline_mod.generate(prompt, uncond_prompt, height=bh,
                                       width=bw, return_latents=True, **kw)
        f = self.config.vae.downsample_factor
        # latent upscaler choice — A1111's "Latent"/"Latent (nearest)" etc.
        if upscale_method not in ("bilinear", "nearest", "lanczos3",
                                  "cubic"):
            raise ValueError(f"unknown upscale_method {upscale_method!r}")
        up = jax.image.resize(
            jnp.asarray(lat, jnp.float32),
            (lat.shape[0], height // f, width // f, lat.shape[-1]),
            method=upscale_method)
        return pipeline_mod.generate(prompt, uncond_prompt, height=height,
                                     width=width, init_latents=np.asarray(up),
                                     strength=strength, **kw)

    def with_textual_inversion(self, embedding, token: Optional[str] = None):
        """Return a bundle with a textual-inversion embedding installed
        (weights/textual_inversion.py).

        ``embedding`` is a ``.pt``/``.safetensors`` path or a ready
        ``{trigger: (n, d)}`` dict (SDXL: ``{trigger: {"clip_l": (n, 768),
        "clip_g": (n, 1280)}}``); ``token`` overrides the trigger word.
        The trigger then works in any prompt: ``sd.txt2img("a photo of
        <my-style>")``."""
        from .weights import textual_inversion as ti

        if isinstance(embedding, str):
            embs = ti.load_embedding(embedding, token)
        elif isinstance(embedding, dict) and \
                set(embedding) >= {"clip_l", "clip_g"}:
            if token is None:
                raise ValueError("a dual-tower embedding dict needs token=")
            embs = {token: embedding}
        else:
            embs = {token: embedding} if token is not None else dict(embedding)
        models, tok, cfg = ti.add_embeddings(self.models, self.tokenizer,
                                             self.config, embs)
        return self._clone(models=models, tokenizer=tok, config=cfg,
                           reshard=True)

    def with_controlnet(self, controlnet, *, config: Optional[SDConfig] = None):
        """Return a bundle with a ControlNet attached (models/controlnet.py).

        ``controlnet`` is a checkpoint path (CompVis ``control_model.*``
        file, standalone or merged), a diffusers ControlNetModel directory,
        an already-converted pytree, or a LIST of those (multi-ControlNet:
        residuals sum; pass matching lists as ``control_image`` /
        ``controlnet_scale``).  Generation kwargs then accept
        ``control_image`` (+ ``controlnet_scale``)."""
        def _load(cn):
            if not isinstance(cn, str):
                return cn
            import os

            if os.path.isdir(cn):
                from .weights.diffusers import load_diffusers_controlnet

                return load_diffusers_controlnet(cn, config or self.config)
            from .weights.convert import load_controlnet

            return load_controlnet(cn, config or self.config)

        controlnet = [_load(c) for c in controlnet] \
            if isinstance(controlnet, (list, tuple)) else _load(controlnet)
        return self._clone(models=dict(self.models, controlnet=controlnet),
                           reshard=True)

    def with_motion(self, motion):
        """Attach AnimateDiff motion modules (weights/animatediff.py).

        ``motion`` is an ``mm_sd_v15[_v2]``-style weight file path or a
        ready ``(tree, max_len)`` pair; enables :meth:`animate`."""
        if isinstance(motion, str):
            from .weights.animatediff import load_motion_module

            tree, max_len = load_motion_module(motion, self.config.unet)
        else:
            tree, max_len = motion
        if self.mesh is not None:
            from .parallel.dp import replicate_params

            tree = replicate_params(tree, self.mesh)
        out = self._clone(models=dict(self.models, motion=tree))
        out._motion_max = int(max_len)
        return out

    def animate(self, prompt: str, n_frames: int = 16,
                uncond_prompt: str = "", **kwargs) -> np.ndarray:
        """Text-to-video via the attached motion modules: returns
        ``(n_frames, H, W, 3)`` uint8 frames (AnimateDiff — the temporal
        attention turns the frame batch into a coherent clip).  Pass
        ``input_image`` for coarse video2video.  ``n_frames`` beyond the
        modules' trained window (``with_motion`` reads it from the
        checkpoint; 32 for v2) extrapolates the positional encoding and
        degrades."""
        if "motion" not in self.models:
            raise ValueError("no motion modules attached (with_motion)")
        mx = getattr(self, "_motion_max", None)
        if mx and n_frames > mx and "motion_window" not in kwargs:
            # longer clips than the trained temporal window: sweep
            # overlapping frame windows automatically (pipeline
            # motion_window — the community context scheduler)
            kwargs["motion_window"] = mx
        return pipeline_mod.generate_images(
            [prompt], uncond_prompt, n_frames=int(n_frames),
            **self._kw(kwargs))

    def with_upscaler(self, upscaler):
        """Attach an ESRGAN/RealESRGAN pixel upscaler (models/esrgan.py).

        ``upscaler`` is a weight file path (.pth/.safetensors, old- or
        new-arch naming) or a ready ``(params, ESRGANConfig)`` pair.
        Enables :meth:`upscale` and ``hires_fix(upscale_method=
        "esrgan")``."""
        if isinstance(upscaler, str):
            from .weights.esrgan import load_esrgan

            upscaler = load_esrgan(upscaler)
        from .models.esrgan import ESRGANConfig

        try:
            params, ecfg = upscaler
        except (TypeError, ValueError) as e:
            raise ValueError(
                "with_upscaler expects a weight file path or a "
                "(params, ESRGANConfig) pair, got "
                f"{type(upscaler).__name__}") from e
        # a 2-unpackable wrong value (e.g. a (path, strength) guess)
        # must also fail HERE, not as an AttributeError deep in upscale()
        if not isinstance(ecfg, ESRGANConfig) or not isinstance(params,
                                                                dict):
            raise ValueError(
                "with_upscaler pair must be (params dict, ESRGANConfig); "
                f"got ({type(params).__name__}, {type(ecfg).__name__})")
        out = self._clone()
        out._upscaler = (_place_host_arrays(params, self.mesh), ecfg)
        return out

    def upscale(self, image, *, tile: Optional[int] = None,
                tile_lanes: int = 8) -> np.ndarray:
        """Upscale an image with the attached ESRGAN (the A1111 "Extras"
        upscale flow).  ``tile``: process in padded tiles (memory bound
        for large inputs); independent tiles ride the batch axis in
        chunks of ``tile_lanes``."""
        if getattr(self, "_upscaler", None) is None:
            raise ValueError("no upscaler attached (with_upscaler)")
        from .models import esrgan as esrgan_mod

        params, ecfg = self._upscaler
        return esrgan_mod.upscale_image(params, image, ecfg,
                                        self.config.policy, tile=tile,
                                        tile_lanes=tile_lanes)

    def with_ip_adapter(self, adapter, image_encoder, *, vision_config=None):
        """Return a bundle with an IP-Adapter attached (image prompting,
        Ye et al. 2023; weights/ip_adapter.py).

        ``adapter`` is an IP-Adapter weight file (.bin / .safetensors,
        h94-style) or a converted pytree; ``image_encoder`` the CLIP
        vision weight file (HF ``CLIPVisionModelWithProjection`` layout)
        or pytree; ``vision_config`` the matching
        ``models/clip_vision.CLIPVisionConfig`` (default ViT-H/14 — the
        SD-1.x adapters' encoder; pass ``clip_vision.vit_bigg14()`` for
        the SDXL ones).  Generation kwargs then accept
        ``ip_adapter_image`` (+ traced ``ip_adapter_scale``)."""
        from .models import clip_vision as cv
        from .weights import ip_adapter as ipw

        vis_cfg = vision_config or cv.vit_h14()
        ada = ipw.load_ip_adapter(adapter, self.config.unet) \
            if isinstance(adapter, str) else adapter
        enc = ipw.load_clip_vision(image_encoder, vis_cfg) \
            if isinstance(image_encoder, str) else image_encoder
        out = self._clone(models=dict(self.models, ip_adapter=ada,
                                      clip_vision=enc), reshard=True)
        out._ip_vision = vis_cfg
        return out

    def with_t2i_adapter(self, adapter):
        """Return a bundle with a T2I-Adapter attached
        (models/t2i_adapter.py — lightweight spatial conditioning whose
        features are computed once per generation, not per step).

        ``adapter`` is a diffusers ``T2IAdapter`` directory or weight file
        (weights/diffusers.py ``load_t2i_adapter``), an already-converted
        pytree, or a LIST of those (multi-adapter: features sum; pass
        matching lists as ``adapter_image`` / ``adapter_scale``).
        Generation kwargs then accept ``adapter_image``
        (+ ``adapter_scale``)."""
        def _load(ad):
            if not isinstance(ad, str):
                return ad
            from .weights.diffusers import load_t2i_adapter

            return load_t2i_adapter(ad, self.config)

        adapter = [_load(a) for a in adapter] \
            if isinstance(adapter, (list, tuple)) else _load(adapter)
        return self._clone(models=dict(self.models, t2i_adapter=adapter),
                           reshard=True)

    @staticmethod
    def _fill_masked(init_image, mask_image, sigma: float = 8.0):
        """A1111 "masked content: fill": seed the repaint region with a
        heavy blur of the surrounding content (masked pixels first
        replaced by the unmasked mean so they don't bleed into the fill).
        Host-side preprocessing; returns a uint8 image."""
        from .utils.annotators import blur as _np_blur

        img = _to_rgb_float(init_image)
        m = np.asarray(
            mask_image.convert("L") if hasattr(mask_image, "convert")
            else mask_image, np.float32)
        if m.ndim == 3:
            m = m[..., 0]
        if m.max() > 1.0:
            m = m / 255.0
        if m.shape != img.shape[:2]:
            raise ValueError(f"mask shape {m.shape} != image "
                             f"{img.shape[:2]}")
        keep = (m <= 0.5)
        mean = img[keep].reshape(-1, 3).mean(axis=0) if keep.any() \
            else np.full(3, 127.5, np.float32)
        seeded = np.where(keep[..., None], img, mean)
        blurred = np.stack([_np_blur(seeded[..., c] / 255.0, sigma=sigma)
                            for c in range(3)], axis=-1) * 255.0
        out = np.where(keep[..., None], img, blurred)
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    def inpaint(self, prompt: str, init_image, mask_image,
                strength: float = 1.0, uncond_prompt: str = "", *,
                full_res: bool = False, full_res_padding: int = 32,
                masked_content: str = "original",
                **kwargs) -> np.ndarray:
        """Repaint the masked region (mask 1 = repaint, 0 = keep).

        With a 9-channel inpaint checkpoint (``sd15_inpaint_config`` /
        ``sd2_inpaint_config``) the mask conditions the UNet directly; with
        any standard 4-channel checkpoint the pipeline falls back to
        latent-blend masking.  ``strength`` works like img2img (1.0 =
        repaint from full noise).

        ``full_res=True`` is A1111's "inpaint at full resolution": the
        mask's bounding box (+ ``full_res_padding`` source pixels, expanded
        toward the processing aspect ratio) is cropped out, inpainted at
        the full ``height``x``width`` processing resolution, downscaled,
        and blended back into the ORIGINAL image — so a small masked
        region gets the model's native pixel density.  The return value is
        at the original image's resolution (not ``height``x``width``).

        ``masked_content``: "original" (keep the image under the mask as
        the denoise start) or "fill" (A1111: seed the region with a heavy
        blur of the surroundings — useful at lower strengths to remove the
        original object).  Strength 1.0 denoises the region from pure
        noise either way ("latent noise" semantics)."""
        if masked_content not in ("original", "fill"):
            raise ValueError(f"unknown masked_content {masked_content!r} "
                             "(original | fill)")
        if masked_content == "fill":
            init_image = self._fill_masked(init_image, mask_image)
        if not full_res:
            return pipeline_mod.generate(prompt, uncond_prompt,
                                         input_image=init_image,
                                         mask_image=mask_image,
                                         strength=strength,
                                         **self._kw(kwargs))
        import jax

        h = kwargs.get("height", 512)
        w = kwargs.get("width", 512)
        img = _to_rgb_float(init_image)  # (H0, W0, 3), 0..255
        m = np.asarray(
            mask_image.convert("L") if hasattr(mask_image, "convert")
            else mask_image, np.float32)
        if m.ndim == 3:
            m = m[..., 0]
        if m.max() > 1.0:
            m = m / 255.0
        H0, W0 = img.shape[:2]
        if m.shape != (H0, W0):
            raise ValueError(f"mask shape {m.shape} != image {(H0, W0)}")

        ys, xs = np.nonzero(m > 0.5)
        if len(ys) == 0:  # empty mask: nothing to crop around
            return pipeline_mod.generate(prompt, uncond_prompt,
                                         input_image=init_image,
                                         mask_image=mask_image,
                                         strength=strength,
                                         **self._kw(kwargs))
        y0 = max(int(ys.min()) - full_res_padding, 0)
        y1 = min(int(ys.max()) + 1 + full_res_padding, H0)
        x0 = max(int(xs.min()) - full_res_padding, 0)
        x1 = min(int(xs.max()) + 1 + full_res_padding, W0)
        # expand the short side toward the processing aspect ratio (h/w),
        # clamped to the image — keeps the upscale near-isotropic
        ch, cw = y1 - y0, x1 - x0
        if ch * w < cw * h:  # too wide: grow height
            want = min(int(round(cw * h / w)), H0)
            extra = want - ch
            y0 = max(y0 - extra // 2, 0)
            y1 = min(y0 + want, H0)
            y0 = max(y1 - want, 0)
        elif cw * h < ch * w:  # too tall: grow width
            want = min(int(round(ch * w / h)), W0)
            extra = want - cw
            x0 = max(x0 - extra // 2, 0)
            x1 = min(x0 + want, W0)
            x0 = max(x1 - want, 0)

        crop = img[y0:y1, x0:x1]
        mcrop = m[y0:y1, x0:x1]
        up_img = np.asarray(jax.image.resize(crop, (h, w, 3), "bilinear"))
        up_mask = np.asarray(jax.image.resize(mcrop, (h, w), "bilinear"))
        out = pipeline_mod.generate(prompt, uncond_prompt,
                                    input_image=np.clip(up_img, 0, 255)
                                    .astype(np.uint8),
                                    mask_image=np.clip(up_mask, 0, 1),
                                    strength=strength, **self._kw(kwargs))
        back = np.asarray(jax.image.resize(
            out.astype(np.float32), (y1 - y0, x1 - x0, 3), "bilinear"))
        blend = mcrop[..., None]
        result = img.copy()
        result[y0:y1, x0:x1] = blend * back + (1.0 - blend) * crop
        return np.clip(np.round(result), 0, 255).astype(np.uint8)

    def outpaint(self, prompt: str, image, *, pixels: int = 64,
                 directions=("left", "right", "up", "down"),
                 strength: float = 1.0, mask_blur: int = 4,
                 uncond_prompt: str = "", **kwargs) -> np.ndarray:
        """A1111's "poor man's outpainting": grow the canvas by ``pixels``
        in the given directions, seed the new area with edge-replicated
        content, and inpaint it (the kept region is the original image).
        The processing resolution is the padded canvas — ``pixels`` and the
        image dims must keep it a multiple of the VAE factor.  Returns the
        full padded canvas (uint8)."""
        img = _to_rgb_float(image)
        h0, w0 = img.shape[:2]
        top = pixels if "up" in directions else 0
        bot = pixels if "down" in directions else 0
        lef = pixels if "left" in directions else 0
        rig = pixels if "right" in directions else 0
        if not (top or bot or lef or rig):
            raise ValueError("no outpaint directions given")
        canvas = np.pad(img, ((top, bot), (lef, rig), (0, 0)), mode="edge")
        mask = np.ones(canvas.shape[:2], np.float32)
        mask[top:top + h0, lef:lef + w0] = 0.0  # keep the original
        h, w = canvas.shape[:2]
        f = self.config.vae.downsample_factor
        if h % f or w % f:
            raise ValueError(f"padded canvas {h}x{w} must be a multiple of "
                             f"{f}; adjust pixels/image size")
        kwargs.pop("height", None), kwargs.pop("width", None)
        return pipeline_mod.generate(
            prompt, uncond_prompt,
            input_image=np.clip(canvas, 0, 255).astype(np.uint8),
            mask_image=mask, mask_blur=mask_blur, strength=strength,
            height=h, width=w, **self._kw(kwargs))

    def sd_upscale(self, prompt: str, image, *, scale: float = 2.0,
                   strength: float = 0.3, overlap: int = 64,
                   uncond_prompt: str = "", height: int = 512,
                   width: int = 512, batch_size: int = 4,
                   **kwargs) -> np.ndarray:
        """A1111's built-in "SD upscale" script: lanczos-upscale the image
        by ``scale``, split it into overlapping ``height``x``width`` tiles,
        img2img every tile at ``strength``, and stitch with linear
        feathering across the ``overlap`` bands.  Every tile shares ONE
        compiled shape (the processing size), batched ``batch_size`` at a
        time through the serving path; per-sample PRNG folding gives each
        tile distinct, deterministic noise.  Returns the full upscaled
        image (uint8)."""
        import jax

        img = _to_rgb_float(image)
        h0, w0 = img.shape[:2]
        th, tw = int(round(h0 * scale)), int(round(w0 * scale))
        # validate BEFORE the lanczos resize (an eager jax op — expensive
        # on the error path)
        if th <= height and tw <= width:
            raise ValueError(f"upscaled size {th}x{tw} fits one processing "
                             f"tile {height}x{width}; use img2img directly")
        if th < height or tw < width:
            raise ValueError(
                f"upscaled size {th}x{tw} is smaller than the processing "
                f"tile {height}x{width} in one dimension; pick a tile size "
                "that fits both")
        if overlap >= min(height, width):
            raise ValueError("overlap must be smaller than the tile size")
        up = np.asarray(jax.image.resize(jax.numpy.asarray(img),
                                         (th, tw, 3), "lanczos3"))
        up = np.clip(up, 0, 255)

        def starts(total, tile):
            if total <= tile:
                return [0]
            stride = tile - overlap
            s = list(range(0, total - tile, stride)) + [total - tile]
            return sorted(set(s))

        ys, xs = starts(th, height), starts(tw, width)
        tiles = np.stack([up[y:y + height, x:x + width]
                          for y in ys for x in xs]).astype(np.uint8)
        outs = self.generate_many([prompt] * len(tiles),
                                  [uncond_prompt] * len(tiles),
                                  batch_size=batch_size,
                                  input_image=tiles, height=height,
                                  width=width, strength=strength, **kwargs)

        # feathered accumulation: BOTH edges of an interior tile ramp
        # (leading 0->1, trailing 1->0), so neighbours crossfade fully —
        # one-sided ramps leave a ~50% blend jump at the old tile's edge.
        # Ramps stay strictly positive so total weight never vanishes.
        def ramp(idx, last, tile):
            w = np.ones(tile, np.float32)
            e = min(overlap, tile)
            edge = np.linspace(0.0, 1.0, e + 2)[1:-1]  # in (0, 1)
            if idx > 0:
                w[:e] = edge
            if idx < last:
                w[-e:] = np.minimum(w[-e:], edge[::-1])
            return w

        acc = np.zeros((th, tw, 3), np.float64)
        wacc = np.zeros((th, tw, 1), np.float64)
        i = 0
        for yi, y in enumerate(ys):
            for xi, x in enumerate(xs):
                wy = ramp(yi, len(ys) - 1, height)[:, None]
                wx = ramp(xi, len(xs) - 1, width)[None, :]
                wt = (wy * wx)[..., None]
                acc[y:y + height, x:x + width] += outs[i].astype(np.float64) * wt
                wacc[y:y + height, x:x + width] += wt
                i += 1
        return np.clip(np.round(acc / np.maximum(wacc, 1e-8)), 0,
                       255).astype(np.uint8)

    def prompt_matrix(self, prompt: str, uncond_prompt: str = "", *,
                      batch_size: int = 4, **kwargs) -> np.ndarray:
        """A1111's "Prompt matrix" script: ``"base|opt A|opt B"`` generates
        every SUBSET combination of the |-separated options appended to
        the base prompt (2^n images), batched through the serving path,
        and returns them assembled into one 2^(n//2+...) grid image.

        Returns the grid (uint8); the individual prompts used are in
        row-major subset order (bit i of the index = option i included)."""
        parts = [p.strip() for p in prompt.split("|")]
        base, opts = parts[0], parts[1:]
        if not opts:
            raise ValueError("prompt_matrix needs |-separated options")
        if len(opts) > 4:
            raise ValueError("prompt_matrix caps at 4 options (16 images)")
        prompts = []
        for bits in range(2 ** len(opts)):
            chosen = [o for i, o in enumerate(opts) if bits >> i & 1]
            prompts.append(", ".join([base] + chosen))
        imgs = self.generate_many(prompts, uncond_prompt,
                                  batch_size=batch_size, **kwargs)
        cols = 2 ** ((len(opts) + 1) // 2)
        rows = len(prompts) // cols
        h, w = imgs.shape[1:3]
        return (imgs.reshape(rows, cols, h, w, 3)
                .transpose(0, 2, 1, 3, 4).reshape(rows * h, cols * w, 3))

    def xyz_grid(self, prompt: str, uncond_prompt: str = "", *,
                 x=None, y=None, **kwargs) -> np.ndarray:
        """A1111's "X/Y plot" script: sweep one generation kwarg per axis
        (``x=("cfg_scale", [5, 7.5, 10])``, ``y=("sampler_name",
        ["euler", "dpm++"])``) and assemble the results into one grid
        image (x varies along columns, y along rows).

        Traced knobs (cfg_scale, pag/sag scales, strengths...) reuse one
        compiled program across the sweep; graph-shaping axes (sampler,
        steps, size) compile once per distinct value."""
        xk, xs = x if x is not None else (None, [None])
        yk, ys = y if y is not None else (None, [None])
        if xk is None and yk is None:
            raise ValueError("xyz_grid needs at least one of x=, y=")
        rows = []
        for yv in ys:
            row = []
            for xv in xs:
                kw = dict(kwargs)
                if xk is not None:
                    kw[xk] = xv
                if yk is not None:
                    kw[yk] = yv
                row.append(self.txt2img(prompt, uncond_prompt, **kw))
            rows.append(np.concatenate(row, axis=1))
        return np.concatenate(rows, axis=0)

    def generate_batch(self, prompts: Sequence[str], uncond_prompts="",
                       **kwargs) -> np.ndarray:
        return pipeline_mod.generate_images(list(prompts), uncond_prompts,
                                            **self._kw(kwargs))

    def generate_many(self, prompts: Sequence[str], uncond_prompts="",
                      batch_size: int = 4, **kwargs) -> np.ndarray:
        """Serving path: any number of prompts, pipelined in fixed-size
        compiled batches (async dispatch; see pipeline.generate_many)."""
        return pipeline_mod.generate_many(list(prompts), uncond_prompts,
                                          batch_size=batch_size,
                                          **self._kw(kwargs))
