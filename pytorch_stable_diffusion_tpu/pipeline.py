"""txt2img / img2img generation pipeline.

Behavior-parity target: ``/root/reference/sd/pipeline.py`` — same public
semantics and keyword names as ``generate()`` (``pipeline.py:13-27``), with
the TPU-native execution model:

  * The whole denoise loop is ONE jit-compiled ``lax.scan`` over timesteps —
    no per-step Python dispatch, and the time embedding is computed inside
    the compiled graph (the reference rebuilds it on host and transfers it
    every step, ``pipeline.py:211``).
  * CFG runs cond+uncond as one batched UNet call (the reference already
    does this, ``pipeline.py:221`` — kept) with
    ``eps = scale * (cond - uncond) + uncond`` (``pipeline.py:230-233``).
  * img2img strength becomes a *traced* ``start_step`` (scan steps before it
    are passed through unchanged), so one compilation serves every strength
    — the reference instead truncates the Python timestep list
    (``sd/ddpm.py:90-99``).
  * ``device`` / ``idle_device`` are accepted for API compatibility but
    ignored: weights stay HBM-resident (the reference's per-stage CPU
    offload, ``pipeline.py:80-85``, is a VRAM workaround TPUs don't need).
  * One root PRNG key replaces the reference's shared ``torch.Generator``
    (``pipeline.py:92-98``): named streams 'latent_init' / 'encoder_noise' /
    'sampler', folded per sample index so results are independent of batch
    size and shard count.  Parity tests may instead inject recorded noise
    via ``fixed_noise``.

Compiled-function cache is keyed on (H, W, steps, do_cfg, batch, img2img,
config) — repeated calls with the same shape reuse the compilation.
"""

from __future__ import annotations

import functools
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import rng as rng_mod
from .core.dtypes import Policy
from .models import clip as clip_mod
from .models import unet as unet_mod
from .models import vae as vae_mod
from .models.config import SDConfig, sd15_config
from . import prompt_schedule
from .sampling import (ddim, ddpm, dpm, dpm2,
                       dpm_adaptive as dpm_adaptive_mod,
                       dpm_fast as dpm_fast_mod,
                       euler, lcm, lms, pndm,
                       restart as restart_mod, unipc)

SAMPLERS = ("ddpm", "ddim", "dpm++", "dpm++_sde", "dpm++_3m_sde",
            "dpm++_2s_a", "euler", "euler_a", "heun", "unipc", "lcm", "plms",
            "lms", "dpm2", "dpm2_a", "restart", "dpm_fast", "dpm_adaptive")

#: Largest GLOBAL self-attention sequence validated on hardware (2048²'s
#: 65536-token level-1 runs clean; 262144 faults the TPU worker mid-run —
#: round-5 queue 21).  generate() refuses bigger exact-mode grids.
MAX_VALIDATED_ATTN_TOKENS = 65536

# --------------------------------------------------------------- tokenizing
def _encode_tokens(tokenizer, prompts, max_len: int) -> np.ndarray:
    """Accept our CLIPTokenizer or a transformers tokenizer (duck-typed)."""
    if hasattr(tokenizer, "batch_encode"):
        ids = tokenizer.batch_encode(prompts)
    else:  # transformers API, as used by the reference (pipeline.py:109-115)
        ids = tokenizer.batch_encode_plus(
            prompts, padding="max_length", max_length=max_len, truncation=True
        ).input_ids
    return np.asarray(ids, np.int32)


# ------------------------------------------------------------ image helpers
def rescale(x, old_range, new_range, clamp: bool = False):
    """Linear range remap (reference ``pipeline.py:265-307``)."""
    old_min, old_max = old_range
    new_min, new_max = new_range
    x = (x - old_min) * (new_max - new_min) / (old_max - old_min) + new_min
    if clamp:
        x = jnp.clip(x, new_min, new_max) if isinstance(x, jax.Array) else np.clip(x, new_min, new_max)
    return x


def _prepare_image(input_image, width: int, height: int) -> np.ndarray:
    """PIL image / array -> (1, H, W, 3) float32 in [-1, 1].

    A 4-D array is a per-sample batch (each sample its own init image —
    the tiled sd_upscale path) and returns (B, H, W, 3)."""
    if not isinstance(input_image, np.ndarray) and hasattr(input_image, "resize"):
        input_image = input_image.resize((width, height))  # PIL
        arr = np.asarray(input_image, np.float32)
    else:
        arr = np.asarray(input_image, np.float32)
        spatial = arr.shape[1:3] if arr.ndim == 4 else arr.shape[:2]
        if spatial != (height, width):
            raise ValueError(f"input image must be {height}x{width}, got {arr.shape}")
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    arr = arr[..., :3]
    arr = rescale(arr, (0.0, 255.0), (-1.0, 1.0))
    return arr if arr.ndim == 4 else arr[None]


def _prepare_mask(mask_image, width: int, height: int) -> np.ndarray:
    """PIL image / array -> (1, H, W, 1) float32 in [0, 1].

    Convention (diffusers-compatible): 1 = repaint, 0 = keep original.
    """
    if not isinstance(mask_image, np.ndarray) and hasattr(mask_image, "resize"):
        m = mask_image.convert("L") if hasattr(mask_image, "convert") else mask_image
        arr = np.asarray(m.resize((width, height)), np.float32) / 255.0
    else:
        arr = np.asarray(mask_image, np.float32)
        if arr.ndim == 3:
            arr = arr[..., 0]
        if arr.shape != (height, width):
            raise ValueError(f"mask must be {height}x{width}, got {arr.shape}")
        if arr.max() > 1.0:
            arr = arr / 255.0
    return np.clip(arr, 0.0, 1.0)[None, ..., None]


def mask_to_latent_nearest(mask, factor: int):
    """(B, H, W, 1) -> (B, H/f, W/f, 1) by nearest sampling (the 9-channel
    inpaint UNet's training-time mask conditioning; diffusers uses
    ``interpolate(mode="nearest")`` which picks the top-left of each cell)."""
    return mask[:, ::factor, ::factor, :]


def mask_to_latent_area(mask, factor: int):
    """(B, H, W, 1) -> (B, H/f, W/f, 1) by area mean — soft edges for the
    latent-blend inpaint mode (keeps the seam smooth after decode)."""
    b, h, w, _ = mask.shape
    return mask.reshape(b, h // factor, factor, w // factor, factor, 1).mean(
        axis=(2, 4))


def _progress_tick(step_i, n_steps):
    """Host-side denoise progress (the reference wraps the loop in tqdm,
    ``pipeline.py:205``; our loop is compiled, so this is a debug callback)."""
    print(f"\rdenoise step {int(step_i) + 1}/{n_steps}", end="", flush=True)
    if int(step_i) + 1 == n_steps:
        print()


def match_histograms(src: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Per-channel exact histogram matching (skimage ``match_histograms``
    semantics) — A1111's img2img "apply color correction" uses this to pin
    the output's palette to the init image's.  uint8 HWC in/out."""
    out = np.empty_like(src)
    for c in range(src.shape[-1]):
        s = src[..., c].ravel().astype(np.float64)
        r = ref[..., c].ravel().astype(np.float64)
        s_vals, s_inv, s_counts = np.unique(s, return_inverse=True,
                                            return_counts=True)
        r_vals, r_counts = np.unique(r, return_counts=True)
        s_q = np.cumsum(s_counts) / s.size
        r_q = np.cumsum(r_counts) / r.size
        mapped = np.interp(s_q, r_q, r_vals)
        out[..., c] = mapped[s_inv].reshape(src.shape[:-1])
    return out.astype(src.dtype)


def _lane(ctx, sl):
    """Slice a batch-lane range out of a context that may be a hypernetwork
    (ctx_k, ctx_v) tuple."""
    return tuple(t[sl] for t in ctx) if isinstance(ctx, tuple) else ctx[sl]


def gaussian_blur(x, ksize: int = 9, sigma: float = 1.0):
    """Separable depthwise gaussian blur on NHWC with reflect padding —
    diffusers' ``gaussian_blur_2d`` (the SAG degradation operator)."""
    ax = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k1 = np.exp(-0.5 * (ax / sigma) ** 2)
    k1 /= k1.sum()
    c = x.shape[-1]
    kv = jnp.asarray(np.tile(k1.reshape(ksize, 1, 1, 1), (1, 1, 1, c)),
                     x.dtype)
    kh = jnp.asarray(np.tile(k1.reshape(1, ksize, 1, 1), (1, 1, 1, c)),
                     x.dtype)
    pad = ksize // 2
    y = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    dn = jax.lax.conv_dimension_numbers(y.shape, kv.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(y, kv, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return jax.lax.conv_general_dilated(y, kh, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=c)


def slerp_noise(t, low, high):
    """Per-sample spherical interpolation between two noise tensors (the
    A1111 variation-seed combiner).  Great-circle interpolation keeps the
    result's norm on the gaussian shell, unlike a lerp which would shrink
    it.  Exact at the ends: t == 0 returns ``low`` bitwise, t == 1 returns
    ``high`` bitwise (sin(w)/sin(w) == 1.0 and sin(0) == 0.0 in IEEE).
    Near-parallel inputs (sin(omega) ~ 0) fall back to a lerp.
    """
    b = low.shape[0]
    lo = low.reshape(b, -1).astype(jnp.float32)
    hi = high.reshape(b, -1).astype(jnp.float32)
    lon = lo / jnp.linalg.norm(lo, axis=1, keepdims=True)
    hin = hi / jnp.linalg.norm(hi, axis=1, keepdims=True)
    dot = jnp.clip(jnp.sum(lon * hin, axis=1, keepdims=True), -1.0, 1.0)
    omega = jnp.arccos(dot)
    so = jnp.sin(omega)
    safe = jnp.abs(so) > 1e-6
    so_ = jnp.where(safe, so, 1.0)
    out = jnp.where(
        safe,
        (jnp.sin((1.0 - t) * omega) / so_) * lo
        + (jnp.sin(t * omega) / so_) * hi,
        (1.0 - t) * lo + t * hi)
    return out.reshape(low.shape)


def canonical_size_ids(cfg: SDConfig, height: int, width: int,
                       original_size, crop_coords, target_size):
    """Validate + canonicalize SDXL micro-conditioning knobs to a static
    6-tuple (orig_h, orig_w, crop_top, crop_left, tgt_h, tgt_w) — or None
    when they equal the implicit defaults (so the same compiled program /
    AOT artifact is keyed).  Shared by generate() and utils/aot.py so the
    exported artifact's graph-shape key always matches the live pipeline's.
    """
    if (original_size is None and tuple(crop_coords) == (0, 0)
            and target_size is None):
        return None
    if cfg.unet.add_embed_dim is None:
        raise ValueError("original_size/crop_coords/target_size are "
                         "SDXL micro-conditioning (add_embed families "
                         "only)")
    if cfg.unet.add_time_ids == 5 and target_size is not None:
        raise ValueError("refiner families (5 add_time_ids) have no "
                         "target_size id; drop target_size")
    oh, ow = original_size or (height, width)
    tgt_h, tgt_w = target_size or (height, width)
    size_ids = (float(oh), float(ow), float(crop_coords[0]),
                float(crop_coords[1]), float(tgt_h), float(tgt_w))
    if size_ids == (float(height), float(width), 0.0, 0.0,
                    float(height), float(width)):
        return None  # identical to the implicit ids: don't key a second
        # compiled variant for the same program
    return size_ids


def get_time_embedding(timestep) -> jax.Array:
    """(1, 320) sinusoidal embedding — reference helper parity
    (``pipeline.py:310-349``)."""
    return unet_mod.timestep_embedding(timestep, 320)


# --------------------------------------------------------- compiled core fns
@functools.lru_cache(maxsize=8)
def _compiled_txt2img(cfg: SDConfig, n_steps: int, do_cfg: bool, batch: int,
                      h_lat: int, w_lat: int, img2img: bool,
                      fixed_noise: bool = False, progress: bool = False,
                      sampler: str = "ddpm", eta: float = 0.0,
                      decode_tile: Optional[int] = None, sp_mesh=None,
                      inpaint: Optional[str] = None,
                      use_control: bool = False,
                      use_adapter: bool = False,
                      ip2p: bool = False,
                      guidance_rescale: float = 0.0,
                      timestep_spacing: str = "uniform",
                      emphasis: bool = False,
                      deepcache: Optional[int] = None,
                      n_sched: int = 1,
                      variation: bool = False,
                      pag: bool = False,
                      encode_tile: Optional[int] = None,
                      hyper: Optional[Tuple[str, bool]] = None,
                      sag: bool = False,
                      n_and: int = 1,
                      tiling: bool = False,
                      dyn_thresh: bool = False,
                      noise_multiplier: bool = False,
                      size_ids: Optional[Tuple[float, ...]] = None,
                      use_ip: bool = False,
                      ip_vision=None,
                      use_ref: bool = False,
                      ref_mode: str = "attn",
                      pano=None,
                      use_regions: bool = False,
                      n_frames: Optional[int] = None,
                      motion_win=None):
    """Build + jit the full generate computation for one static shape.

    ``fixed_noise=True`` compiles a variant whose latent-init / encoder /
    per-step sampler noise are caller-supplied arrays instead of PRNG draws
    — used by parity tests to compare against recorded reference noise.

    ``sp_mesh``: sequence-parallel latency mode (parallel/sp.py) — the UNet
    input is sharding-constrained on the latent-H axis over the mesh's
    'model' axis, so GSPMD spatially partitions the denoise loop: halo
    exchanges for the 3x3 convs, q-sharded attention with gathered K/V.

    ``inpaint``: None, "unet9" (dedicated 9-channel inpaint UNet — per-step
    input is [latents, nearest-downsampled mask, masked-image latents], the
    runwayml/sd-inpainting conditioning), or "blend" (works with ANY
    4-channel checkpoint: each step re-noises the original latents to the
    current timestep and blends them into the kept region, with an exact
    final blend — the classic latent-blend / legacy-inpaint algorithm).
    The mask rides in ``noises["mask"]`` as (B, H, W, 1) float, 1 = repaint.

    ``use_control``: ControlNet conditioning (models/controlnet.py) —
    ``params["controlnet"]`` holds the side network, the conditioning image
    rides in ``noises["control_hint"]`` ((B, H, W, 3) in [0, 1]) and the
    strength in ``noises["control_scale"]`` (traced — no recompile per
    scale).  The hint encoder runs ONCE per generation; per step the side
    network's zero-conv residuals are added to the UNet skips/bottleneck.

    ``use_adapter``: T2I-Adapter conditioning (models/t2i_adapter.py) —
    ``params["t2i_adapter"]`` holds one adapter pytree or a list, hints
    ride stacked in ``noises["adapter_hint"]`` ((N, B, H, W, 3) in [0, 1])
    and scales traced in ``noises["adapter_scale"]`` ((N,)).  The adapter
    never sees latents/timestep/context, so its per-level features are
    computed ONCE per generation (multi-adapter features sum — the
    diffusers MultiAdapter contract) and added inside the UNet encoder
    every step.

    ``ip2p``: InstructPix2Pix (Brooks et al. 2023) — the UNet input is
    [latents, edit-image latents] (8 channels), the edit image rides the
    ``init_image`` slot with ``img2img=False`` (its VAE MODE is encoded
    once per generation, unscaled — the family's published quirk), and
    guidance runs THREE lanes [text+image, image-only, unconditional]
    combined as eps_u + cfg·(eps_t − eps_i) + s_img·(eps_i − eps_u) with
    ``s_img`` traced in ``noises["image_cfg_scale"]``.

    ``emphasis``: A1111 prompt-emphasis weighting — per-token weights ride
    in ``noises["cond_weights"]``/``noises["uncond_weights"]`` ((B, L) or
    (B, k, L) float, traced) and scale the encoder hidden states with the
    original per-row mean restored (the A1111 renormalization; each
    long-prompt window renormalizes independently, as A1111 processes
    chunks independently).

    ``variation``: A1111 variation seeds — a second PRNG key
    (``noises["variation_key"]``) draws an alternative initial noise and
    the final init noise is the per-sample spherical interpolation between
    the two at ``noises["variation_strength"]`` (traced — no recompile per
    strength).  Strength 0 reproduces the base seed bitwise, strength 1
    the variation seed's init noise bitwise.

    ``pag``: Perturbed-Attention Guidance (Ahn et al. 2024) — every step
    runs one extra UNet eval on the conditional lane with the mid-block
    self-attention replaced by an identity map, and the prediction gains
    ``pag_scale * (eps_cond - eps_perturbed)`` on top of CFG (the
    diffusers StableDiffusionPAGPipeline combine).  The scale rides traced
    in ``noises["pag_scale"]`` — no recompile per scale.

    ``deepcache``: DeepCache interval N — the full UNet runs every N-th
    denoise step; between refreshes only the shallow slice runs against
    the cached deep backbone feature (models/unet.apply cache=...).  The
    cache rides in the fori_loop carry; both step variants live under one
    ``lax.cond``.  Opt-in approximation (N=1 is exact).
    """
    # third reference quirk: the reference's beta_start is a typo (0.000085
    # vs CompVis 0.00085, ref ddpm.py:30) — reproduce it only in quirk mode
    schedule = ddpm.make_schedule(
        beta_start=ddpm.REFERENCE_BETA_START if cfg.reference_quirks
        else ddpm.BETA_START,
        zero_terminal_snr=cfg.zero_terminal_snr)
    if sampler == "lcm":
        # LCM timesteps live on the distillation grid (sampling/lcm.py);
        # the Karras sigma grid has no meaning for a consistency model
        if timestep_spacing != "uniform":
            raise ValueError("sampler 'lcm' uses its own distillation-grid "
                             "timesteps; timestep_spacing must be 'uniform'")
        ts_np = lcm.inference_timesteps(n_steps)
    elif timestep_spacing == "karras":
        ts_np = ddpm.karras_timesteps(schedule, n_steps)
    elif timestep_spacing == "exponential":
        ts_np = ddpm.exponential_timesteps(schedule, n_steps)
    elif timestep_spacing == "trailing":
        ts_np = ddpm.trailing_timesteps(n_steps)
    elif timestep_spacing == "sgm_uniform":
        ts_np = ddpm.sgm_uniform_timesteps(n_steps)
    elif timestep_spacing == "kl_optimal":
        ts_np = ddpm.kl_optimal_timesteps(schedule, n_steps)
    elif timestep_spacing == "ays":
        # published table per family: SDXL-class configs (added
        # conditioning) use the SDXL table, everything else the SD one
        ts_np = ddpm.ays_timesteps(
            schedule, n_steps,
            table=ddpm.AYS_SIGMAS_SDXL if cfg.unet.add_embed_dim
            else ddpm.AYS_SIGMAS_SD)
    elif timestep_spacing == "beta":
        ts_np = ddpm.beta_timesteps(schedule, n_steps)
    elif timestep_spacing == "uniform":
        ts_np = ddpm.inference_timesteps(n_steps)
    else:
        raise ValueError(f"unknown timestep_spacing {timestep_spacing!r}")
    restart_plan = None
    if sampler == "restart":
        # restart builds its own (reduced) Karras main grid + segments
        # (sampling/restart.py); the pipeline grid is used only for the
        # strength->entry mapping
        restart_plan = restart_mod.build_plan(schedule, n_steps)
    fast_plan = None
    if sampler == "dpm_fast":
        # DPM fast builds its own t-space segment grid over the FULL
        # training sigma range (sampling/dpm_fast.py); the pipeline grid
        # is used only for the strength->entry mapping
        if timestep_spacing != "uniform":
            raise ValueError("sampler 'dpm_fast' defines its own t-space "
                             "grid; timestep_spacing must be 'uniform'")
        fast_plan = dpm_fast_mod.build_plan(schedule, n_steps)
    if sampler == "dpm_adaptive" and timestep_spacing != "uniform":
        raise ValueError("sampler 'dpm_adaptive' chooses its own steps "
                         "adaptively; timestep_spacing must be 'uniform'")
    timesteps = jnp.asarray(ts_np)
    # explicit next-step timestep per index (-1 past the end): identical to
    # the samplers' internal t - T//n on the uniform grid, required for the
    # non-uniform Karras grid
    prev_timesteps = jnp.asarray(np.append(ts_np[1:], -1).astype(np.int32))
    policy: Policy = cfg.policy
    lc = cfg.vae.latent_channels

    def _emphasize(h, w):
        # A1111 emphasis: scale each token's hidden state by its weight,
        # then restore the row's original mean (keeps CFG magnitudes sane).
        # The weighted mean is computed in DELTA form: the naive
        # mean(h*w)/mean(h) ratio is a quotient of two near-zero sums (the
        # final-LayerNorm output mean is ~0), where mere reduction-order
        # differences between compiled programs blow up the ratio; with
        # the delta form w == 1 contributes an exact zero, so no-emphasis
        # is bitwise-identical to the unweighted path.
        hf = h.astype(jnp.float32)
        wf = w[:, :, None]
        m0 = hf.mean(axis=(1, 2), keepdims=True)
        delta = (hf * (wf - 1.0)).mean(axis=(1, 2), keepdims=True)
        # The restore ratio is meaningful only when the means stand clear
        # of f32 cancellation noise (|mean| >> eps * mean|h|); a zero-mean
        # hidden (random-weight tests; LN bias 0) would otherwise divide
        # two rounding artifacts — possibly 0/0.  Degenerate rows skip the
        # restore (ratio 1), which also pins w == 1 to an exact no-op.
        scale = jnp.abs(hf).mean(axis=(1, 2), keepdims=True)
        den = m0 + delta
        ok = (jnp.abs(den) > 1e-6 * scale) & (jnp.abs(m0) > 1e-6 * scale)
        ratio = jnp.where(ok, m0 / jnp.where(ok, den, 1.0), 1.0)
        return (hf * wf * ratio).astype(h.dtype)

    def encode_text(params, tokens, weights=None):
        """-> (context, add_cond).  Single tower: (hidden, None).  SDXL
        dual tower: concat CLIP-L + bigG penultimate hiddens on features,
        and the bigG pooled embedding + 6x256 size embeddings through the
        UNet add_embedding (add_cond).  SDXL-refiner: the single bigG
        tower's hidden IS the context, pooled from the same tower, and the
        5th add_time_id is the aesthetic score.

        3-D tokens (B, k, L) are long prompts: k independent 77-token
        windows encoded in one batched CLIP call, hiddens concatenated to a
        (B, k*L, d) cross-attention context (the community long-prompt
        scheme).  Pooled-conditioning families (SDXL/refiner) pool from
        window 0 only — the A1111/sd_embed convention."""
        win_k = None
        if tokens.ndim == 3:
            b, win_k, L = tokens.shape
            tokens = tokens.reshape(b * win_k, L)
        if weights is not None and weights.ndim == 3:
            weights = weights.reshape(tokens.shape)

        def _weighted(h):
            return h if weights is None else _emphasize(h, weights)

        def _windows(h):
            # (b*k, L, d) -> (b, k*L, d)
            return h if win_k is None else \
                h.reshape(b, win_k * h.shape[1], h.shape[2])

        def _pool0(p):
            # (b*k, d) -> (b, d): window-0 pooled only
            return p if win_k is None else p.reshape(b, win_k, -1)[:, 0]

        if cfg.clip2 is None and cfg.unet.add_embed_dim is None:
            h = clip_mod.apply(params["clip"], tokens, cfg.clip, policy,
                               fuse_qkv=cfg.fuse_qkv)
            return _windows(_weighted(h)), None
        if cfg.clip2 is None:  # refiner: single tower + added conditioning
            hidden, pooled = clip_mod.apply_with_pooled(
                params["clip"], tokens, cfg.clip, policy,
                fuse_qkv=cfg.fuse_qkv)
            context = _windows(_weighted(hidden).astype(policy.compute_dtype))
            pooled = _pool0(pooled)
            pooled_dim = cfg.clip.d_model
        else:
            hidden = clip_mod.apply(params["clip"], tokens, cfg.clip, policy,
                                    fuse_qkv=cfg.fuse_qkv)
            hidden2, pooled = clip_mod.apply_with_pooled(
                params["clip2"], tokens, cfg.clip2, policy,
                fuse_qkv=cfg.fuse_qkv)
            context = jnp.concatenate(
                [_windows(_weighted(hidden).astype(policy.compute_dtype)),
                 _windows(_weighted(hidden2).astype(policy.compute_dtype))],
                axis=-1)
            pooled = _pool0(pooled)
            pooled_dim = cfg.clip2.d_model
        # add_time_ids, each sinusoidally embedded at
        # (add_embed_dim - pooled_dim)/n dims (SDXL: (2816-1280)/6 = 256):
        # base n=6 (orig_h, orig_w, crop_top, crop_left, tgt_h, tgt_w);
        # refiner n=5 (orig_h, orig_w, crop_top, crop_left, aesthetic).
        h_px, w_px = h_lat * cfg.vae.downsample_factor, \
            w_lat * cfg.vae.downsample_factor
        n_ids = cfg.unet.add_time_ids
        # SDXL micro-conditioning (diffusers original_size /
        # crops_coords_top_left / target_size): override the default
        # (h, w, 0, 0, h, w) ids; static — these are per-artifact choices
        base4 = size_ids[:4] if size_ids else (h_px, w_px, 0, 0)
        if n_ids == 5:
            ids = jnp.asarray(list(base4) + [cfg.aesthetic_score],
                              jnp.float32)
        else:
            tgt = size_ids[4:6] if size_ids else (h_px, w_px)
            ids = jnp.asarray(list(base4) + list(tgt), jnp.float32)
        size_dim = (cfg.unet.add_embed_dim - pooled_dim) // n_ids
        size_emb = unet_mod.timestep_embedding(ids, size_dim).reshape(1, -1)
        size_emb = jnp.broadcast_to(size_emb,
                                    (pooled.shape[0], n_ids * size_dim))
        add_cond = jnp.concatenate(
            [pooled.astype(jnp.float32), size_emb], axis=-1)
        return context, add_cond

    def run(params: Dict[str, Any], cond_tokens, uncond_tokens, key,
            cfg_scale, start_step, init_image, noises):
        # prompt editing (n_sched > 1): token arrays carry the K realized
        # schedules flattened into the leading axis (K*B, ...); one batched
        # CLIP call encodes them all, then the per-step conditioning is a
        # dynamic index into the (K, [2]B, ...) stack inside the loop
        context, add_cond = encode_text(
            params, cond_tokens,
            noises["cond_weights"] if emphasis else None)
        uncond_ctx = uncond_add = None
        if do_cfg:
            uncond_ctx, uncond_add = encode_text(
                params, uncond_tokens,
                noises["uncond_weights"] if emphasis else None)
        if n_sched > 1:
            sched_idx = noises["sched_idx"]

            def _stack(c, u):
                c = c.reshape((n_sched, batch) + c.shape[1:])
                if not do_cfg:
                    return c
                u = u.reshape((n_sched, batch) + u.shape[1:])
                return jnp.concatenate([c, u], axis=1)

            context = _stack(context, uncond_ctx)
            if add_cond is not None:
                add_cond = _stack(add_cond, uncond_add)
        elif do_cfg:
            # InstructPix2Pix runs THREE lanes: [text+image, image-only
            # (uncond text), unconditional] — Brooks et al. 2023 / the
            # diffusers pipeline's prompt_embeds ordering
            ctxs = [context, uncond_ctx, uncond_ctx] if ip2p \
                else [context, uncond_ctx]
            context = jnp.concatenate(ctxs, axis=0)
            if add_cond is not None:
                adds = [add_cond, uncond_add, uncond_add] if ip2p \
                    else [add_cond, uncond_add]
                add_cond = jnp.concatenate(adds, axis=0)

        if hyper is not None:
            # A1111 hypernetwork: transform the cross-attention context —
            # separately for k and v — once per generation; the tuple rides
            # through every cross-attention (ops/attention.apply)
            from .weights import hypernetwork as hyper_mod

            context = hyper_mod.apply_hypernetwork(
                params["hypernetwork"], context, noises["hyper_strength"],
                activation=hyper[0], activate_output=hyper[1])

        ip_arg = None
        if use_ip:
            # IP-Adapter (Ye et al. 2023): encode the prompt image ONCE per
            # generation through the CLIP vision tower + ImageProjModel;
            # the negative lane uses the zero image embedding projected
            # through the same model (the diffusers convention for the
            # standard adapter).  Tokens ride through every cross-attention
            # as decoupled image attention (models/unet.py ip=...).
            from .models import clip_vision as cv_mod

            ipp = params["ip_adapter"]
            ip_px = noises["ip_image"].astype(policy.compute_dtype)
            if "latents" in ipp["image_proj"]:
                # IP-Adapter-plus: the perceiver Resampler consumes the
                # PENULTIMATE vision hidden states; the negative lane runs
                # a zero image through the same path (diffusers
                # encode_image with output_hidden_states)
                def _plus_tokens(px):
                    h = cv_mod.apply(params["clip_vision"], px, ip_vision,
                                     policy,
                                     stop_at_layer=ip_vision.n_layers - 1)
                    return cv_mod.apply_resampler(ipp["image_proj"], h,
                                                  policy)

                cond_ip = _plus_tokens(ip_px)
                uncond_ip = _plus_tokens(jnp.zeros_like(ip_px))
            else:
                embed = cv_mod.apply_projected(params["clip_vision"],
                                               ip_px, ip_vision, policy)
                cond_ip = cv_mod.project_image_tokens(
                    ipp["image_proj"], embed, cfg.unet.d_context, policy)
                uncond_ip = cv_mod.project_image_tokens(
                    ipp["image_proj"], jnp.zeros_like(embed),
                    cfg.unet.d_context, policy)
            ip_tokens = jnp.concatenate([cond_ip] * n_and + [uncond_ip],
                                        axis=0) if do_cfg else cond_ip
            ip_arg = (ipp["layers"], ip_tokens, noises["ip_scale"])

        lat_shape = (batch, h_lat, w_lat, lc)

        def draw(name, extra=None):
            base = rng_mod.stream(key, name) if extra is None \
                else rng_mod.step_key(key, name, extra)
            ks = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(batch))
            return jax.vmap(
                lambda k: jax.random.normal(k, lat_shape[1:], jnp.float32))(ks)

        init_noise = noises["latent_init"] if fixed_noise else draw("latent_init")
        if variation:
            vbase = rng_mod.stream(noises["variation_key"], "latent_init")
            vks = jax.vmap(lambda i: jax.random.fold_in(vbase, i))(
                jnp.arange(batch))
            var_noise = jax.vmap(
                lambda k: jax.random.normal(k, lat_shape[1:],
                                            jnp.float32))(vks)
            init_noise = slerp_noise(noises["variation_strength"],
                                     init_noise, var_noise)
        if noise_multiplier:
            # A1111 "img2img initial noise multiplier" (also applies to
            # txt2img init noise when set); traced — no recompile per
            # value.  Applied AFTER the variation slerp, matching A1111's
            # processing order (ImageRNG slerps, then the multiplier).
            init_noise = init_noise * noises["noise_multiplier"]

        def all_step_noises(name):
            # one fused PRNG draw for all steps (values identical to per-step
            # draw(name, i) — same key folding, just batched)
            def step_draw(i):
                base = rng_mod.step_key(key, name, i)
                ks = jax.vmap(lambda j: jax.random.fold_in(base, j))(jnp.arange(batch))
                return jax.vmap(
                    lambda kk: jax.random.normal(kk, lat_shape[1:], jnp.float32))(ks)

            return jax.vmap(step_draw)(jnp.arange(n_steps))

        step_noises = noises["sampler_noise"] if fixed_noise \
            else all_step_noises("sampler")

        lat0 = None
        # restart / dpm_fast: the state enters the sampler's OWN grid, so
        # img2img must noise to ITS entry timestep, not the
        # pipeline grid's
        if restart_plan is not None:
            entry_ts = jnp.asarray(restart_plan["start_t"])
        elif fast_plan is not None:
            entry_ts = jnp.asarray(fast_plan["start_t"])
        else:
            entry_ts = timesteps
        if img2img == "latent":
            # init_image slot carries ready latents in the model's scaled
            # latent space (e.g. a base pass's output for hires-fix or a
            # base->refiner latent handoff — no decode/encode round trip)
            lat0 = init_image.astype(jnp.float32)
            t0 = entry_ts[start_step]
            latents = ddpm.add_noise(schedule, lat0, t0, init_noise)
        elif img2img:
            enc_noise = noises["encoder_noise"] if fixed_noise else draw("encoder_noise")
            _enc = (functools.partial(vae_mod.apply_encoder_tiled,
                                      tile=encode_tile)
                    if encode_tile else vae_mod.apply_encoder)
            lat0 = _enc(
                params["encoder"], init_image, enc_noise, cfg.vae, policy,
                attention_backend=cfg.vae_attention_backend,
                reference_quirks=cfg.reference_quirks).astype(jnp.float32)
            t0 = entry_ts[start_step]
            latents = ddpm.add_noise(schedule, lat0, t0, init_noise)
        else:
            latents = init_noise

        if ip2p:
            # InstructPix2Pix edit-image conditioning (Brooks et al. 2023;
            # the diffusers instruct_pix2pix pipeline): the VAE
            # distribution's MODE (zero encoder noise), and — a published
            # quirk of the family — NOT multiplied by the latent scale
            # factor, so our encoder's ×scale_factor is divided back out.
            # Computed once per generation.
            img_lat = vae_mod.apply_encoder(
                params["encoder"], init_image,
                jnp.zeros(lat_shape, jnp.float32), cfg.vae, policy,
                attention_backend=cfg.vae_attention_backend,
                reference_quirks=cfg.reference_quirks).astype(jnp.float32)
            img_lat = img_lat / cfg.vae.scale_factor
            # per-lane conditioning channels: zeros in the unconditional
            # (third) lane
            ip2p_extra = jnp.concatenate(
                [img_lat, img_lat, jnp.zeros_like(img_lat)],
                axis=0).astype(policy.compute_dtype)

        # ------------------------------------------------ inpaint conditioning
        factor = cfg.vae.downsample_factor
        if inpaint == "unet9":
            mask = noises["mask"]
            # conditioning channels: nearest-downsampled binary mask + the
            # VAE-encoded masked image (repaint region zeroed in [-1,1])
            mask_lat = mask_to_latent_nearest(mask, factor)
            binm = (mask > 0.5).astype(init_image.dtype)
            m_noise = noises["mask_encoder_noise"] if fixed_noise \
                else draw("mask_encoder_noise")
            _menc = (functools.partial(vae_mod.apply_encoder_tiled,
                                       tile=encode_tile)
                     if encode_tile else vae_mod.apply_encoder)
            masked_lat = _menc(
                params["encoder"], init_image * (1.0 - binm), m_noise,
                cfg.vae, policy,
                attention_backend=cfg.vae_attention_backend,
                reference_quirks=cfg.reference_quirks)
            inpaint_extra = jnp.concatenate(
                [mask_lat.astype(policy.compute_dtype),
                 masked_lat.astype(policy.compute_dtype)], axis=-1)
        elif inpaint == "blend":
            mask = noises["mask"]
            # soft (area-mean) latent mask keeps the seam smooth
            m_lat = mask_to_latent_area(mask, factor).astype(jnp.float32)
            blend_noises = step_noises if fixed_noise \
                else all_step_noises("inpaint")

        def inpaint_blend(step_i, lat):
            """Re-noise the originals to step_i's level and paste them into
            the kept region (legacy-inpaint / RePaint-style projection)."""
            if inpaint != "blend":
                return lat
            noised0 = ddpm.add_noise(schedule, lat0, timesteps[step_i],
                                     blend_noises[step_i])
            return m_lat * lat + (1.0 - m_lat) * noised0

        if use_control:
            from .models import controlnet as controlnet_mod

            # params["controlnet"] is one pytree or a list of them
            # (multi-ControlNet); hints ride stacked as (N, B, H, W, 3) and
            # scales as (N,).  Each side net's hint encoder runs once.
            nets = params["controlnet"]
            nets = nets if isinstance(nets, (list, tuple)) else [nets]
            hint_feats = []
            for ci, net in enumerate(nets):
                hf = controlnet_mod.encode_hint(
                    net, noises["control_hint"][ci], cfg.unet, factor, policy)
                hint_feats.append(
                    jnp.concatenate([hf, hf], axis=0) if do_cfg else hf)
            ctrl_scale = noises["control_scale"]

        if use_adapter:
            from .models import t2i_adapter as adapter_mod

            # params["t2i_adapter"] is one pytree or a list; hints ride
            # stacked (N, B, H, W, 3), scales traced (N,).  Features are a
            # pure function of the hint — computed ONCE per generation;
            # multi-adapter features sum (diffusers MultiAdapter).
            ads = params["t2i_adapter"]
            ads = ads if isinstance(ads, (list, tuple)) else [ads]
            adapter_feats = None
            for ai, ad in enumerate(ads):
                fs = adapter_mod.apply(ad, noises["adapter_hint"][ai],
                                       cfg.unet, factor, policy)
                fs = [f * noises["adapter_scale"][ai].astype(f.dtype)
                      for f in fs]
                adapter_feats = fs if adapter_feats is None else \
                    [a + b for a, b in zip(adapter_feats, fs)]
            # lane-matched copy for the CFG/AND-stacked main eval; the
            # PAG/SAG single-lane extra evals use the per-sample features
            adapter_lanes = [jnp.concatenate([f] * (n_and + 1), axis=0)
                             for f in adapter_feats] if do_cfg \
                else adapter_feats
        else:
            adapter_lanes = adapter_feats = None

        if use_ref:
            # reference-only guidance (the A1111 ControlNet "reference"
            # preprocessor, attn mode): VAE-encode the reference image
            # ONCE; every step re-noises it to the current timestep, runs
            # a capture UNet pass banking each self-attention's hidden
            # states, and the main pass attends over [own, reference]
            # tokens.  style_fidelity (traced) lerps the uncond lanes
            # back toward plain self-attention.
            r_noise = draw("ref_encoder")
            ref_lat0 = vae_mod.apply_encoder(
                params["encoder"], noises["ref_image"], r_noise, cfg.vae,
                policy, attention_backend=cfg.vae_attention_backend,
                reference_quirks=cfg.reference_quirks).astype(jnp.float32)
            ref_step_noises = all_step_noises("ref_noise")
            ref_attn = "attn" in ref_mode
            ref_adain = "adain" in ref_mode
            ref_lanes = 2 if do_cfg else 1
            ref_plain_mask = jnp.concatenate(
                [jnp.zeros((batch,), jnp.float32),
                 jnp.ones((batch,), jnp.float32)]) if do_cfg else None

        if sp_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as _P

            _sp = NamedSharding(sp_mesh, _P(None, "model", None, None))

        t_cond = None
        if cfg.unet.time_cond_dim:
            # LCM embedded guidance: the distilled UNet consumes
            # w = cfg_scale - 1 through its cond_proj (models/unet.py);
            # typically combined with do_cfg=False (guidance is baked in)
            t_cond = unet_mod.guidance_scale_embedding(
                cfg_scale - 1.0, cfg.unet.time_cond_dim)

        def eps_at(step_i, latents, dc, dc_refresh=None, t_override=None):
            """-> (eps, t, dc').  ``dc`` is the DeepCache backbone carry (a
            dummy scalar when deepcache is off); ``dc_refresh`` overrides
            the step-index refresh predicate (heun's corrector eval is
            always shallow).  ``t_override`` conditions the UNet on an
            off-grid timestep (DPM2's log-space midpoint) while keeping
            step_i's context/hint selection."""
            if n_sched == 1:
                ctx, add_c = context, add_cond
            else:  # prompt editing: this step's realized conditioning
                ctx = jax.lax.dynamic_index_in_dim(
                    context, sched_idx[step_i], 0, keepdims=False)
                add_c = None if add_cond is None else \
                    jax.lax.dynamic_index_in_dim(
                        add_cond, sched_idx[step_i], 0, keepdims=False)
            t = timesteps[step_i] if t_override is None else t_override
            lat_c = latents.astype(policy.compute_dtype)
            lat_in = lat_c
            if inpaint == "unet9":
                # [latents, mask, masked-image latents] per step (the
                # diffusers SD-inpaint channel order)
                lat_in = jnp.concatenate([lat_in, inpaint_extra], axis=-1)
            if ip2p:
                # 3 lanes, each with its edit-image channels appended
                # ([latents, image] order, zeros in the uncond lane)
                model_in = jnp.concatenate(
                    [jnp.concatenate([lat_in] * 3, axis=0), ip2p_extra],
                    axis=-1)
            else:
                # CFG doubles the lanes; composable AND runs n_and cond
                # lanes plus the uncond lane ((n_and+1)·B total)
                model_in = jnp.concatenate([lat_in] * (n_and + 1), axis=0) \
                    if do_cfg else lat_in
            if sp_mesh is not None:
                model_in = jax.lax.with_sharding_constraint(model_in, _sp)
            control = None
            if use_control:
                ctrl_in = jnp.concatenate([lat_c, lat_c], axis=0) \
                    if do_cfg else lat_c
                nets = params["controlnet"]
                nets = nets if isinstance(nets, (list, tuple)) else [nets]
                for ci, net in enumerate(nets):
                    c_i = controlnet_mod.apply(
                        net, ctrl_in, ctx, t, hint_feats[ci],
                        cfg.unet, policy,
                        attention_backend=cfg.attention_backend,
                        fuse_qkv=cfg.fuse_qkv,
                        conditioning_scale=ctrl_scale[ci],
                        add_cond=add_c,
                        conv_backend=("xla" if sp_mesh is not None
                                      else cfg.conv_backend))
                    if control is None:
                        control = c_i
                    else:  # multi-ControlNet: residuals sum
                        control = {
                            "mid": control["mid"] + c_i["mid"],
                            "down": [a + b for a, b in
                                     zip(control["down"], c_i["down"])]}
            unet_kw = dict(
                attention_backend=cfg.attention_backend,
                reference_quirks=cfg.reference_quirks,
                fuse_qkv=cfg.fuse_qkv, quant=cfg.quant, sp_mesh=sp_mesh,
                conv_backend=("xla" if sp_mesh is not None
                              else cfg.conv_backend),
                add_cond=add_c, control=control, adapter=adapter_lanes,
                t_cond=t_cond, ip=ip_arg)
            if n_frames:
                # AnimateDiff: the batch IS the frame axis (one prompt,
                # frame index fastest within each CFG lane group)
                unet_kw["motion"] = params["motion"]
                unet_kw["frames"] = n_frames
            if use_ref:
                # capture pass: an independent diffusion of the reference
                # (no ControlNet/adapter residuals); its banked hidden
                # states feed the main pass's [own, ref] self-attention.
                # XLA dead-code-eliminates the capture pass's unused tail.
                rn = ddpm.add_noise(
                    schedule, ref_lat0, t,
                    ref_step_noises[jnp.minimum(step_i, n_steps - 1)])
                ref_in = jnp.concatenate(
                    [rn.astype(policy.compute_dtype)] * ref_lanes, axis=0)
                bank = {} if ref_attn else None
                abank = {} if ref_adain else None
                unet_mod.apply(params["diffusion"], ref_in, ctx, t,
                               cfg.unet, policy,
                               attention_backend=cfg.attention_backend,
                               reference_quirks=cfg.reference_quirks,
                               fuse_qkv=cfg.fuse_qkv, quant=cfg.quant,
                               sp_mesh=sp_mesh,
                               conv_backend=unet_kw["conv_backend"],
                               add_cond=add_c, t_cond=t_cond,
                               ref=("capture", bank) if ref_attn else None,
                               ref_adain=(("capture", abank)
                                          if ref_adain else None))
                if ref_attn:
                    unet_kw["ref"] = ("read", bank, noises["ref_fidelity"],
                                      ref_plain_mask)
                if ref_adain:
                    unet_kw["ref_adain"] = ("read", abank,
                                            noises["ref_fidelity"],
                                            ref_plain_mask)
            mid_probs = None
            if motion_win is not None:
                # long-video context windows (temporal MultiDiffusion —
                # the community AnimateDiff scheduler for clips beyond
                # the trained temporal window): sweep overlapping frame
                # windows through the motion UNet, average per-frame eps
                win_f, f_starts = motion_win
                fs_a = jnp.asarray(f_starts)
                lanes = model_in.shape[0] // n_frames
                mi = model_in.reshape((lanes, n_frames)
                                      + model_in.shape[1:])
                ctx_f = ctx.reshape((lanes, n_frames) + ctx.shape[1:])

                def f_body(j, acc_cnt):
                    acc, cnt = acc_cnt
                    f0 = fs_a[j]
                    win_in = jax.lax.dynamic_slice_in_dim(mi, f0, win_f, 1)
                    win_in = win_in.reshape((lanes * win_f,)
                                            + model_in.shape[1:])
                    win_ctx = jax.lax.dynamic_slice_in_dim(ctx_f, f0,
                                                           win_f, 1)
                    win_ctx = win_ctx.reshape((lanes * win_f,)
                                              + ctx.shape[1:])
                    kw_w = dict(unet_kw)
                    kw_w["frames"] = win_f
                    eps_w = unet_mod.apply(
                        params["diffusion"], win_in, win_ctx, t, cfg.unet,
                        policy, **kw_w).astype(jnp.float32)
                    eps_w = eps_w.reshape((lanes, win_f)
                                          + eps_w.shape[1:])
                    cur = jax.lax.dynamic_slice_in_dim(acc, f0, win_f, 1)
                    acc = jax.lax.dynamic_update_slice_in_dim(
                        acc, cur + eps_w, f0, 1)
                    ccur = jax.lax.dynamic_slice_in_dim(cnt, f0, win_f, 1)
                    cnt = jax.lax.dynamic_update_slice_in_dim(
                        cnt, ccur + 1.0, f0, 1)
                    return acc, cnt

                acc0 = jnp.zeros((lanes, n_frames) + model_in.shape[1:3]
                                 + (cfg.unet.out_channels,), jnp.float32)
                cnt0 = jnp.zeros((1, n_frames, 1, 1, 1), jnp.float32)
                acc, cnt = jax.lax.fori_loop(0, len(f_starts), f_body,
                                             (acc0, cnt0))
                eps = (acc / jnp.maximum(cnt, 1.0)).reshape(
                    (lanes * n_frames,) + model_in.shape[1:3]
                    + (cfg.unet.out_channels,)).astype(policy.compute_dtype)
            elif pano is not None:
                # MultiDiffusion (Bar-Tal et al. 2023) / diffusers
                # panorama: the canvas exceeds the model's native window,
                # so the UNet sweeps the precomputed overlapping windows
                # (ONE instance, fori_loop) and per-pixel eps predictions
                # average.  Deterministic samplers then take one GLOBAL
                # step on the fused eps — affine in (x, eps), equivalent
                # to diffusers' per-view step-then-average.
                win, ys_t, xs_t = pano
                ys_a, xs_a = jnp.asarray(ys_t), jnp.asarray(xs_t)
                b_eff, ch_in = model_in.shape[0], model_in.shape[3]
                ch_out = cfg.unet.out_channels

                def w_body(j, acc_cnt):
                    acc, cnt = acc_cnt
                    y0, x0 = ys_a[j], xs_a[j]
                    win_in = jax.lax.dynamic_slice(
                        model_in, (0, y0, x0, 0), (b_eff, win, win, ch_in))
                    eps_w = unet_mod.apply(
                        params["diffusion"], win_in, ctx, t, cfg.unet,
                        policy, **unet_kw).astype(jnp.float32)
                    cur = jax.lax.dynamic_slice(
                        acc, (0, y0, x0, 0), (b_eff, win, win, ch_out))
                    acc = jax.lax.dynamic_update_slice(
                        acc, cur + eps_w, (0, y0, x0, 0))
                    ccur = jax.lax.dynamic_slice(
                        cnt, (0, y0, x0, 0), (1, win, win, 1))
                    cnt = jax.lax.dynamic_update_slice(
                        cnt, ccur + 1.0, (0, y0, x0, 0))
                    return acc, cnt

                acc0 = jnp.zeros(
                    (b_eff,) + model_in.shape[1:3] + (ch_out,), jnp.float32)
                cnt0 = jnp.zeros((1,) + model_in.shape[1:3] + (1,),
                                 jnp.float32)
                acc, cnt = jax.lax.fori_loop(0, len(ys_t), w_body,
                                             (acc0, cnt0))
                eps = (acc / jnp.maximum(cnt, 1.0)) \
                    .astype(policy.compute_dtype)
            elif deepcache is None:
                if sag:
                    eps, mid_probs = unet_mod.apply(
                        params["diffusion"], model_in, ctx, t, cfg.unet,
                        policy, return_mid_attn=True, **unet_kw)
                else:
                    eps = unet_mod.apply(params["diffusion"], model_in, ctx,
                                         t, cfg.unet, policy, **unet_kw)
            else:
                refresh = ((step_i - start_step) % deepcache == 0) \
                    if dc_refresh is None else dc_refresh

                def _full(_):
                    return unet_mod.apply(
                        params["diffusion"], model_in, ctx, t, cfg.unet,
                        policy, return_cache=True, **unet_kw)

                def _shallow(_):
                    return unet_mod.apply(
                        params["diffusion"], model_in, ctx, t, cfg.unet,
                        policy, cache=dc, **unet_kw), dc

                eps, dc = jax.lax.cond(refresh, _full, _shallow, None)
                dc = dc.astype(policy.compute_dtype)
            if pag:
                # perturbed eval: conditional lane only (lane 0 of the CFG
                # stack), identity mid-block self-attention
                pag_kw = dict(unet_kw)
                pag_kw["adapter"] = adapter_feats  # single lane (B)
                if do_cfg:
                    if ip_arg is not None:
                        pag_kw["ip"] = (ip_arg[0], ip_arg[1][:batch],
                                        ip_arg[2])
                    if add_c is not None:
                        pag_kw["add_cond"] = add_c[:batch]
                    if control is not None:
                        pag_kw["control"] = {
                            "mid": control["mid"][:batch],
                            "down": [d[:batch] for d in control["down"]]}
                pag_ctx = _lane(ctx, slice(None, batch)) if do_cfg else ctx
                pag_in = lat_in
                if sp_mesh is not None:
                    pag_in = jax.lax.with_sharding_constraint(pag_in, _sp)
                eps_ptb = unet_mod.apply(params["diffusion"], pag_in,
                                         pag_ctx, t, cfg.unet, policy,
                                         pag=True, **pag_kw)
            if sag:
                # Self-Attention Guidance (Hong et al. 2023; diffusers SAG
                # pipeline): blur pred_x0 where the mid-block self-attention
                # mass concentrates, re-noise with the predicted eps, and
                # re-evaluate the BASE lane (uncond under CFG — the
                # diffusers convention) on the degraded latents.
                base_raw = (eps[batch:] if do_cfg else eps) \
                    .astype(jnp.float32)
                base_ctx = _lane(ctx, slice(batch, None)) if do_cfg else ctx
                base_add = None if add_c is None else \
                    (add_c[batch:] if do_cfg else add_c)
                probs = (mid_probs[batch:] if do_cfg else mid_probs) \
                    .astype(jnp.float32)
                lat32s = latents.astype(jnp.float32)
                base_eps = ddpm.to_epsilon(schedule, t, lat32s, base_raw,
                                           cfg.prediction_type)
                a_t = schedule.alphas_cumprod[t]
                x0 = (lat32s - jnp.sqrt(1.0 - a_t) * base_eps) \
                    / jnp.sqrt(a_t)
                # per-key attention mass > 1 marks the salient tokens
                mass = probs.mean(axis=1).sum(axis=1)  # (B, S_mid)
                down = 2 ** (len(cfg.unet.ch_mults) - 1)
                mh, mw = h_lat // down, w_lat // down
                mask = (mass > 1.0).astype(jnp.float32).reshape(
                    batch, mh, mw, 1)
                mask = jax.image.resize(mask, (batch, h_lat, w_lat, 1),
                                        "nearest")
                x0_deg = gaussian_blur(x0) * mask + x0 * (1.0 - mask)
                lat_deg = jnp.sqrt(a_t) * x0_deg \
                    + jnp.sqrt(1.0 - a_t) * base_eps
                deg_in = lat_deg.astype(policy.compute_dtype)
                if inpaint == "unet9":
                    deg_in = jnp.concatenate([deg_in, inpaint_extra],
                                             axis=-1)
                if sp_mesh is not None:
                    deg_in = jax.lax.with_sharding_constraint(deg_in, _sp)
                sag_kw = dict(unet_kw)
                sag_kw["add_cond"] = base_add
                sag_kw["adapter"] = adapter_feats  # single lane (B)
                if ip_arg is not None and do_cfg:
                    # base lane = uncond: its (zero-image) ip tokens
                    sag_kw["ip"] = (ip_arg[0], ip_arg[1][batch:], ip_arg[2])
                if control is not None and do_cfg:
                    sag_kw["control"] = {
                        "mid": control["mid"][batch:],
                        "down": [d[batch:] for d in control["down"]]}
                eps_deg_raw = unet_mod.apply(
                    params["diffusion"], deg_in, base_ctx, t, cfg.unet,
                    policy, **sag_kw)
                eps_deg = ddpm.to_epsilon(schedule, t, lat_deg,
                                          eps_deg_raw.astype(jnp.float32),
                                          cfg.prediction_type)
            if ip2p:
                # dual guidance (Brooks et al. 2023 eq. 3): eps_uncond
                # + s_text (eps_text − eps_image)
                # + s_image (eps_image − eps_uncond); both scales traced
                e_t, e_i, e_u = [p.astype(jnp.float32)
                                 for p in jnp.split(eps, 3, axis=0)]
                eps = e_u + cfg_scale * (e_t - e_i) \
                    + noises["image_cfg_scale"] * (e_i - e_u)
            elif do_cfg and n_and > 1:
                # composable diffusion (A1111 AND): eps_uncond +
                # cfg Σ w_i (eps_cond_i − eps_uncond); lanes are part-major.
                # Regional prompting (Latent Couple) additionally weights
                # each lane by its spatial mask (traced, latent-res).
                parts = jnp.split(eps, n_and + 1, axis=0)
                eps_u = parts[-1].astype(jnp.float32)
                w = noises["and_weights"]  # (B, n_and), traced
                eps = eps_u
                for i in range(n_and):
                    wi = w[:, i][:, None, None, None]
                    if use_regions:
                        wi = wi * noises["region_masks"][i]
                    eps = eps + cfg_scale * wi \
                        * (parts[i].astype(jnp.float32) - eps_u)
            elif do_cfg:
                eps_cond, eps_uncond = jnp.split(eps, 2, axis=0)
                eps = cfg_scale * (eps_cond - eps_uncond) + eps_uncond  # pipeline.py:233
                if guidance_rescale > 0.0:
                    # CFG over-exposure fix ("Common Diffusion Noise
                    # Schedules and Sample Steps are Flawed", eq. 15/16):
                    # rescale the combined prediction's per-sample std back
                    # to the conditional one, then lerp.  Applied in model-
                    # output space (before any v->eps conversion), matching
                    # the published implementation.
                    ax = tuple(range(1, eps.ndim))
                    std_c = jnp.std(eps_cond.astype(jnp.float32), axis=ax,
                                    keepdims=True)
                    std_g = jnp.std(eps.astype(jnp.float32), axis=ax,
                                    keepdims=True)
                    rescaled = eps * (std_c / jnp.maximum(std_g, 1e-12)
                                      ).astype(eps.dtype)
                    eps = (guidance_rescale * rescaled
                           + (1.0 - guidance_rescale) * eps)
            if pag:
                base = eps_cond if do_cfg else eps
                eps = (eps + noises["pag_scale"]
                       * (base - eps_ptb).astype(jnp.float32))
            # SD-2.x v-prediction -> epsilon (no-op for "epsilon"; CFG and
            # the conversion are both affine, so combining first is exact)
            eps = ddpm.to_epsilon(schedule, t, latents, eps, cfg.prediction_type)
            if sag:
                eps = eps + noises["sag_scale"] * (base_eps - eps_deg)
            if dyn_thresh:
                # Imagen/diffusers dynamic thresholding (`thresholding=
                # True`, `_threshold_sample`): per-sample |x0| quantile s
                # (>= 1), clip x0 to [-s, s] and rescale by s, then map
                # back to eps.  Sample-space [-1, 1] semantics — meant for
                # pixel/v-pred models; opt-in here.
                a_t = schedule.alphas_cumprod[t]
                l32 = latents.astype(jnp.float32)
                x0 = (l32 - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
                flat = jnp.abs(x0.reshape(x0.shape[0], -1))
                s = jnp.quantile(flat, noises["dyn_thresh_ratio"], axis=1)
                s = jnp.maximum(s, 1.0)[:, None, None, None]
                x0 = jnp.clip(x0, -s, s) / s
                eps = (l32 - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)
            if progress:  # reference's tqdm bar (ref pipeline.py:205), opt-in
                jax.debug.callback(_progress_tick, step_i, n_steps,
                                   ordered=False)
            return eps.astype(jnp.float32), t, dc

        # DeepCache carry: the backbone feature at the shallowest decoder
        # level (zeros until the first refresh step, which always runs the
        # full UNet); a dummy scalar when the feature is off keeps the
        # carries/bodies single-path.
        if deepcache is None:
            dc0 = jnp.zeros((), policy.compute_dtype)
        else:
            b_eff = batch * ((3 if ip2p else n_and + 1) if do_cfg else 1)
            dc0 = jnp.zeros(unet_mod.deepcache_shape(
                cfg.unet, b_eff, h_lat, w_lat), policy.compute_dtype)

        # dynamic lower bound: img2img strength skips steps without paying
        # for them (the reference truncates the Python list, ddpm.py:97-99)
        if sampler in ("dpm++", "dpm++_sde", "dpm++_3m_sde", "unipc"):
            mod = unipc if sampler == "unipc" else dpm
            state0 = dpm.init_state_3m(lat_shape) \
                if sampler == "dpm++_3m_sde" else mod.init_state(lat_shape)

            def body(step_i, carry):
                lat, st, dc = carry
                lat = inpaint_blend(step_i, lat)
                eps, t, dc = eps_at(step_i, lat, dc)
                if sampler == "dpm++_sde":
                    new_lat, st = dpm.step_sde(
                        schedule, t, lat, eps, step_noises[step_i], st,
                        num_inference_steps=n_steps,
                        prev_t=prev_timesteps[step_i])
                elif sampler == "dpm++_3m_sde":
                    new_lat, st = dpm.step_sde_3m(
                        schedule, t, lat, eps, step_noises[step_i], st,
                        num_inference_steps=n_steps,
                        prev_t=prev_timesteps[step_i])
                else:
                    new_lat, st = mod.step(schedule, t, lat, eps, st,
                                           num_inference_steps=n_steps,
                                           prev_t=prev_timesteps[step_i])
                return new_lat.astype(jnp.float32), st, dc

            latents, _, _ = jax.lax.fori_loop(
                start_step, n_steps, body,
                (latents.astype(jnp.float32), state0, dc0))
        elif sampler == "plms":
            # n_steps + 1 iterations: the trapezoidal warmup re-evaluates
            # the second grid point (sampling/pndm.py eval schedule)
            def body(i, carry):
                lat, st, dc = carry
                te = pndm.eval_index(i, start_step)
                lat = inpaint_blend(te, lat)
                eps, _, dc = eps_at(te, lat, dc)
                new_lat, st = pndm.step(schedule, timesteps, prev_timesteps,
                                        i, start_step, lat, eps, st,
                                        n_steps=n_steps)
                return new_lat.astype(jnp.float32), st, dc

            latents, _, _ = jax.lax.fori_loop(
                start_step, n_steps + 1, body,
                (latents.astype(jnp.float32), pndm.init_state(lat_shape),
                 dc0))
        elif sampler == "lms":
            # k-diffusion sample_lms: exact Lagrange-basis integrals
            # precomputed on the host for every (step, warmup-order) pair;
            # the derivative history rides in the carry (sampling/lms.py)
            lms_tab = jnp.asarray(lms.coeff_table(schedule, ts_np))

            def body(step_i, carry):
                lat, hist, dc = carry
                lat = inpaint_blend(step_i, lat)
                eps, t, dc = eps_at(step_i, lat, dc)
                new_lat, hist = lms.step(schedule, lms_tab, step_i,
                                         start_step, t, lat, eps, hist,
                                         prev_t=prev_timesteps[step_i])
                return new_lat.astype(jnp.float32), hist, dc

            latents, _, _ = jax.lax.fori_loop(
                start_step, n_steps, body,
                (latents.astype(jnp.float32), lms.init_state(lat_shape),
                 dc0))
        elif sampler in ("dpm2", "dpm2_a", "dpm++_2s_a"):
            # k-diffusion sample_dpm_2[_ancestral] / sample_dpmpp_2s_ancestral:
            # half step to the host-quantized log-space midpoint timestep,
            # second eval there, full step with the midpoint prediction
            # (eps-form for DPM2, x0-form exponential integrator for
            # DPM++ 2S a); final step falls back to Euler (sigma_next = 0)
            # — sampling/dpm2.py, sampling/dpm.py
            mid_ts = jnp.asarray(dpm2.mid_timesteps(
                schedule, ts_np, ancestral=(sampler != "dpm2")))

            def body(step_i, carry):
                lat, dc = carry
                lat = inpaint_blend(step_i, lat)
                eps, t, dc = eps_at(step_i, lat, dc)
                lat32 = lat.astype(jnp.float32)
                prev = prev_timesteps[step_i]
                t_mid = mid_ts[step_i]
                pred_mid = euler.step(schedule, t, lat32, eps, None,
                                      num_inference_steps=n_steps,
                                      prev_t=t_mid)
                eps2, _, _ = eps_at(step_i, pred_mid, dc,
                                    dc_refresh=False if deepcache else None,
                                    t_override=t_mid)
                if sampler == "dpm2":
                    full2 = euler.step(schedule, t, lat32, eps2, None,
                                       num_inference_steps=n_steps,
                                       prev_t=prev)
                elif sampler == "dpm2_a":
                    full2 = dpm2.step_ancestral_second(
                        schedule, t, lat32, eps2, step_noises[step_i],
                        prev_t=prev)
                else:  # dpm++_2s_a
                    full2 = dpm.step_2s_ancestral_second(
                        schedule, t, lat32, pred_mid, eps2, t_mid,
                        step_noises[step_i], prev_t=prev)
                full1 = euler.step(schedule, t, lat32, eps, None,
                                   num_inference_steps=n_steps, prev_t=prev)
                new_lat = jnp.where(prev < 0, full1, full2)
                return new_lat.astype(jnp.float32), dc

            latents, _ = jax.lax.fori_loop(
                start_step, n_steps, body,
                (latents.astype(jnp.float32), dc0))
        elif sampler == "restart":
            # Restart sampling (sampling/restart.py): one fori_loop over
            # the precomputed op list — Heun steps with occasional
            # sigma-space noise re-injection to climb back up the interval
            rp = restart_plan
            t_prev_a = jnp.asarray(rp["t_prev"])
            t_start_a = jnp.asarray(rp["t_start"])
            t_end_a = jnp.asarray(rp["t_end"])
            rvar_a = jnp.asarray(rp["rvar"])
            op_start_a = jnp.asarray(rp["op_start"])
            n_ops = rp["n_ops"]

            def op_draw(i):
                base = rng_mod.step_key(key, "restart", i)
                ks = jax.vmap(lambda j: jax.random.fold_in(base, j))(
                    jnp.arange(batch))
                return jax.vmap(lambda kk: jax.random.normal(
                    kk, lat_shape[1:], jnp.float32))(ks)

            op_noises = jax.vmap(op_draw)(jnp.arange(n_ops))

            def body(i, carry):
                lat, dc = carry
                tp, ts_, te = t_prev_a[i], t_start_a[i], t_end_a[i]
                a_prev = schedule.alphas_cumprod[tp]
                a_start = schedule.alphas_cumprod[ts_]
                x_k = lat.astype(jnp.float32) / jnp.sqrt(a_prev)
                x_k = x_k + op_noises[i] * jnp.sqrt(rvar_a[i])
                lat32 = jnp.sqrt(a_start) * x_k
                disp = jnp.minimum(i, n_steps - 1)  # progress display only
                eps, _, dc = eps_at(disp, lat32, dc, t_override=ts_)
                pred = euler.step(schedule, ts_, lat32, eps, None,
                                  num_inference_steps=n_steps, prev_t=te)
                eps2, _, _ = eps_at(disp, pred, dc, t_override=jnp.maximum(te, 0))
                new_lat = euler.step_heun_correct(
                    schedule, ts_, lat32, eps, eps2,
                    num_inference_steps=n_steps, prev_t=te)
                return new_lat.astype(jnp.float32), dc

            latents, _ = jax.lax.fori_loop(
                op_start_a[start_step], n_ops, body,
                (latents.astype(jnp.float32), dc0))
        elif sampler == "dpm_fast":
            # DPM fast (sampling/dpm_fast.py): one fori_loop over the
            # precomputed segments; a UNIFORM 3-eval body whose combine
            # coefficients encode the segment's solver order (lower-order
            # remainder segments zero the unused difference terms).
            fp = fast_plan
            t0_a = jnp.asarray(fp["t0"])
            s1_a = jnp.asarray(fp["s1"])
            s2_a = jnp.asarray(fp["s2"])
            co = {k: jnp.asarray(fp[k])
                  for k in ("u1c", "u2c0", "u2c1", "e0c", "c1", "c2", "su")}
            m_seg = fp["m"]
            seg_start_a = jnp.asarray(fp["seg_start"])

            def seg_draw(i):
                base = rng_mod.step_key(key, "dpm_fast", i)
                ks = jax.vmap(lambda j: jax.random.fold_in(base, j))(
                    jnp.arange(batch))
                return jax.vmap(lambda kk: jax.random.normal(
                    kk, lat_shape[1:], jnp.float32))(ks)

            seg_noises = jax.vmap(seg_draw)(jnp.arange(m_seg))

            def body(i, carry):
                lat, dc = carry  # VP latents at this segment's t0
                t0 = t0_a[i]
                a0 = schedule.alphas_cumprod[t0]
                x_k = lat.astype(jnp.float32) / jnp.sqrt(a0)
                disp = jnp.minimum(i, n_steps - 1)  # progress display
                eps0, _, dc = eps_at(disp, lat.astype(jnp.float32), dc,
                                     t_override=t0)
                eps0 = eps0.astype(jnp.float32)
                s1 = s1_a[i]
                u1 = x_k - co["u1c"][i] * eps0
                lat1 = jnp.sqrt(schedule.alphas_cumprod[s1]) * u1
                eps1, _, _ = eps_at(disp, lat1, dc, t_override=s1)
                eps1 = eps1.astype(jnp.float32)
                s2 = s2_a[i]
                u2 = x_k - co["u2c0"][i] * eps0 \
                    - co["u2c1"][i] * (eps1 - eps0)
                lat2 = jnp.sqrt(schedule.alphas_cumprod[s2]) * u2
                eps2, _, _ = eps_at(disp, lat2, dc, t_override=s2)
                eps2 = eps2.astype(jnp.float32)
                x_k = x_k - co["e0c"][i] * eps0 \
                    - co["c1"][i] * (eps1 - eps0) \
                    - co["c2"][i] * (eps2 - eps0)
                x_k = x_k + co["su"][i] * seg_noises[i]
                t_next = jnp.where(i + 1 < m_seg,
                                   t0_a[jnp.minimum(i + 1, m_seg - 1)],
                                   fp["t_exit"])
                a_n = schedule.alphas_cumprod[t_next]
                return (jnp.sqrt(a_n) * x_k).astype(jnp.float32), dc

            latents, _ = jax.lax.fori_loop(
                seg_start_a[start_step], m_seg, body,
                (latents.astype(jnp.float32), dc0))
        elif sampler == "dpm_adaptive":
            # DPM adaptive (sampling/dpm_adaptive.py): one lax.while_loop
            # with PID-controlled step size; n_steps only BOUNDS the
            # iteration count (each iteration = 3 UNet evals).  txt2img
            # enters at the full sigma_max (the A1111/k-diffusion range);
            # img2img at the strength's grid timestep.
            def ad_draw(i):
                base = rng_mod.step_key(key, "dpm_adaptive", i)
                ks = jax.vmap(lambda j: jax.random.fold_in(base, j))(
                    jnp.arange(batch))
                return jax.vmap(lambda kk: jax.random.normal(
                    kk, lat_shape[1:], jnp.float32))(ks)

            ad_noises = jax.vmap(ad_draw)(jnp.arange(n_steps))

            def eval_eps(x_vp, t_idx):
                eps, _, _ = eps_at(jnp.int32(0), x_vp, dc0,
                                   t_override=t_idx)
                return eps

            # img2img latents were noised to the GRID's entry timestep
            # (entry_ts above) — enter there at any strength, incl. 1.0;
            # txt2img pure noise enters at the full sigma_max (the
            # A1111/k-diffusion range).  img2img is a static flag, so
            # this is a trace-time branch.
            if img2img:
                t_entry = timesteps[jnp.minimum(start_step, n_steps - 1)]
            else:
                t_entry = jnp.int32(schedule.num_train_timesteps - 1)
            latents = dpm_adaptive_mod.sample(
                schedule, latents, t_entry, eval_eps, ad_noises,
                max_iters=n_steps)
        elif sampler == "heun":
            # two model evals per step: Euler predict, then trapezoidal
            # correct with eps at (prediction, next timestep).  The final
            # step's second eval is computed (fori_loop cannot skip it) but
            # discarded inside step_heun_correct (sigma_next = 0 rule).
            def body(step_i, carry):
                latents, dc = carry
                latents = inpaint_blend(step_i, latents)
                eps, t, dc = eps_at(step_i, latents, dc)
                lat32 = latents.astype(jnp.float32)
                prev = prev_timesteps[step_i]
                pred = euler.step(schedule, t, lat32, eps, None,
                                  num_inference_steps=n_steps, prev_t=prev)
                # corrector eval reuses the deep features just refreshed
                eps2, _, _ = eps_at(jnp.minimum(step_i + 1, n_steps - 1),
                                    pred, dc,
                                    dc_refresh=False if deepcache else None)
                return euler.step_heun_correct(
                    schedule, t, lat32, eps, eps2,
                    num_inference_steps=n_steps,
                    prev_t=prev).astype(jnp.float32), dc

            latents, _ = jax.lax.fori_loop(
                start_step, n_steps, body,
                (latents.astype(jnp.float32), dc0))
        else:
            def body(step_i, carry):
                latents, dc = carry
                latents = inpaint_blend(step_i, latents)
                eps, t, dc = eps_at(step_i, latents, dc)
                noise = step_noises[step_i]
                lat32 = latents.astype(jnp.float32)
                prev = prev_timesteps[step_i]
                if sampler == "ddim":
                    new_latents = ddim.step(schedule, t, lat32, eps, noise,
                                            num_inference_steps=n_steps,
                                            eta=eta, prev_t=prev)
                elif sampler == "euler":
                    new_latents = euler.step(schedule, t, lat32, eps, noise,
                                             num_inference_steps=n_steps,
                                             prev_t=prev)
                elif sampler == "euler_a":
                    new_latents = euler.step_ancestral(
                        schedule, t, lat32, eps, noise,
                        num_inference_steps=n_steps, prev_t=prev)
                elif sampler == "lcm":
                    new_latents = lcm.step(schedule, t, lat32, eps, noise,
                                           num_inference_steps=n_steps,
                                           prev_t=prev)
                else:
                    new_latents = ddpm.step(schedule, t, lat32, eps, noise,
                                            num_inference_steps=n_steps,
                                            prev_t=prev)
                return new_latents.astype(jnp.float32), dc

            latents, _ = jax.lax.fori_loop(
                start_step, n_steps, body,
                (latents.astype(jnp.float32), dc0))

        if inpaint == "blend":
            # exact final projection: kept region is the original latents
            latents = m_lat * latents + (1.0 - m_lat) * lat0

        if decode_tile:
            images = vae_mod.apply_decoder_tiled(
                params["decoder"], latents, cfg.vae, policy,
                tile=decode_tile,
                attention_backend=cfg.vae_attention_backend,
                reference_quirks=cfg.reference_quirks)
        else:
            images = vae_mod.apply_decoder(
                params["decoder"], latents, cfg.vae, policy,
                attention_backend=cfg.vae_attention_backend,
                reference_quirks=cfg.reference_quirks)
        images = rescale(images.astype(jnp.float32), (-1.0, 1.0), (0.0, 255.0),
                         clamp=True)
        return images, latents

    if tiling:
        # A1111 --tiling (seamless textures): every conv pads circularly.
        # The contextvar is read at TRACE time; wrapping the traced
        # function keeps it active across retraces, and the static flag
        # keys a distinct compiled variant.
        from .ops import conv as conv_ops

        inner_run = run

        def run(params, cond_tokens, uncond_tokens, key, cfg_scale,
                start_step, init_image, noises):
            with conv_ops.circular_padding():
                return inner_run(params, cond_tokens, uncond_tokens, key,
                                 cfg_scale, start_step, init_image, noises)

    return jax.jit(run)


# -------------------------------------------------------------- public API
def _run_generate(
    prompt: str,
    uncond_prompt: str = "",
    input_image=None,
    strength: float = 0.8,
    do_cfg: bool = True,
    cfg_scale: float = 7.5,
    sampler_name: str = "ddpm",
    n_inference_steps: int = 50,
    models: Optional[Dict[str, Any]] = None,
    seed: Optional[int] = None,
    device=None,
    idle_device=None,
    tokenizer=None,
    *,
    config: Optional[SDConfig] = None,
    height: int = 512,
    width: int = 512,
    init_latents=None,
    mask_image=None,
    mask_blur: int = 0,
    color_correction: bool = False,
    control_image=None,
    controlnet_scale: float = 1.0,
    adapter_image=None,
    adapter_scale: float = 1.0,
    ip_adapter_image=None,
    ip_adapter_scale: float = 1.0,
    clip_vision_config=None,
    reference_image=None,
    reference_fidelity: float = 0.5,
    reference_mode: str = "attn",
    panorama: bool = False,
    panorama_window: int = 512,
    panorama_stride: Optional[int] = None,
    region_masks=None,
    n_frames: Optional[int] = None,
    motion_window: Optional[int] = None,
    motion_stride: Optional[int] = None,
    edit_image=None,
    image_guidance_scale: float = 1.5,
    fixed_noise: Optional[Dict[str, np.ndarray]] = None,
    mesh=None,
    progress: bool = False,
    ddim_eta: float = 0.0,
    decode_tile: Optional[int] = None,
    sequence_parallel: bool = False,
    long_prompts: bool = False,
    emphasis: bool = False,
    clip_skip: Optional[int] = None,
    freeu=None,
    deepcache: Optional[int] = None,
    guidance_rescale: float = 0.0,
    timestep_spacing: str = "uniform",
    variation_seed: Optional[int] = None,
    variation_strength: float = 0.0,
    pag_scale: float = 0.0,
    sag_scale: float = 0.0,
    encode_tile: Optional[int] = None,
    hypernetwork: Optional[Tuple[str, bool]] = None,
    hypernetwork_strength: float = 1.0,
    tiling: bool = False,
    dynamic_threshold: Optional[float] = None,
    noise_multiplier: Optional[float] = None,
    tome_ratio: Optional[float] = None,
    original_size: Optional[Tuple[int, int]] = None,
    crop_coords: Tuple[int, int] = (0, 0),
    target_size: Optional[Tuple[int, int]] = None,
    _device_output: bool = False,
    _key: Optional[jax.Array] = None,
):
    """Internal: full-batch generation -> (images (B,H,W,3) uint8, latents).

    With ``mesh``, batch inputs are sharded over the mesh's data axis and
    params are expected replicated (see parallel/dp.py) — XLA partitions the
    whole compiled program across the mesh (BASELINE.json config 5).
    """
    del device, idle_device  # weights are HBM-resident (see module docstring)
    if not 0.0 < strength <= 1.0:
        raise ValueError("strength must be between 0 and 1")  # pipeline.py:75-77
    if sampler_name not in SAMPLERS:  # reference rejects unknown names (pipeline.py:142)
        raise ValueError(f"Unknown sampler value {sampler_name!r}")
    if models is None or tokenizer is None:
        raise ValueError("models dict and tokenizer are required")
    cfg = config or sd15_config()
    if cfg.quant not in ("none", "wide", "conv", "w8"):
        # unknown tiers would otherwise silently run the exact path
        raise ValueError(f"unknown quant tier {cfg.quant!r}")
    n_lvl1 = (height // cfg.vae.downsample_factor) * \
        (width // cfg.vae.downsample_factor)
    if n_lvl1 > MAX_VALIDATED_ATTN_TOKENS and cfg.unet.hypertile is None:
        # 2048^2 (65536 tokens) runs clean; 4096^2 (262144) compiles but
        # FAULTS the TPU worker mid-run (round-5 queue 21) — fail with a
        # message instead of crashing the device
        raise ValueError(
            f"{height}x{width} needs {n_lvl1}-token global self-attention, "
            f"beyond the validated streamed-kernel scale "
            f"({MAX_VALIDATED_ATTN_TOKENS}); enable hypertile (models/"
            f"config.with_hypertile or the fast preset) or reduce the size")
    if clip_skip is not None:
        # A1111 "CLIP skip": condition on an earlier text-encoder layer
        # (models/config.with_clip_skip); a distinct cfg keys a distinct
        # compiled variant.
        from .models.config import with_clip_skip

        cfg = with_clip_skip(cfg, int(clip_skip))
    if tome_ratio is not None:
        # ToMe token merging (ops/tome.py; the A1111 "Token merging ratio"
        # knob) — a static graph-shape choice, so it keys a distinct
        # compiled variant like every cfg change.
        from .models.config import with_tome

        cfg = with_tome(cfg, float(tome_ratio))
    if freeu is not None and freeu is not False:
        # FreeU decoder re-weighting (models/config.with_freeu): True =
        # published family defaults, or an explicit (b1, b2, s1, s2).
        from .models.config import with_freeu

        cfg = with_freeu(cfg, True if freeu is True else tuple(freeu))
    if (mesh is not None and cfg.fuse_qkv and not sequence_parallel
            and mesh.shape.get("model", 1) > 1):
        # TP: the fused qkv concat runs along the Megatron-sharded kernel
        # axis — GSPMD would gather the sharded weights (ADVICE r2); use
        # per-projection linears so the column-split compute stays split.
        # (sequence_parallel uses the model axis for SPATIAL sharding with
        # replicated params — fusion stays on there.)
        import dataclasses as _dc

        cfg = _dc.replace(cfg, fuse_qkv=False)

    prompts = [prompt] if isinstance(prompt, str) else list(prompt)
    uncond = [uncond_prompt] if isinstance(uncond_prompt, str) else list(uncond_prompt)
    if len(uncond) == 1 and len(prompts) > 1:
        uncond = uncond * len(prompts)
    batch = len(prompts)
    if n_frames is not None:
        # AnimateDiff (models/motion.py): one prompt becomes n_frames
        # batch lanes whose motion modules attend across the frame axis
        if "motion" not in models:
            raise ValueError("n_frames given but models has no 'motion' "
                             "entry (weights/animatediff."
                             "load_motion_module)")
        if batch != 1:
            raise ValueError("n_frames animates ONE prompt (got "
                             f"{batch})")
        if int(n_frames) < 2:
            raise ValueError("n_frames must be >= 2")
        n_frames = int(n_frames)
        prompts = prompts * n_frames
        uncond = uncond * n_frames
        batch = n_frames

    # A1111 prompt editing/alternation ([from:to:N], [a|b]): realize the
    # per-step prompts, dedupe to K distinct conditionings + an index map;
    # the K realizations ride flattened into the encoding batch and the
    # compiled loop switches context per step (prompt_schedule.py).
    sched_idx_arr = None
    n_sched = 1
    if any(prompt_schedule.has_schedule(t) for t in prompts + uncond):
        realized, sched_idx_arr = prompt_schedule.schedule_prompts(
            prompts, uncond, n_inference_steps)
        n_sched = len(realized)
        if n_sched > 1:
            if fixed_noise is not None:
                raise ValueError("prompt editing is not supported in "
                                 "fixed_noise parity mode")
            prompts = [p for cp, _ in realized for p in cp]
            uncond = [u for _, up in realized for u in up]
        else:  # syntax resolved to a single conditioning
            prompts, uncond = list(realized[0][0]), list(realized[0][1])
            sched_idx_arr = None

    # A1111 composable diffusion ("a cat AND a dog:1.2"): every prompt
    # splits into the same number of sub-conditionings; the UNet runs
    # n_and cond lanes + uncond, combined eps_u + cfg Σ w_i (eps_i − eps_u)
    n_and = 1
    and_w = None
    if any(prompt_schedule.has_composable(p) for p in prompts):
        if n_sched > 1:
            raise ValueError("AND does not compose with prompt "
                             "editing/alternation")
        if not do_cfg:
            raise ValueError("AND (composable diffusion) requires do_cfg")
        split = [prompt_schedule.split_composable(p) for p in prompts]
        ks = {len(parts) for parts, _ in split}
        if len(ks) != 1:
            raise ValueError("all prompts in a batch must have the same "
                             f"number of AND segments (got {sorted(ks)})")
        n_and = ks.pop()
        if n_and > 1:
            if control_image is not None:
                raise ValueError("AND does not compose with ControlNet")
            if pag_scale or sag_scale:
                raise ValueError("AND does not compose with PAG/SAG")
            if guidance_rescale:
                raise ValueError("AND does not compose with "
                                 "guidance_rescale")
            if fixed_noise is not None:
                raise ValueError("AND is not supported in fixed_noise "
                                 "parity mode")
            and_w = np.asarray([ws for _, ws in split], np.float32)  # (B,K)
            # part-major expansion: lane i carries sub-prompt i of every
            # batch sample (matches the split order in the compiled combine)
            prompts = [split[b][0][i] for i in range(n_and)
                       for b in range(len(split))]

    if not long_prompts and hasattr(tokenizer, "encode_windows") and any(
            "BREAK" in t and re.search(r"\bBREAK\b", t)
            for t in prompts + uncond):
        # A1111 honors BREAK unconditionally (its chunking is always on);
        # without windows the keyword would silently BPE-encode as a
        # literal "break" token — auto-enable the window scheme instead
        long_prompts = True
    cond_w = uncond_w = None
    if emphasis and not hasattr(tokenizer, "encode_weighted"):
        raise ValueError("emphasis requires the built-in CLIPTokenizer "
                         "(encode_weighted)")
    if long_prompts:
        # community long-prompt scheme: >75-token prompts split into
        # 77-token windows whose hiddens concatenate into one long context
        if not hasattr(tokenizer, "encode_windows"):
            raise ValueError("long_prompts requires the built-in "
                             "CLIPTokenizer (encode_windows)")
        if emphasis:
            cw, cww = zip(*[tokenizer.encode_windows_weighted(t)
                            for t in prompts])
            uw, uww = zip(*[tokenizer.encode_windows_weighted(t)
                            for t in uncond])
            cw, cww, uw, uww = list(cw), list(cww), list(uw), list(uww)
        else:
            cw = [tokenizer.encode_windows(t) for t in prompts]
            uw = [tokenizer.encode_windows(t) for t in uncond]
        k = max(len(w) for w in cw + uw)
        L = cfg.clip.max_len
        pad_win = [tokenizer.sot] + [tokenizer.eot] * (L - 1)

        def _stack(wins, pad=pad_win, dt=np.int32):
            return np.asarray([w + [pad] * (k - len(w)) for w in wins], dt)

        cond_tokens, uncond_tokens = _stack(cw), _stack(uw)
        if emphasis:
            ones = [1.0] * L
            cond_w = _stack(cww, pad=ones, dt=np.float32)
            uncond_w = _stack(uww, pad=ones, dt=np.float32)
        if k == 1:
            cond_tokens = cond_tokens[:, 0]
            uncond_tokens = uncond_tokens[:, 0]
            if emphasis:
                cond_w, uncond_w = cond_w[:, 0], uncond_w[:, 0]
    elif emphasis:
        cw_pairs = [tokenizer.encode_weighted(t) for t in prompts]
        uw_pairs = [tokenizer.encode_weighted(t) for t in uncond]
        cond_tokens = np.asarray([p[0] for p in cw_pairs], np.int32)
        uncond_tokens = np.asarray([p[0] for p in uw_pairs], np.int32)
        cond_w = np.asarray([p[1] for p in cw_pairs], np.float32)
        uncond_w = np.asarray([p[1] for p in uw_pairs], np.float32)
    else:
        cond_tokens = _encode_tokens(tokenizer, prompts, cfg.clip.max_len)
        uncond_tokens = _encode_tokens(tokenizer, uncond, cfg.clip.max_len)
    # JAX gather clamps out-of-range indices silently — validate on host.
    vmax = max(cond_tokens.max(), uncond_tokens.max())
    if vmax >= cfg.clip.vocab_size:
        raise ValueError(f"token id {vmax} >= vocab_size {cfg.clip.vocab_size} "
                         "(tokenizer/config mismatch)")

    factor = cfg.vae.downsample_factor
    if height % factor or width % factor:
        raise ValueError(f"height/width must be multiples of {factor}, "
                         f"got {height}x{width}")
    h_lat, w_lat = height // factor, width // factor
    sp_mesh = None
    if sequence_parallel:
        # latency mode (parallel/sp.py): spatially shard the denoise loop
        n_model = 0 if mesh is None else mesh.shape.get("model", 1)
        if n_model < 2:
            raise ValueError("sequence_parallel needs a mesh with a model "
                             f"axis > 1 (got {n_model})")
        if h_lat % n_model:
            raise ValueError(f"latent height {h_lat} not divisible by model "
                             f"axis {n_model}")
        # self-attention runs inside a shard_map (gathered K/V, per-shard
        # kernel — flash included; ops/attention._sp_self_attention), so
        # the pallas backend is fully usable under SP
        if cfg.unet.tome is not None:
            raise ValueError("ToMe token merging does not compose with "
                             "sequence_parallel (the spatial shard_map "
                             "needs the full token grid)")
        if cfg.unet.hypertile is not None:
            raise ValueError("Hypertile does not compose with "
                             "sequence_parallel (tile folding needs the "
                             "full token grid, not a spatial shard)")
        sp_mesh = mesh
    # ---------------------------------------------------------- inpaint mode
    # "unet9": dedicated 9-channel inpaint checkpoint (runwayml-style);
    # "blend": latent-blend masking, works with ANY 4-channel checkpoint.
    inpaint = None
    if cfg.unet.in_channels == 9:
        inpaint = "unet9"
        if mask_image is None and input_image is not None:
            raise ValueError("inpaint checkpoint: mask_image is required "
                             "with input_image")
    elif mask_image is not None:
        if init_latents is not None:
            raise ValueError("inpainting needs pixel input_image, not "
                             "init_latents")
        if input_image is None:
            raise ValueError("mask_image requires input_image (the region "
                             "outside the mask is kept from it)")
        inpaint = "blend"

    if init_latents is not None:
        # latent-space img2img: ready latents (model's scaled latent space,
        # e.g. a previous generate's return_latents) skip the VAE encode —
        # the hires-fix second pass and base->refiner latent handoff path
        if input_image is not None:
            raise ValueError("pass input_image OR init_latents, not both")
        if inpaint is not None:
            raise ValueError("inpainting needs pixel input_image, not "
                             "init_latents")
        lat = np.asarray(init_latents, np.float32)
        if lat.ndim == 3:
            lat = lat[None]
        want = (h_lat, w_lat, cfg.vae.latent_channels)
        if lat.shape[1:] != want:
            raise ValueError(f"init_latents shape {lat.shape[1:]} != "
                             f"{want} for {height}x{width}")
        image = np.broadcast_to(lat, (batch,) + want).copy()
        img2img = "latent"
        start_step = ddpm.start_step_for_strength(n_inference_steps, strength)
    elif input_image is not None:
        img2img = True
        image = np.broadcast_to(_prepare_image(input_image, width, height),
                                (batch, height, width, 3)).copy()
        start_step = ddpm.start_step_for_strength(n_inference_steps, strength)
    else:
        img2img = False
        image = np.zeros((batch, height, width, 3), np.float32)
        start_step = 0

    # ------------------------------------------- InstructPix2Pix edit mode
    ip2p = edit_image is not None
    if ip2p:
        if cfg.unet.in_channels != 2 * cfg.vae.latent_channels:
            raise ValueError(
                "edit_image needs an InstructPix2Pix checkpoint "
                f"({2 * cfg.vae.latent_channels}-channel UNet — "
                f"sd15_ip2p_config; this config has "
                f"{cfg.unet.in_channels})")
        if img2img:
            raise ValueError("edit_image replaces input_image for "
                             "InstructPix2Pix (denoising starts from pure "
                             "noise; edit strength rides the two guidance "
                             "scales)")
        if not do_cfg:
            raise ValueError("InstructPix2Pix needs do_cfg=True (dual "
                             "text/image guidance)")
        bad = [n for n, v in [
            ("mask_image", mask_image), ("control_image", control_image),
            ("adapter_image", adapter_image)] if v is not None]
        if bad or guidance_rescale:
            bad += ["guidance_rescale"] if guidance_rescale else []
            raise ValueError(f"InstructPix2Pix does not compose with "
                             f"{'/'.join(bad)}")
        if pag_scale or sag_scale or n_and > 1 or n_sched > 1:
            raise ValueError("InstructPix2Pix does not compose with "
                             "PAG/SAG/AND/prompt-editing (its three "
                             "guidance lanes replace the CFG stack)")
        # edit image rides the init_image slot ([-1, 1] pixels); the
        # compiled fn encodes its VAE mode once per generation
        image = np.broadcast_to(_prepare_image(edit_image, width, height),
                                (batch, height, width, 3)).copy()

    if inpaint is not None:
        mask = np.ones((1, height, width, 1), np.float32) if mask_image is None \
            else _prepare_mask(mask_image, width, height)
        if mask_blur:
            # A1111 mask blur: gaussian-soften the repaint boundary.
            # Pure-numpy blur (utils/annotators.py) — an eager jax conv
            # here would compile per mask shape on the host path.
            from .utils.annotators import blur as _np_blur

            mask = np.clip(_np_blur(mask[0, ..., 0],
                                    sigma=float(mask_blur)),
                           0.0, 1.0)[None, ..., None].astype(np.float32)
        mask = np.broadcast_to(mask, (batch, height, width, 1)).copy()

    use_control = control_image is not None
    if use_control:
        if "controlnet" not in models:
            raise ValueError("control_image given but models has no "
                             "'controlnet' entry (weights/convert.py "
                             "load_controlnet)")
        nets = models["controlnet"]
        n_nets = len(nets) if isinstance(nets, (list, tuple)) else 1
        imgs = control_image if isinstance(control_image, (list, tuple)) \
            else [control_image]
        if len(imgs) != n_nets:
            raise ValueError(f"{len(imgs)} control images for {n_nets} "
                             "controlnets")
        # ControlNet hint convention: [0, 1] range (not [-1, 1]);
        # stacked (N, B, H, W, 3) — one hint per side net
        hint = np.stack([
            np.broadcast_to(
                rescale(_prepare_image(im, width, height), (-1.0, 1.0),
                        (0.0, 1.0)),
                (batch, height, width, 3)) for im in imgs])
        scales = controlnet_scale if isinstance(
            controlnet_scale, (list, tuple)) else [controlnet_scale] * n_nets
        if len(scales) != n_nets:
            raise ValueError(f"{len(scales)} controlnet scales for "
                             f"{n_nets} controlnets")

    use_adapter = adapter_image is not None
    if use_adapter:
        if "t2i_adapter" not in models:
            raise ValueError("adapter_image given but models has no "
                             "'t2i_adapter' entry (weights/diffusers.py "
                             "load_t2i_adapter)")
        ads = models["t2i_adapter"]
        n_ads = len(ads) if isinstance(ads, (list, tuple)) else 1
        a_imgs = adapter_image if isinstance(adapter_image, (list, tuple)) \
            else [adapter_image]
        if len(a_imgs) != n_ads:
            raise ValueError(f"{len(a_imgs)} adapter images for {n_ads} "
                             "t2i adapters")
        # same hint convention as ControlNet: [0, 1], stacked (N, B, H, W, 3)
        a_hint = np.stack([
            np.broadcast_to(
                rescale(_prepare_image(im, width, height), (-1.0, 1.0),
                        (0.0, 1.0)),
                (batch, height, width, 3)) for im in a_imgs])
        a_scales = adapter_scale if isinstance(
            adapter_scale, (list, tuple)) else [adapter_scale] * n_ads
        if len(a_scales) != n_ads:
            raise ValueError(f"{len(a_scales)} adapter scales for "
                             f"{n_ads} t2i adapters")

    use_ip = ip_adapter_image is not None
    if use_ip:
        # IP-Adapter image prompting (weights/ip_adapter.py): the adapter
        # pytree rides in models["ip_adapter"], the CLIP vision tower in
        # models["clip_vision"]; the image is CLIP-preprocessed host-side
        # and the scale is traced.
        from .models import clip_vision as cv_mod

        if "ip_adapter" not in models:
            raise ValueError("ip_adapter_image given but models has no "
                             "'ip_adapter' entry "
                             "(weights/ip_adapter.load_ip_adapter)")
        if "clip_vision" not in models:
            raise ValueError("ip_adapter_image given but models has no "
                             "'clip_vision' entry "
                             "(weights/ip_adapter.load_clip_vision)")
        if ip2p:
            raise ValueError("IP-Adapter does not compose with "
                             "InstructPix2Pix")
        ip_vis_cfg = clip_vision_config or cv_mod.vit_h14()
        ip_img = cv_mod.preprocess(ip_adapter_image, ip_vis_cfg)
        ip_img = np.broadcast_to(
            ip_img, (batch,) + ip_img.shape[1:]).copy()
    else:
        ip_vis_cfg = None

    if n_frames is not None:
        if (pag_scale or sag_scale or ip2p or n_and > 1 or n_sched > 1
                or control_image is not None or adapter_image is not None
                or reference_image is not None or panorama
                or inpaint is not None or deepcache is not None
                or sequence_parallel or region_masks is not None):
            raise ValueError("n_frames (AnimateDiff) composes only with "
                             "the plain txt2img/img2img path in this "
                             "build")
        if fixed_noise is not None:
            raise ValueError("n_frames is not supported in fixed_noise "
                             "parity mode")
    mwin = None
    if motion_window is not None:
        # long clips: sweep overlapping frame windows (the community
        # AnimateDiff context scheduler) and average per-frame eps
        if n_frames is None:
            raise ValueError("motion_window requires n_frames")
        w_f = int(motion_window)
        if not 2 <= w_f < n_frames:
            raise ValueError(f"motion_window must be in [2, n_frames), "
                             f"got {w_f} for {n_frames} frames")
        if ip_adapter_image is not None or hypernetwork is not None:
            raise ValueError("motion_window does not compose with "
                             "IP-Adapter/hypernetworks (per-frame lane "
                             "slicing)")
        s_f = int(motion_stride or max(w_f // 2, 1))
        starts = list(range(0, n_frames - w_f + 1, s_f))
        if starts[-1] != n_frames - w_f:
            starts.append(n_frames - w_f)
        mwin = (w_f, tuple(starts))

    use_regions = region_masks is not None
    if use_regions:
        # regional prompting (A1111 "Latent Couple" semantics): each AND
        # sub-prompt steers only inside its mask — the composable combine
        # gains a per-lane spatial weight.  Masks are area-downsampled to
        # the latent grid and ride traced (no recompile per mask).
        if n_and < 2:
            raise ValueError("region_masks needs an AND prompt (one mask "
                             "per AND segment, e.g. 'a cat AND a dog')")
        if len(region_masks) != n_and:
            raise ValueError(f"{len(region_masks)} region masks for "
                             f"{n_and} AND segments")
        region_lat = np.stack([
            mask_to_latent_area(
                _prepare_mask(m, width, height), factor)
            for m in region_masks])  # (K, 1, h_lat, w_lat, 1)

    pano = None
    if panorama:
        # MultiDiffusion: denoise a canvas larger than the model's native
        # window by averaging overlapping window predictions per step.
        if (control_image is not None or adapter_image is not None
                or reference_image is not None or ip2p or inpaint
                or pag_scale or sag_scale or n_and > 1 or n_sched > 1):
            raise ValueError("panorama composes only with the plain "
                             "txt2img/img2img path (no ControlNet/"
                             "T2I-Adapter/reference/ip2p/inpaint/PAG/SAG/"
                             "AND/prompt-editing)")
        if deepcache is not None:
            raise ValueError("panorama does not compose with deepcache")
        if sequence_parallel:
            raise ValueError("panorama does not compose with "
                             "sequence_parallel")
        if fixed_noise is not None:
            raise ValueError("panorama is not supported in fixed_noise "
                             "parity mode")
        if panorama_window % factor or panorama_window <= 0:
            raise ValueError(f"panorama_window must be a positive "
                             f"multiple of {factor}")
        stride_px = panorama_stride or panorama_window // 2
        if stride_px % factor or stride_px <= 0:
            raise ValueError(f"panorama_stride must be a positive "
                             f"multiple of {factor}")
        win_lat = panorama_window // factor
        stride_lat = stride_px // factor
        if h_lat < win_lat or w_lat < win_lat:
            raise ValueError(f"canvas {height}x{width} smaller than the "
                             f"panorama window {panorama_window}")

        def _starts(total):
            s = list(range(0, total - win_lat + 1, stride_lat))
            if s[-1] != total - win_lat:
                s.append(total - win_lat)
            return s

        # row-major window sweep (static — part of the compile key)
        ys, xs = [], []
        for yy in _starts(h_lat):
            for xx in _starts(w_lat):
                ys.append(yy)
                xs.append(xx)
        pano = (win_lat, tuple(ys), tuple(xs))

    use_ref = reference_image is not None
    if use_ref:
        # reference-only guidance (the A1111 ControlNet "reference"
        # preprocessors — reference_mode picks attn banking, feature-stat
        # AdaIN, or both): one extra capture UNet eval per step; the
        # lane-mixing contract assumes the plain [cond, uncond] CFG stack.
        if pag_scale or sag_scale or n_and > 1 or n_sched > 1 or ip2p:
            raise ValueError("reference_image does not compose with "
                             "PAG/SAG/AND/prompt-editing/InstructPix2Pix")
        if deepcache is not None:
            raise ValueError("reference_image does not compose with "
                             "deepcache (the attention bank needs the "
                             "full UNet every step)")
        if inpaint == "unet9":
            raise ValueError("reference_image is not supported with "
                             "9-channel inpaint checkpoints")
        if cfg.unet.tome is not None:
            raise ValueError("reference_image does not compose with ToMe "
                             "(merged tokens cannot bank reference "
                             "states)")
        if cfg.unet.hypertile is not None:
            raise ValueError("reference_image does not compose with "
                             "hypertile (tile-local attention cannot "
                             "bank full-grid reference states)")
        if fixed_noise is not None:
            raise ValueError("reference_image is not supported in "
                             "fixed_noise parity mode")
        if not 0.0 <= float(reference_fidelity) <= 1.0:
            raise ValueError("reference_fidelity must be in [0, 1], got "
                             f"{reference_fidelity}")
        # the three A1111 "reference" preprocessor variants; accept both
        # orderings of the combined mode
        if reference_mode not in ("attn", "adain", "adain+attn",
                                  "attn+adain"):
            raise ValueError("reference_mode must be 'attn', 'adain' or "
                             f"'adain+attn', got {reference_mode!r}")
        reference_mode = ("adain+attn" if "+" in reference_mode
                          else reference_mode)
        ref_img = np.broadcast_to(
            _prepare_image(reference_image, width, height),
            (batch, height, width, 3)).copy()

    lat_shape = (batch, h_lat, w_lat, cfg.vae.latent_channels)
    use_fixed = fixed_noise is not None
    if use_fixed:
        noises = {
            "latent_init": jnp.asarray(fixed_noise["latent_init"], jnp.float32)
                .reshape(lat_shape),
            "sampler_noise": jnp.asarray(fixed_noise["sampler_noise"], jnp.float32)
                .reshape((n_inference_steps,) + lat_shape),
        }
        if img2img is True:  # pixel path only; "latent" has no VAE encode
            noises["encoder_noise"] = jnp.asarray(
                fixed_noise["encoder_noise"], jnp.float32).reshape(lat_shape)
        if inpaint == "unet9" and "mask_encoder_noise" in fixed_noise:
            noises["mask_encoder_noise"] = jnp.asarray(
                fixed_noise["mask_encoder_noise"], jnp.float32).reshape(lat_shape)
        elif inpaint == "unet9":
            noises["mask_encoder_noise"] = jnp.zeros(lat_shape, jnp.float32)
    else:
        noises = {"latent_init": jnp.zeros((1,), jnp.float32)}  # unused dummy
    if inpaint is not None:
        noises["mask"] = jnp.asarray(mask)
    if use_control:
        noises["control_hint"] = jnp.asarray(hint, jnp.float32)
        noises["control_scale"] = jnp.asarray(scales, jnp.float32)
    if use_adapter:
        noises["adapter_hint"] = jnp.asarray(a_hint, jnp.float32)
        noises["adapter_scale"] = jnp.asarray(a_scales, jnp.float32)
    if use_ip:
        noises["ip_image"] = jnp.asarray(ip_img, jnp.float32)
        noises["ip_scale"] = jnp.float32(ip_adapter_scale)
    if use_ref:
        noises["ref_image"] = jnp.asarray(ref_img, jnp.float32)
        noises["ref_fidelity"] = jnp.float32(reference_fidelity)
    if use_regions:
        noises["region_masks"] = jnp.asarray(region_lat, jnp.float32)
    if ip2p:
        noises["image_cfg_scale"] = jnp.float32(image_guidance_scale)
    if emphasis:
        noises["cond_weights"] = jnp.asarray(cond_w)
        noises["uncond_weights"] = jnp.asarray(uncond_w)

    if sampler_name in ("restart", "dpm_fast", "dpm_adaptive"):
        # these samplers run their own op/segment grids, replacing the
        # per-step arrays the other features key off (sampler noises,
        # blend schedule, per-step context switching, DeepCache refresh
        # counting)
        if inpaint is not None:
            raise ValueError(f"sampler {sampler_name!r} does not support "
                             "inpainting")
        if deepcache is not None:
            raise ValueError(f"sampler {sampler_name!r} does not compose "
                             "with deepcache")
        if n_sched > 1:
            raise ValueError(f"sampler {sampler_name!r} does not compose "
                             "with prompt editing/alternation")
        if fixed_noise is not None:
            raise ValueError(f"sampler {sampler_name!r} is not supported "
                             "in fixed_noise parity mode")
    key = jax.random.PRNGKey(0 if seed is None else seed) if _key is None \
        else _key
    # A1111 variation seeds: slerp between the base seed's init noise and
    # the variation seed's at variation_strength (modules/processing.py's
    # subseed/subseed_strength semantics; strength is traced).
    use_variation = variation_seed is not None and variation_strength != 0.0
    if use_variation:
        if not 0.0 <= variation_strength <= 1.0:
            raise ValueError("variation_strength must be in [0, 1], got "
                             f"{variation_strength}")
        if fixed_noise is not None:
            raise ValueError("variation seeds are not supported in "
                             "fixed_noise parity mode")
        noises["variation_key"] = jax.random.PRNGKey(int(variation_seed))
        noises["variation_strength"] = jnp.float32(variation_strength)
    # Perturbed-Attention Guidance: scale != 0 compiles the PAG variant
    # (one extra cond-lane UNet eval per step); the scale itself is traced.
    use_pag = pag_scale != 0.0
    if use_pag:
        if fixed_noise is not None:
            raise ValueError("PAG is not supported in fixed_noise parity "
                             "mode")
        noises["pag_scale"] = jnp.float32(pag_scale)
    # Self-Attention Guidance: scale != 0 compiles the SAG variant (mid
    # attention-map capture + one extra base-lane eval on blurred-salient
    # latents per step); the scale itself is traced.
    use_sag = sag_scale != 0.0
    if use_sag:
        if fixed_noise is not None:
            raise ValueError("SAG is not supported in fixed_noise parity "
                             "mode")
        if deepcache is not None:
            raise ValueError("SAG needs the mid block every step; it does "
                             "not compose with deepcache")
        noises["sag_scale"] = jnp.float32(sag_scale)
    # A1111 hypernetwork: ``hypernetwork`` is the loader's static metadata
    # (activation, activate_output); the module tree must ride in
    # ``models["hypernetwork"]`` and the multiplier is traced.
    hyper = None
    if hypernetwork is not None:
        if "hypernetwork" not in models:
            raise ValueError("hypernetwork metadata given but models has no "
                             "'hypernetwork' entry "
                             "(weights/hypernetwork.load_hypernetwork)")
        if n_sched > 1:
            raise ValueError("hypernetworks are not supported with prompt "
                             "editing/alternation")
        if str(cfg.unet.d_context) not in models["hypernetwork"]:
            raise ValueError(
                f"hypernetwork has no entry for context width "
                f"{cfg.unet.d_context} (has "
                f"{sorted(models['hypernetwork'])})")
        act, act_out = hypernetwork
        hyper = (str(act), bool(act_out))
        noises["hyper_strength"] = jnp.float32(hypernetwork_strength)
    # SDXL micro-conditioning: (orig_h, orig_w, crop_top, crop_left
    # [, tgt_h, tgt_w]) — the diffusers original_size/crops/target_size
    # knobs; only meaningful for added-conditioning families
    size_ids = canonical_size_ids(cfg, height, width, original_size,
                                  crop_coords, target_size)
    use_noise_mult = noise_multiplier is not None
    if use_noise_mult:
        if fixed_noise is not None:
            raise ValueError("noise_multiplier is not supported in "
                             "fixed_noise parity mode")
        noises["noise_multiplier"] = jnp.float32(noise_multiplier)
    use_dyn_thresh = dynamic_threshold is not None
    if use_dyn_thresh:
        if not 0.0 < float(dynamic_threshold) <= 1.0:
            raise ValueError("dynamic_threshold is a quantile ratio in "
                             f"(0, 1], got {dynamic_threshold}")
        noises["dyn_thresh_ratio"] = jnp.float32(dynamic_threshold)
    if deepcache is not None:
        deepcache = int(deepcache)
        if deepcache < 1:
            raise ValueError(f"deepcache interval must be >= 1, got "
                             f"{deepcache}")
        unet_mod.deepcache_shape(cfg.unet, 1, h_lat, w_lat)  # validates
    run = _compiled_txt2img(cfg, n_inference_steps, do_cfg, batch,
                            h_lat, w_lat, img2img, use_fixed, progress,
                            sampler_name, float(ddim_eta), decode_tile,
                            sp_mesh, inpaint, use_control, use_adapter,
                            ip2p,
                            float(guidance_rescale), timestep_spacing,
                            emphasis, deepcache, n_sched, use_variation,
                            use_pag,
                            int(encode_tile) if encode_tile else None,
                            hyper, use_sag, n_and, bool(tiling),
                            use_dyn_thresh, use_noise_mult, size_ids,
                            use_ip, ip_vis_cfg, use_ref,
                            reference_mode if use_ref else "attn",
                            pano, use_regions,
                            n_frames, mwin)
    if n_sched > 1:
        noises["sched_idx"] = jnp.asarray(sched_idx_arr)
    if n_and > 1:
        noises["and_weights"] = jnp.asarray(and_w)
    cond_tokens = jnp.asarray(cond_tokens)
    uncond_tokens = jnp.asarray(uncond_tokens)
    image = jnp.asarray(image)
    if mesh is not None:
        from .core.mesh import data_sharded

        if n_sched == 1 and n_and == 1:
            # prompt-editing / AND stacks carry K*B on the leading axis —
            # leave them replicated (CLIP runs replicated; the UNet loop is
            # still data-sharded through the latents)
            cond_tokens = jax.device_put(
                cond_tokens, data_sharded(mesh, cond_tokens.ndim))
            uncond_tokens = jax.device_put(
                uncond_tokens, data_sharded(mesh, uncond_tokens.ndim))
        image = jax.device_put(image, data_sharded(mesh, 4))
    images, latents = run(models, cond_tokens, uncond_tokens, key,
                          jnp.float32(cfg_scale), jnp.int32(start_step),
                          image, noises)
    if _device_output:
        # async-dispatch path (generate_many): the caller collects device
        # arrays later, overlapping further dispatches with device compute
        if color_correction:
            raise ValueError("color_correction is not supported on the "
                             "async generate_many path")
        return images, latents
    out = np.asarray(images).astype(np.uint8)
    if color_correction:
        # A1111 img2img "apply color correction": histogram-match each
        # output to its init image (host-side post-processing)
        if input_image is None:
            raise ValueError("color_correction requires input_image")
        ref = np.clip(rescale(np.asarray(image), (-1.0, 1.0), (0.0, 255.0)),
                      0, 255).astype(np.uint8)
        out = np.stack([match_histograms(out[i], ref[i])
                        for i in range(out.shape[0])])
    return out, np.asarray(latents)


def generate(prompt, uncond_prompt="", **kwargs):
    """Generate one image from text (+ optional init image).

    Reference-parity signature and semantics (``pipeline.py:13-27``); extra
    keyword-only args are TPU-native additions.  Returns a single uint8 HWC
    numpy image (the reference's output contract, ``pipeline.py:253-262``).

    Pass ``return_latents=True`` to also get the final latents (for parity
    tests against recorded goldens).
    """
    return_latents = kwargs.pop("return_latents", False)
    images, latents = _run_generate(prompt, uncond_prompt, **kwargs)
    if return_latents:
        return images[0], latents
    return images[0]


def generate_images(prompts, uncond_prompts="", **kwargs) -> np.ndarray:
    """Batched generation: list of prompts -> (B, H, W, 3) uint8 (all images).

    One compiled call serves the whole batch (CFG doubles it internally);
    this is the BASELINE.json "batched txt2img" config entry point.
    """
    images, _ = _run_generate(list(prompts), uncond_prompts, **kwargs)
    return images


def generate_many(prompts, uncond_prompts="", *, batch_size: int = 4,
                  seed: Optional[int] = None, **kwargs) -> np.ndarray:
    """Serving-throughput path: any number of prompts -> (N, H, W, 3) uint8.

    Splits the prompt list into ``batch_size`` chunks and dispatches every
    compiled call back-to-back WITHOUT fetching between them — JAX's async
    dispatch queues the work, so host-side tokenization and the per-call
    device-fetch round-trip (~30 ms through the axon relay) overlap with
    device compute instead of serializing after it.  Sustained throughput
    approaches pure device time per batch.

    Chunk seeding: chunk 0 uses the root key ``PRNGKey(seed)`` (so a call
    that fits in one batch bit-matches ``generate_images`` at the same
    seed), and chunk ``k > 0`` folds ``k`` into a dedicated 'chunk' stream
    of the root key (``core/rng.py``).  Distinct seeds therefore never
    reproduce each other's chunks — the naive ``seed + k`` scheme would
    make call(seed=0) chunk 1 identical to call(seed=1) chunk 0.  The final
    partial chunk is padded by repeating its last prompt and sliced off
    afterwards, so every call reuses the one compiled program.
    """
    prompts = list(prompts)
    uncond = ([uncond_prompts] * len(prompts)
              if isinstance(uncond_prompts, str) else list(uncond_prompts))
    if len(uncond) != len(prompts):
        raise ValueError("uncond_prompts length must match prompts")
    n = len(prompts)
    if n == 0:
        return np.zeros((0, kwargs.get("height", 512),
                         kwargs.get("width", 512), 3), np.uint8)
    # per-sample init images (4-D array, one per prompt — the sd_upscale
    # tiled path) are chunked alongside the prompts
    per_sample_img = None
    img_arg = kwargs.get("input_image")
    if img_arg is not None and np.ndim(img_arg) == 4:
        per_sample_img = np.asarray(img_arg)
        if len(per_sample_img) != n:
            raise ValueError(f"{len(per_sample_img)} input images for "
                             f"{n} prompts")
    root = jax.random.PRNGKey(0 if seed is None else seed)
    device_outs = []
    for i in range(0, n, batch_size):
        chunk = prompts[i:i + batch_size]
        cu = uncond[i:i + batch_size]
        ckw = dict(kwargs)
        if per_sample_img is not None:
            imgs = per_sample_img[i:i + batch_size]
            if len(imgs) < batch_size:
                pad = np.repeat(imgs[-1:], batch_size - len(imgs), axis=0)
                imgs = np.concatenate([imgs, pad], axis=0)
            ckw["input_image"] = imgs
        while len(chunk) < batch_size:  # pad to keep one compiled shape
            chunk.append(chunk[-1])
            cu.append(cu[-1])
        k = i // batch_size
        chunk_key = root if k == 0 \
            else jax.random.fold_in(rng_mod.stream(root, "chunk"), k)
        images, _ = _run_generate(chunk, cu, _key=chunk_key,
                                  _device_output=True, **ckw)
        device_outs.append(images)
    out = np.concatenate([np.asarray(o) for o in device_outs], axis=0)
    return out[:n].astype(np.uint8)
