"""Model/architecture configuration.

The reference hard-codes every hyperparameter in its constructors
(``/root/reference/sd/clip.py:214-221``, ``sd/diffusion.py:543-626``,
``sd/encoder.py:54-93``, ``sd/decoder.py:232-340``).  We lift them into
frozen dataclasses so tests can run scaled-down models and future SD
variants reuse the same code.  Defaults reproduce SD-1.5 exactly
(SURVEY §2.2 constants table).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from ..core.dtypes import Policy, FP32


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """CLIP ViT-L/14 text tower (``sd/clip.py:214-221``)."""

    vocab_size: int = 49408
    d_model: int = 768
    max_len: int = 77
    n_layers: int = 12
    n_heads: int = 12
    d_ff: int = 3072
    #: "quick_gelu" (SD-1.x CLIP ViT-L, ref clip.py:166) or "gelu"
    #: (SD-2.x OpenCLIP ViT-H).
    hidden_act: str = "quick_gelu"
    #: stop after this many transformer layers, then apply the final LN —
    #: SD-2.x conditions on the penultimate layer (n_layers - 1).
    stop_at_layer: int = None
    #: apply the final LayerNorm to the truncated (stop_at_layer) hidden —
    #: True for SD-2.x; SDXL conditions on the RAW penultimate hidden.
    penultimate_norm: bool = True
    #: OpenCLIP pooled-text head (SDXL bigG): (d, d) projection applied to
    #: the final-normed EOT token embedding (clip.apply_with_pooled).
    text_projection: bool = False
    #: checkpoint key namespace: "clip" (SD-1.x, HF-transformers-style
    #: cond_stage_model.transformer.text_model.*) or "open_clip" (SD-2.x,
    #: cond_stage_model.model.* with fused attn in_proj).  Affects only
    #: weights/convert.py; the runtime model is identical.
    layout: str = "clip"
    #: checkpoint key prefix override (SDXL: the towers live under
    #: conditioner.embedders.{0,1}.*); None -> the layout's default.
    key_prefix: str = None


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL (``sd/encoder.py:54-93``, ``sd/decoder.py:232-340``)."""

    in_channels: int = 3
    base_channels: int = 128
    ch_mults: Tuple[int, ...] = (1, 2, 4, 4)
    latent_channels: int = 4
    groups: int = 32
    scale_factor: float = 0.18215  # encoder.py:152 / decoder.py:364
    logvar_clamp: Tuple[float, float] = (-30.0, 20.0)  # encoder.py:131

    @property
    def level_channels(self) -> Tuple[int, ...]:
        return tuple(self.base_channels * m for m in self.ch_mults)

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.ch_mults) - 1)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD-1.5 UNet (``sd/diffusion.py:543-626``): channel_mult (1,2,4,4),
    2 res blocks/level, spatial attention on every level but the last."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    ch_mults: Tuple[int, ...] = (1, 2, 4, 4)
    attn_levels: Tuple[bool, ...] = (True, True, True, False)
    num_res_blocks: int = 2
    n_heads: int = 8
    #: SD-2.x style: fixed per-head width instead of a fixed head count
    #: (SD-2 uses head_dim=64 -> 5/10/20 heads across levels).  When set,
    #: overrides n_heads per attention block.
    head_dim: int = None
    d_context: int = 768
    groups: int = 32
    #: per-level transformer depth inside each attention block (SDXL: 2/10
    #: stacked self+cross+ff layers at the 2nd/3rd levels; the bottleneck
    #: uses the deepest level's depth).  None -> depth 1 everywhere
    #: (SD-1.x/2.x).
    transformer_depth: Tuple[int, ...] = None
    #: SDXL added conditioning: dimension of the concatenated
    #: (pooled-text, size-embedding) vector fed through the add_embedding
    #: MLP into the time embedding (SDXL: 1280 + 6*256 = 2816).
    add_embed_dim: int = None
    #: number of scalar add_time_ids sinusoidally embedded next to the
    #: pooled text: 6 for SDXL-base (orig_h, orig_w, crop_t, crop_l,
    #: tgt_h, tgt_w), 5 for the refiner (crop + aesthetic_score).
    add_time_ids: int = 6
    #: LCM guidance-embedding width (diffusers ``time_cond_proj_dim``,
    #: 256 for the published LCM-distilled checkpoints): the guidance
    #: scale w is sinusoidally embedded and linearly projected
    #: (bias-free) into the sinusoidal timestep embedding before the
    #: time MLP.  None for ordinary CFG checkpoints.
    time_cond_dim: int = None
    #: FreeU (Si et al. 2023, training-free quality knob): (b1, b2, s1, s2)
    #: — at the two DEEPEST decoder levels, scale the first half of the
    #: backbone channels by b_i and low-pass-attenuate the skip connection
    #: by s_i in the Fourier domain.  None = off.  Family defaults via
    #: models/config.with_freeu.
    freeu: Tuple[float, float, float, float] = None
    #: ToMe token merging (ops/tome.py; tomesd / the A1111 "Token merging
    #: ratio" knob): (ratio, sx, sy, min_tokens) — before each
    #: self-attention in blocks with >= min_tokens tokens, merge
    #: ratio*n_src redundant tokens into their most similar stride-cell
    #: representative and unmerge after.  Approximate (opt-in);
    #: None = off (exact).  Use models/config.with_tome.
    tome: Tuple[float, int, int, int] = None
    #: Hypertile (tfernd/HyperTile; the A1111 built-in "Hypertile" perf
    #: setting): (tile, min_tokens) — self-attention in blocks with
    #: >= min_tokens tokens runs tile-locally over non-overlapping
    #: (<=tile x <=tile) latent windows folded into the batch axis,
    #: cutting the O(N^2) cost to O(N*tile^2).  Approximate (opt-in);
    #: None = off (exact).  Use models/config.with_hypertile.
    hypertile: Tuple[int, int] = None

    def depth_for(self, level: int) -> int:
        if self.transformer_depth is None:
            return 1
        return self.transformer_depth[level]

    @property
    def time_embed_dim(self) -> int:
        return 4 * self.model_channels

    @property
    def level_channels(self) -> Tuple[int, ...]:
        return tuple(self.model_channels * m for m in self.ch_mults)

    def heads_for(self, channels: int) -> int:
        """Head count for an attention block at ``channels`` width."""
        if self.head_dim is not None:
            if channels % self.head_dim:
                raise ValueError(f"channels {channels} not divisible by "
                                 f"head_dim {self.head_dim}")
            return channels // self.head_dim
        return self.n_heads


@dataclasses.dataclass(frozen=True)
class SDConfig:
    clip: CLIPConfig = CLIPConfig()
    vae: VAEConfig = VAEConfig()
    unet: UNetConfig = UNetConfig()
    policy: Policy = FP32
    #: "xla" (materialized scores — parity path) or "pallas" (flash).
    attention_backend: str = "xla"
    #: VAE mid-block attention: 1 head, batch 1-2 — measured faster on the
    #: XLA path (benchmarks/components.py: 19.7ms vs 21.6ms decode); the
    #: flash grid has too little parallelism there.  Overridable.
    vae_attention_backend: str = "xla"
    #: "xla" (lax.conv + separate GN/SiLU — parity path), "pallas" (the
    #: fused GN->SiLU->conv3x3 res-block kernel, ops/pallas/conv.py),
    #: "fold" (XLA convs with every UNet norm's normalize folded to a
    #: compute-dtype affine — ops/norm.group_norm_silu_folded /
    #: layer_norm_folded; measured −1.3% SDXL 1024², ±0 at 512²), or
    #: "pallas_fold" (both: pallas res blocks where eligible, folded
    #: norms everywhere else).  All opt-in perf tiers, equivalent up to
    #: bf16 rounding of the normalize / (h + t_emb) apply; pallas
    #: auto-falls back per block for ineligible shapes / int8 / seamless
    #: tiling, and every non-xla tier falls back globally under sequence
    #: parallelism (per-shard GN stats would be wrong / GSPMD cannot
    #: spatially partition the opaque kernel).
    conv_backend: str = "xla"
    #: Reproduce the reference's three genuine bugs for golden parity:
    #: dropped GeGLU gate (diffusion.py:359-363), the VAE attention
    #: un-transpose no-op (decoder.py:62,67), and the beta_start typo
    #: 0.000085 (ddpm.py:30; CompVis value is 0.00085).
    #: Default False = correct SD-1.5.
    reference_quirks: bool = False
    #: second text tower (SDXL's OpenCLIP bigG); None for single-tower
    #: SD-1.x/2.x.  When set, the pipeline concatenates both towers'
    #: penultimate hiddens as cross-attention context and feeds the bigG
    #: pooled embedding (+ size ids) through the UNet's add_embedding.
    clip2: CLIPConfig = None
    #: "epsilon" (SD-1.x / SD-2-base) or "v" (SD-2.x 768-v checkpoints).
    prediction_type: str = "epsilon"
    #: Rescale betas so SNR(T) == 0 (Lin et al. 2024; terminal alpha-bar
    #: pinned to 2^-24).  For v-prediction checkpoints fine-tuned with
    #: zero terminal SNR; sample with timestep_spacing="trailing" and
    #: guidance_rescale ~0.7 (the paper's recipe).
    zero_terminal_snr: bool = False
    #: Fuse same-input q/k/v projections into one wide matmul (measured ~5%
    #: whole-UNet win on a single chip).  The pipeline forces this False on
    #: a tensor-parallel mesh: the fused concatenation runs along the
    #: Megatron column-sharded kernel axis, making GSPMD gather the
    #: deliberately-sharded weights (ADVICE r2).
    fuse_qkv: bool = True
    #: UNet int8 tier (ops/quant.py): "none" (exact bf16/fp32), "wide"
    #: (dynamic w8a8 on K >= 1280 matmuls/1x1s only — the 16²/8² levels),
    #: "conv" (w8a8 additionally on every 3x3 conv), "w8" (WEIGHT-only
    #: int8 on every UNet contraction — halves per-step HBM weight
    #: traffic, no activation-quant fusion boundaries; the batch-1
    #: latency candidate).  Perf tiers; in-situ hardware A/Bs decide the
    #: shipping default (w8a8 measured negative, RESULTS.md).
    quant: str = "none"
    #: SDXL-refiner aesthetic-score conditioning value (the 5th
    #: add_time_id; sgm's positive-prompt default).  Unused elsewhere.
    aesthetic_score: float = 6.0


def tiny_sd_config(policy: Policy = FP32, **kw) -> SDConfig:
    """Scaled-down config for fast CPU tests (same topology, small dims)."""
    return SDConfig(
        clip=CLIPConfig(vocab_size=1024, d_model=32, max_len=16, n_layers=2, n_heads=4, d_ff=64),
        vae=VAEConfig(base_channels=16, ch_mults=(1, 2), groups=4),
        unet=UNetConfig(
            model_channels=16, ch_mults=(1, 2), attn_levels=(True, False),
            n_heads=4, d_context=32, groups=4,
        ),
        policy=policy,
        **kw,
    )


def tiny_sdxl_config(policy: Policy = FP32, **kw) -> SDConfig:
    """Scaled-down SDXL config (dual towers, per-level transformer depth,
    added conditioning) for fast CPU tests and the driver dryrun — same
    topology knobs as :func:`sdxl_config` at tiny dims."""
    return SDConfig(
        clip=CLIPConfig(vocab_size=1024, d_model=16, max_len=16, n_layers=2,
                        n_heads=2, d_ff=32, stop_at_layer=1,
                        penultimate_norm=False,
                        key_prefix="conditioner.embedders.0.transformer"
                                   ".text_model"),
        clip2=CLIPConfig(vocab_size=1024, d_model=32, max_len=16, n_layers=3,
                         n_heads=4, d_ff=64, hidden_act="gelu",
                         stop_at_layer=2, penultimate_norm=False,
                         text_projection=True, layout="open_clip",
                         key_prefix="conditioner.embedders.1.model"),
        vae=VAEConfig(base_channels=16, ch_mults=(1, 2), groups=4,
                      scale_factor=0.13025),
        unet=UNetConfig(model_channels=16, ch_mults=(1, 2),
                        attn_levels=(False, True), transformer_depth=(1, 2),
                        head_dim=8, d_context=48, groups=4,
                        add_embed_dim=32 + 6 * 4),  # pooled 32 + 6x4 sizes
        policy=policy,
        **kw,
    )


def sd15_config(policy: Policy = FP32, **kw) -> SDConfig:
    return SDConfig(policy=policy, **kw)


def sd15_lcm_config(policy: Policy = FP32, **kw) -> SDConfig:
    """SD-1.5 LCM-distilled architecture (SimianLuo/LCM_Dreamshaper_v7
    style): the SD-1.5 topology plus the 256-wide guidance-embedding
    projection (``time_cond_dim``).  Sample with ``sampler_name="lcm"``,
    2-8 steps, ``do_cfg=False`` (guidance is embedded via cfg_scale).
    LCM-LoRA on a stock checkpoint needs no special config — merge with
    ``loras=[...]`` and use the plain family preset."""
    return SDConfig(unet=UNetConfig(time_cond_dim=256), policy=policy, **kw)


def sd15_inpaint_config(policy: Policy = FP32, **kw) -> SDConfig:
    """SD-1.5 inpainting architecture (runwayml/stable-diffusion-inpainting).

    Identical to SD-1.5 except the UNet's conv_in takes 9 channels: the
    4 latent channels + a 1-channel nearest-downsampled repaint mask + the
    4-channel VAE encoding of the masked image, concatenated every step
    (pipeline inpaint="unet9").  Everything else (towers, VAE, converter
    rules) is shared — the converter adapts structurally to in_channels."""
    return SDConfig(unet=UNetConfig(in_channels=9), policy=policy, **kw)


def sd15_ip2p_config(policy: Policy = FP32, **kw) -> SDConfig:
    """InstructPix2Pix (Brooks et al. 2023; timbrooks/instruct-pix2pix).

    The SD-1.5 topology with an 8-channel conv_in: 4 noise latents + the
    4-channel edit-image latents (the VAE distribution's MODE and — a
    published quirk of the family — NOT multiplied by the latent scale
    factor), concatenated every step.  Sampled with dual text/image
    guidance: ``generate(edit_image=..., cfg_scale=...,
    image_guidance_scale=...)``.  Converter rules adapt structurally to
    in_channels like the inpaint family."""
    return SDConfig(unet=UNetConfig(in_channels=8), policy=policy, **kw)


def sd2_inpaint_config(policy: Policy = FP32, **kw) -> SDConfig:
    """SD-2.0 inpainting (stabilityai/stable-diffusion-2-inpainting):
    the SD-2 512-base architecture (epsilon prediction) with the 9-channel
    inpaint conv_in."""
    base = sd21_config(policy=policy, v_prediction=False, **kw)
    return dataclasses.replace(
        base, unet=dataclasses.replace(base.unet, in_channels=9))


def sd21_config(policy: Policy = FP32, v_prediction: bool = True, **kw) -> SDConfig:
    """SD-2.1 architecture preset (the reference covers only SD-1.5).

    OpenCLIP ViT-H text tower (24 layers, d 1024, GELU, penultimate-layer
    conditioning), UNet with head_dim 64 and d_context 1024; 768-v
    checkpoints use v-prediction.  Checkpoint conversion: weights/convert.py
    handles the cond_stage_model.model.* OpenCLIP namespace including the
    fused attn in_proj split (synthetic round-trip tested at this topology
    in tests/test_sd2_convert.py; no real SD-2 weights on this host)."""
    return SDConfig(
        clip=CLIPConfig(vocab_size=49408, d_model=1024, max_len=77,
                        n_layers=24, n_heads=16, d_ff=4096,
                        hidden_act="gelu", stop_at_layer=23,
                        layout="open_clip"),
        vae=VAEConfig(),
        unet=UNetConfig(model_channels=320, ch_mults=(1, 2, 4, 4),
                        attn_levels=(True, True, True, False),
                        n_heads=8, head_dim=64, d_context=1024),
        policy=policy,
        prediction_type="v" if v_prediction else "epsilon",
        **kw,
    )


def sdxl_config(policy: Policy = FP32, **kw) -> SDConfig:
    """SDXL-base architecture preset (the reference covers only SD-1.5).

    Dual text towers — CLIP-L (penultimate, un-normed) + OpenCLIP bigG
    (penultimate + pooled/text_projection) concatenated to a 2048-d
    context; 3-level UNet (320/640/1280) with transformer depths (1,2,10),
    head_dim 64, and the 2816-d added conditioning (pooled 1280 + 6x256
    size embeddings) through add_embedding; VAE scale 0.13025.  Checkpoint
    conversion handles the conditioner.embedders.{0,1} namespaces
    (synthetic round-trip tested; no real SDXL weights on this host)."""
    return SDConfig(
        clip=CLIPConfig(vocab_size=49408, d_model=768, max_len=77,
                        n_layers=12, n_heads=12, d_ff=3072,
                        hidden_act="quick_gelu", stop_at_layer=11,
                        penultimate_norm=False,
                        key_prefix="conditioner.embedders.0.transformer"
                                   ".text_model"),
        clip2=CLIPConfig(vocab_size=49408, d_model=1280, max_len=77,
                         n_layers=32, n_heads=20, d_ff=5120,
                         hidden_act="gelu", stop_at_layer=31,
                         penultimate_norm=False, text_projection=True,
                         layout="open_clip",
                         key_prefix="conditioner.embedders.1.model"),
        vae=VAEConfig(scale_factor=0.13025),
        unet=UNetConfig(model_channels=320, ch_mults=(1, 2, 4),
                        attn_levels=(False, True, True),
                        transformer_depth=(1, 2, 10),
                        head_dim=64, d_context=2048, add_embed_dim=2816),
        policy=policy,
        **kw,
    )


def sdxl_inpaint_config(policy: Policy = FP32, **kw) -> SDConfig:
    """SDXL inpainting (diffusers sdxl-inpainting-0.1): the SDXL-base
    architecture with the 9-channel inpaint conv_in."""
    base = sdxl_config(policy=policy, **kw)
    return dataclasses.replace(
        base, unet=dataclasses.replace(base.unet, in_channels=9))


def sdxl_lcm_config(policy: Policy = FP32, **kw) -> SDConfig:
    """SDXL LCM-distilled architecture (latent-consistency/lcm-sdxl
    style): SDXL-base plus the 256-wide guidance-embedding projection.
    Sample with ``sampler_name="lcm"``, 2-8 steps, ``do_cfg=False``."""
    base = sdxl_config(policy=policy, **kw)
    return dataclasses.replace(
        base, unet=dataclasses.replace(base.unet, time_cond_dim=256))


def sdxl_refiner_config(policy: Policy = FP32, **kw) -> SDConfig:
    """SDXL-refiner architecture preset (elective family tier).

    Single OpenCLIP bigG tower (penultimate hidden AS the 1280-d context,
    pooled + text_projection for the added conditioning — no CLIP-L);
    4-level UNet (384/768/1536/1536) with transformer depth 4 at the two
    attention levels and the bottleneck; added conditioning is
    pooled 1280 + 5x256 ids (orig/crop + aesthetic_score, sgm's
    ``sd_xl_refiner.yaml`` — 2560-d adm).  Same 0.13025 VAE as the base.
    Structural topology from the published sgm config; no real refiner
    weights on this host, so the param count is regression-locked, not
    externally verified."""
    return SDConfig(
        clip=CLIPConfig(vocab_size=49408, d_model=1280, max_len=77,
                        n_layers=32, n_heads=20, d_ff=5120,
                        hidden_act="gelu", stop_at_layer=31,
                        penultimate_norm=False, text_projection=True,
                        layout="open_clip",
                        key_prefix="conditioner.embedders.0.model"),
        vae=VAEConfig(scale_factor=0.13025),
        # transformer_depth[-1] exists only to feed the bottleneck lookup
        # (depth_for(len-1)); level 3 itself has no attention.
        unet=UNetConfig(model_channels=384, ch_mults=(1, 2, 4, 4),
                        attn_levels=(False, True, True, False),
                        transformer_depth=(0, 4, 4, 4),
                        head_dim=64, d_context=1280,
                        add_embed_dim=2560, add_time_ids=5),
        policy=policy,
        **kw,
    )


def with_clip_skip(cfg: SDConfig, clip_skip: int) -> SDConfig:
    """A1111-convention "CLIP skip": condition the UNet on an EARLIER text
    encoder layer.  ``clip_skip=1`` is the family default (no change);
    each increment stops one transformer layer earlier than that default
    (SD-1.x: 2 == penultimate layer + final LN — the webui setting used by
    anime-style checkpoints; SD-2.x/SDXL already condition on their
    penultimate layer by default, so 2 == antepenultimate there, matching
    diffusers' relative semantics).  SDXL pooled embeddings are unaffected
    (clip.apply_with_pooled always runs the full stack).  The returned
    config hashes differently, so the compiled-pipeline cache keys new
    variants automatically.
    """
    if clip_skip < 1:
        raise ValueError(f"clip_skip must be >= 1, got {clip_skip}")
    if clip_skip == 1:
        return cfg

    def shift(tower: CLIPConfig) -> CLIPConfig:
        base = tower.n_layers if tower.stop_at_layer is None \
            else tower.stop_at_layer
        stop = base - (clip_skip - 1)
        if stop < 1:
            raise ValueError(f"clip_skip {clip_skip} skips past the "
                             f"{tower.n_layers}-layer text encoder")
        # towers whose default is the full stack (SD-1.x) norm the truncated
        # hidden (penultimate_norm default True == A1111); towers configured
        # raw (SDXL) stay raw.
        return dataclasses.replace(tower, stop_at_layer=stop)

    return dataclasses.replace(
        cfg, clip=shift(cfg.clip),
        clip2=None if cfg.clip2 is None else shift(cfg.clip2))


#: published FreeU defaults (the paper's recommended settings per family)
FREEU_DEFAULTS_SD = (1.5, 1.6, 0.9, 0.2)
FREEU_DEFAULTS_SDXL = (1.3, 1.4, 0.9, 0.2)


def with_tome(cfg: SDConfig, ratio: float = 0.5, *, sx: int = 2, sy: int = 2,
              min_tokens: int = 4096) -> SDConfig:
    """ToMe token merging (the A1111 "Token merging ratio" setting;
    tomesd defaults: 2x2 stride, highest-resolution blocks only — at SD's
    native sizes that is the 4096+-token level).  ``ratio`` is the
    fraction of TOTAL tokens merged (the tomesd knob, clamped to the
    non-representative population); 0 returns the config unchanged
    (exact)."""
    if not 0.0 <= ratio < 1.0:
        raise ValueError(f"tome ratio must be in [0, 1), got {ratio}")
    if ratio == 0.0:
        return dataclasses.replace(cfg, unet=dataclasses.replace(
            cfg.unet, tome=None))
    return dataclasses.replace(cfg, unet=dataclasses.replace(
        cfg.unet, tome=(float(ratio), int(sx), int(sy), int(min_tokens))))


def with_hypertile(cfg: SDConfig, tile: int = 32, *,
                   min_tokens: int = 4096) -> SDConfig:
    """Hypertile tile-local self-attention (the A1111 built-in "Hypertile"
    setting; tfernd/HyperTile).  ``tile`` is the max tile side in LATENT
    tokens (the A1111 256-px default / the 8x VAE factor = 32); each
    qualifying self-attention uses the largest divisor of its grid side
    <= ``tile``.  Grids already within one tile run exactly (bit-identical
    to off).  ``tile=0``/``None`` returns the config with hypertile off."""
    if not tile:
        return dataclasses.replace(cfg, unet=dataclasses.replace(
            cfg.unet, hypertile=None))
    if tile < 1:
        raise ValueError(f"hypertile tile must be >= 1, got {tile}")
    return dataclasses.replace(cfg, unet=dataclasses.replace(
        cfg.unet, hypertile=(int(tile), int(min_tokens))))


def with_freeu(cfg: SDConfig, freeu=True) -> SDConfig:
    """Enable FreeU (training-free decoder re-weighting) on a config.

    ``freeu=True`` picks the published defaults for the family (SDXL-class
    configs — those with added conditioning — use the SDXL settings);
    otherwise pass an explicit ``(b1, b2, s1, s2)``.  ``freeu=False``/
    ``None`` returns an unmodified config.  The returned config hashes
    differently, keying a new compiled-pipeline variant.
    """
    if freeu is None or freeu is False:
        return cfg
    if freeu is True:
        freeu = FREEU_DEFAULTS_SDXL if cfg.unet.add_embed_dim else \
            FREEU_DEFAULTS_SD
    vals = tuple(float(v) for v in freeu)
    if len(vals) != 4:
        raise ValueError(f"freeu wants (b1, b2, s1, s2), got {freeu!r}")
    return dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, freeu=vals))


def fast_preset(cfg: SDConfig):
    """The measured-win approximate-mode bundle ("fast preset"): returns
    ``(config, generate_kwargs)`` — use the config and merge the kwargs
    into ``generate()``/``txt2img()`` calls (CLI: ``--fast``).

    Composition = Hypertile tile 32 (tile-local self-attention) +
    DeepCache interval 3 (cached deep features, full UNet every 3rd
    step), the two knobs whose hardware A/Bs won at every config
    (benchmarks/RESULTS.md "Hi-res approximate-mode matrix"): 512^2
    +18.6% / +36% individually, 768^2 stacked +129.9% (0.365 -> 0.84
    img/s), 512^2 batch-4 stacked 1.26 -> 2.217 img/s (+76%), 1024^2
    stacked 2.671 -> 0.944 s (+183%), 2048^2 stacked 15.34 -> 2.60 s
    (5.9x — hypertile carries that one: tile-local attention at 65536
    tokens), SDXL 1024^2 stacked 2.462 -> 1.087 s (+126%; add
    conv_backend="fold" for 1.064 s).  Both knobs trade exactness for
    speed
    (quality-neutral at these settings in the published papers' metrics);
    drop whichever you need exact.
    """
    return with_hypertile(cfg, 32), {"deepcache": 3}
