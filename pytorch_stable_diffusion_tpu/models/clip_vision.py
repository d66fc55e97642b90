"""CLIP vision tower (functional JAX) — the IP-Adapter image encoder.

No analog exists in ``/root/reference`` (text-only conditioning); the
behavior target is HF transformers' ``CLIPVisionModelWithProjection``
(the image encoder the published IP-Adapter checkpoints ship with,
h94/IP-Adapter ``models/image_encoder``):

  * patch conv (stride = patch size, NO bias) + learned class embedding
    prepended + learned position embeddings,
  * ``pre_layrnorm`` (sic — the HF attribute name carries the typo),
  * pre-norm transformer layers (biased qkv/out, bidirectional attention,
    fc1 -> act -> fc2),
  * ``post_layernorm`` on the class token, then the bias-free
    ``visual_projection`` for the global image embedding.

Parity is oracle-tested against an executed transformers model with
random weights (tests/test_ip_adapter.py) — transformers is a baked-in
dependency, so no checkpoint download is needed for the proof.

The "plus" (Resampler) IP-Adapter variants consume the PENULTIMATE
hidden states instead of the projected embedding: ``apply`` with
``stop_at_layer=n_layers - 1`` (HF ``hidden_states[-2]``, which is the
input of the final layer and carries no post_layernorm).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import Policy, FP32
from ..ops import attention, conv, linear, norm
from ..ops.act import quick_gelu


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    n_layers: int = 32
    n_heads: int = 16
    d_ff: int = 5120
    proj_dim: int = 1024
    #: "gelu" (exact erf — OpenCLIP ViT-H/bigG, the IP-Adapter encoders)
    #: or "quick_gelu" (OpenAI ViT-L).
    hidden_act: str = "gelu"

    @property
    def n_positions(self) -> int:
        return 1 + (self.image_size // self.patch_size) ** 2


def vit_h14() -> CLIPVisionConfig:
    """OpenCLIP ViT-H/14 — the SD-1.5 IP-Adapter image encoder."""
    return CLIPVisionConfig()


def vit_bigg14() -> CLIPVisionConfig:
    """OpenCLIP ViT-bigG/14 — the SDXL IP-Adapter image encoder."""
    return CLIPVisionConfig(width=1664, n_layers=48, n_heads=16, d_ff=8192,
                            proj_dim=1280)


def vit_l14() -> CLIPVisionConfig:
    """OpenAI CLIP ViT-L/14 (quick_gelu)."""
    return CLIPVisionConfig(width=1024, n_layers=24, n_heads=16, d_ff=4096,
                            proj_dim=768, hidden_act="quick_gelu")


def tiny_vision_config() -> CLIPVisionConfig:
    """Scaled-down tower for CPU tests."""
    return CLIPVisionConfig(image_size=16, patch_size=8, width=32, n_layers=2,
                            n_heads=4, d_ff=64, proj_dim=24)


# CLIP preprocessing constants (OpenAI normalization — transformers
# CLIPImageProcessor defaults, which the IP-Adapter encoders keep).
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess(image, cfg: CLIPVisionConfig) -> np.ndarray:
    """PIL image / uint8-ish array -> (1, S, S, 3) float32, CLIP-normalized.

    PIL inputs follow the transformers ``CLIPImageProcessor`` contract
    the published IP-Adapters were used with: bicubic resize of the
    SHORTEST edge to S, then an SxS center crop (a plain SxS resize
    would aspect-distort non-square prompts — review finding).  Arrays
    must already be (S, S, 3) or (B, S, S, 3) in [0, 255] or [0, 1].
    """
    s = cfg.image_size
    if not isinstance(image, np.ndarray) and hasattr(image, "resize"):
        image = image.convert("RGB") if hasattr(image, "convert") else image
        w0, h0 = image.size
        scale = s / min(w0, h0)
        nw, nh = round(w0 * scale), round(h0 * scale)
        image = image.resize((nw, nh), resample=3)  # 3 = BICUBIC
        left, top = (nw - s) // 2, (nh - s) // 2
        arr = np.asarray(image, np.float32)[top:top + s, left:left + s]
    else:
        arr = np.asarray(image, np.float32)
        spatial = arr.shape[1:3] if arr.ndim == 4 else arr.shape[:2]
        if spatial != (s, s):
            raise ValueError(f"ip-adapter image must be {s}x{s} when passed "
                             f"as an array, got {arr.shape}")
    if arr.ndim == 3:
        arr = arr[None]
    arr = arr[..., :3]
    if arr.max() > 1.5:  # [0,255] -> [0,1]
        arr = arr / 255.0
    return (arr - CLIP_MEAN) / CLIP_STD


def init(key, cfg: CLIPVisionConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.n_layers + 3)
    params = {
        "class_embedding": jax.random.normal(keys[0], (cfg.width,), dtype) * 0.02,
        "patch_embedding": conv.init(keys[1], 3, cfg.width, cfg.patch_size,
                                     bias=False, dtype=dtype),
        "position_embedding": jax.random.normal(
            keys[2], (cfg.n_positions, cfg.width), dtype) * 0.02,
        "pre_ln": norm.init(cfg.width, dtype),
        "layers": [],
        "post_ln": norm.init(cfg.width, dtype),
    }
    for i in range(cfg.n_layers):
        ka, k1, k2 = jax.random.split(keys[i + 3], 3)
        params["layers"].append({
            "ln1": norm.init(cfg.width, dtype),
            "attn": attention.init(ka, cfg.n_heads, cfg.width, dtype=dtype),
            "ln2": norm.init(cfg.width, dtype),
            "fc1": linear.init(k1, cfg.width, cfg.d_ff, dtype=dtype),
            "fc2": linear.init(k2, cfg.d_ff, cfg.width, dtype=dtype),
        })
    params["projection"] = jax.random.normal(
        jax.random.fold_in(key, 7), (cfg.width, cfg.proj_dim),
        dtype) * cfg.width**-0.5
    return params


def _act(cfg: CLIPVisionConfig):
    if cfg.hidden_act == "quick_gelu":
        return quick_gelu
    # HF "gelu" is the exact erf form (OpenCLIP nn.GELU), NOT the tanh
    # approximation jax.nn.gelu defaults to.
    return lambda x: jax.nn.gelu(x, approximate=False)


def apply(params, pixels, cfg: CLIPVisionConfig, policy: Policy = FP32,
          *, stop_at_layer: int = None):
    """pixels: (B, S, S, 3) preprocessed -> (B, 1 + n_patches, width).

    ``stop_at_layer`` truncates the stack (no post_layernorm applied) —
    HF ``hidden_states[stop_at_layer]`` semantics; the "plus" adapters
    read ``n_layers - 1`` (the penultimate state).  Full stack output is
    the last hidden state, also un-normed (post_layernorm is applied only
    to the pooled class token, in :func:`apply_projected`).
    """
    # Patch embedding: stride == kernel size (non-overlapping), so the
    # conv is EXACTLY space-to-depth + one matmul.  The equivalent
    # lax.conv (14x14/stride-14, C_in=3) is the one structurally unusual
    # op in this program — 3 input channels pad to a 128-lane MXU tile
    # per tap and the TPU lowering degenerates; the reshape form is a
    # single (B*256, 588)x(588, width) MXU matmul.  HWIO kernel flattens
    # in the same (dy, dx, ch) order as the patch pixels.
    p_sz = cfg.patch_size
    b, s_h, s_w, _ = pixels.shape
    gh, gw = s_h // p_sz, s_w // p_sz
    c = cfg.width
    patches = pixels.reshape(b, gh, p_sz, gw, p_sz, 3) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p_sz * p_sz * 3)
    w_mat = params["patch_embedding"]["kernel"].reshape(p_sz * p_sz * 3, c)
    dt = policy.compute_dtype
    x = jnp.dot(patches.astype(dt), w_mat.astype(dt))
    cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype),
                           (b, 1, c))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None].astype(x.dtype)
    x = norm.layer_norm(params["pre_ln"], x, policy=policy)
    n_run = cfg.n_layers if stop_at_layer is None else stop_at_layer
    act = _act(cfg)
    for lp in params["layers"][:n_run]:
        h = norm.layer_norm(lp["ln1"], x, policy=policy)
        h = attention.apply(lp["attn"], h, n_heads=cfg.n_heads, causal=False,
                            backend="xla", policy=policy)
        x = x + h
        h = norm.layer_norm(lp["ln2"], x, policy=policy)
        h = linear.apply(lp["fc1"], h, policy)
        h = act(h)
        h = linear.apply(lp["fc2"], h, policy)
        x = x + h
    return x


def apply_projected(params, pixels, cfg: CLIPVisionConfig,
                    policy: Policy = FP32):
    """-> (B, proj_dim): post_layernorm(class token) @ visual_projection —
    the global image embedding the standard IP-Adapter consumes."""
    hidden = apply(params, pixels, cfg, policy)
    pooled = norm.layer_norm(params["post_ln"], hidden[:, 0], policy=policy)
    return jnp.dot(pooled, params["projection"].astype(pooled.dtype))


def apply_resampler(p, x, policy: Policy = FP32, dim_head: int = 64):
    """IP-Adapter-plus perceiver ``Resampler`` (tencent IPAdapter
    resampler.py): ``num_queries`` learned latents cross-attend to the
    CLIP vision PENULTIMATE hidden states (not the projected embedding)
    over ``depth`` attention+FF layers.

    x: (B, S, embedding_dim) -> (B, num_queries, output_dim).

    Per layer (PerceiverAttention): LN(x), LN(latents); q from latents,
    k/v from concat([x, latents]) through ONE fused to_kv (all bias-free);
    scale q and k each by dim_head**-0.25 (== the standard 1/sqrt(dh)),
    fp32 softmax; FeedForward = LN -> Linear -> exact GELU -> Linear
    (bias-free).  Then proj_out + norm_out.

    ``dim_head`` is not recorded in the checkpoints; 64 is the published
    constant for every released IP-Adapter-plus (heads = inner_dim / 64,
    derived from the to_q shape — a static trace-time fact).
    """
    b = x.shape[0]
    n_heads = p["layers"][0]["q"]["kernel"].shape[1] // dim_head
    if n_heads < 1:
        raise ValueError(f"resampler inner dim "
                         f"{p['layers'][0]['q']['kernel'].shape[1]} < "
                         f"dim_head {dim_head}")
    lat = jnp.broadcast_to(p["latents"].astype(x.dtype),
                           (b,) + p["latents"].shape)
    x = linear.apply(p["proj_in"], x, policy)
    for lp in p["layers"]:
        xn = norm.layer_norm(lp["ln_x"], x, policy=policy)
        ln = norm.layer_norm(lp["ln_lat"], lat, policy=policy)
        q = linear.apply(lp["q"], ln, policy)
        kv = linear.apply(lp["kv"], jnp.concatenate([xn, ln], axis=1),
                          policy)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(b, t.shape[1], n_heads, -1).transpose(0, 2, 1, 3)

        dh = q.shape[-1] // n_heads
        s = jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k),
                       preferred_element_type=jnp.float32) / dh**0.5
        w = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, heads(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, q.shape[1], -1)
        lat = lat + linear.apply(lp["out"], o, policy)
        f = norm.layer_norm(lp["ff_ln"], lat, policy=policy)
        f = linear.apply(lp["ff1"], f, policy)
        f = jax.nn.gelu(f, approximate=False)
        lat = lat + linear.apply(lp["ff2"], f, policy)
    out = linear.apply(p["proj_out"], lat, policy)
    return norm.layer_norm(p["norm_out"], out, policy=policy)


def project_image_tokens(proj_params, embed, d_context: int,
                         policy: Policy = FP32):
    """IP-Adapter ``ImageProjModel``: global image embedding (B, proj_dim)
    -> (B, num_tokens, d_context) cross-attention tokens — linear to
    num_tokens*d_context, reshape, LayerNorm (tencent IPAdapter /
    diffusers ImageProjection).  ``proj_params`` from
    weights/ip_adapter.convert_ip_adapter (["image_proj"])."""
    y = linear.apply(proj_params["proj"], embed, policy)
    y = y.reshape(embed.shape[0], -1, d_context)
    return norm.layer_norm(proj_params["norm"], y, policy=policy)
