"""Deterministic full-size SD-1.5 synthetic weights, shared between the
golden recording script (record_reference_goldens.py) and the comparison
tests (test_reference_goldens.py).

Params are derived exactly like convert.synthetic_state_dict (PRNGKey(0),
fold_in 0..3 per model) but with jitted inits — eager init of 860M params on
the 1-core host would compile hundreds of individual ops.  jax's threefry
PRNG is counter-based and platform-independent, so the recording run and any
later test run regenerate bit-identical weights; the npz stores fingerprints
to verify that.
"""

import jax
import numpy as np

from pytorch_stable_diffusion_tpu.models import clip as clip_mod
from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.models import vae as vae_mod

GOLDEN_SEED = 0

# fixed input geometry for the goldens: full-size weights, modest spatial
# (the models are fully convolutional; 128^2 keeps reference CPU forwards
# and our CPU compiles tractable on the 1-core host)
IMG_HW = 128
LAT_HW = 16
TIMESTEP = 981


def init_fullsize_params(cfg):
    """All four SD-1.5 models, jit-initialized, deterministic."""
    key = jax.random.PRNGKey(GOLDEN_SEED)

    def j(fn, subcfg, i):
        return jax.jit(lambda k: fn(k, subcfg))(jax.random.fold_in(key, i))

    return {
        "clip": j(clip_mod.init, cfg.clip, 0),
        "encoder": j(vae_mod.init_encoder, cfg.vae, 1),
        "decoder": j(vae_mod.init_decoder, cfg.vae, 2),
        "diffusion": j(unet_mod.init, cfg.unet, 3),
    }


def golden_inputs(cfg):
    """Fixed test vectors (numpy, NCHW for the reference side)."""
    rng = np.random.RandomState(1234)
    vocab = cfg.clip.vocab_size
    tokens = rng.randint(1, vocab - 2, size=(2, cfg.clip.max_len))
    tokens[:, 0] = vocab - 2       # sot (49406)
    tokens[:, -1] = vocab - 1      # eot (49407)
    return {
        "tokens": tokens.astype(np.int64),
        "latent": rng.randn(1, 4, LAT_HW, LAT_HW).astype(np.float32),
        "image": (rng.rand(1, 3, IMG_HW, IMG_HW).astype(np.float32) * 2 - 1),
        "enc_noise": rng.randn(1, 4, LAT_HW, LAT_HW).astype(np.float32),
        "timestep": TIMESTEP,
    }


def fingerprint(state_dict, keys=None):
    """Small deterministic digest of a CompVis state dict (drift detector)."""
    if keys is None:
        keys = sorted(state_dict)[::max(1, len(state_dict) // 12)][:12]
    out = {}
    for k in keys:
        v = np.asarray(state_dict[k], np.float64)
        out[k] = np.array([v.mean(), v.std(), float(v.ravel()[0]),
                           float(v.ravel()[-1])])
    return out
