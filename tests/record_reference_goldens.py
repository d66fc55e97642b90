"""Record golden outputs from the EXECUTED reference at full SD-1.5 size.

Run manually (CPU, ~10-20 min on the 1-core host):

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tests/record_reference_goldens.py

What it does:
  1. jit-initializes our full-size SD-1.5 models with synthetic weights
     (tests/fullsize_utils.py, deterministic),
  2. exports them to a CompVis-format .ckpt via weights/convert.deconvert,
  3. loads that ckpt through the REFERENCE's own loader
     (`model_loader.preload_models_from_standard_weights`,
     /root/reference/sd/model_loader.py:9) — which runs the reference's
     1055-line converter and `load_state_dict(strict=True)`, so a key/shape
     mismatch in our deconvert fails loudly right here,
  4. runs reference CLIP / Diffusion / VAE encoder / VAE decoder forwards on
     fixed inputs and writes everything to tests/goldens/reference_fullsize.npz.

tests/test_reference_goldens.py then compares our framework (with
reference_quirks=True) against these recorded outputs.
"""

import os
import sys

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


def main():
    assert reference_modules.available, "/root/reference not present"
    out_path = os.path.join(_HERE, "goldens", "reference_fullsize.npz")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    cfg = sd15_config()
    print("[1/5] init full-size params (jitted) ...", flush=True)
    params = fullsize_utils.init_fullsize_params(cfg)

    print("[2/5] deconvert -> CompVis state dict ...", flush=True)
    sd = convert.deconvert(params, cfg)
    fp = fullsize_utils.fingerprint(sd)
    del params

    ckpt_path = "/tmp/sdt_golden_synthetic.ckpt"
    print(f"[3/5] torch.save {len(sd)} keys -> {ckpt_path} ...", flush=True)
    torch.save({"state_dict": {k: torch.as_tensor(v) for k, v in sd.items()}},
               ckpt_path)
    del sd

    print("[4/5] reference preload_models_from_standard_weights ...", flush=True)
    import model_loader  # reference module (reference_modules put it on path)

    models = model_loader.preload_models_from_standard_weights(ckpt_path, "cpu")

    inp = fullsize_utils.golden_inputs(cfg)

    # torch.tensor COPIES are load-bearing: the reference decoder's first op
    # is an IN-PLACE `x /= 0.18215` on its input (decoder.py forward), so a
    # torch.as_tensor view would silently corrupt the numpy inputs we save
    # (this bit round 2: the recorded in_latent came out pre-divided and
    # every latent-consuming golden comparison failed at ~13 dB).
    def t(name):
        return torch.tensor(inp[name])

    results = {}
    with torch.no_grad():
        print("[5/5] reference forwards ...", flush=True)
        clip_out = models["clip"](t("tokens"))
        results["clip_out"] = clip_out.numpy().copy()
        print("  clip done", flush=True)

        import pipeline as ref_pipeline  # reference helper (pipeline.py:310)

        temb = ref_pipeline.get_time_embedding(inp["timestep"])
        results["time_embedding"] = temb.numpy().copy()
        diff_out = models["diffusion"](t("latent"), clip_out[:1], temb)
        results["diffusion_out"] = diff_out.numpy().copy()
        print("  diffusion done", flush=True)

        enc_out = models["encoder"](t("image"), t("enc_noise"))
        results["encoder_out"] = enc_out.numpy().copy()
        print("  encoder done", flush=True)

        dec_out = models["decoder"](t("latent"))
        results["decoder_out"] = dec_out.numpy().copy()
        print("  decoder done", flush=True)

    payload = {f"in_{k}": np.asarray(v) for k, v in inp.items()}
    payload.update({f"out_{k}": v for k, v in results.items()})
    payload.update({f"fp_{k}": v for k, v in fp.items()})
    np.savez_compressed(out_path, **payload)
    print(f"wrote {out_path} "
          f"({os.path.getsize(out_path) / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
