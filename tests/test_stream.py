"""Streamed checkpoint loading (weights/stream.py): equality with the eager
loader, per-leaf sharded placement on a mesh, and TP-spec agreement with
parallel/tp.shard_models."""

import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pytorch_stable_diffusion_tpu.core.mesh import make_mesh
from pytorch_stable_diffusion_tpu.core.pytree import flatten
from pytorch_stable_diffusion_tpu.parallel import tp
from pytorch_stable_diffusion_tpu.weights import convert, save, stream


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    # module-scoped tiny checkpoint on disk (safetensors, CompVis layout)
    import jax

    from pytorch_stable_diffusion_tpu.models import clip, unet, vae
    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config

    cfg = tiny_sd_config()
    key = jax.random.PRNGKey(0)
    models = {
        "clip": clip.init(jax.random.fold_in(key, 0), cfg.clip),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    p = tmp_path_factory.mktemp("ckpt") / "tiny.safetensors"
    save.save_safetensors(models, cfg, str(p))
    return str(p), cfg


def test_streamed_equals_eager(ckpt_path):
    path, cfg = ckpt_path
    eager = convert.load_sd_checkpoint(path, cfg)
    streamed = stream.load_sd_checkpoint_streamed(path, cfg)
    fe, fs = flatten(eager), flatten(streamed)
    assert set(fe) == set(fs)
    for k in fe:
        np.testing.assert_array_equal(np.asarray(fe[k]), np.asarray(fs[k]),
                                      err_msg=k)


def test_streamed_replicated_placement(ckpt_path):
    path, cfg = ckpt_path
    mesh = make_mesh()  # all 8 virtual devices on the data axis
    models = stream.load_sd_checkpoint_streamed(path, cfg, mesh=mesh)
    for name, params in models.items():
        for k, leaf in flatten(params).items():
            assert leaf.sharding == NamedSharding(mesh, P()), (name, k)


def test_streamed_tp_placement_matches_shard_models(ckpt_path):
    path, cfg = ckpt_path
    mesh = make_mesh(data=2, model=4)
    streamed = stream.load_sd_checkpoint_streamed(path, cfg, mesh=mesh, tp=True)
    reference = tp.shard_models(convert.load_sd_checkpoint(path, cfg), mesh)
    for name in streamed:
        fs, fr = flatten(streamed[name]), flatten(reference[name])
        assert set(fs) == set(fr)
        for k in fs:
            assert fs[k].sharding == fr[k].sharding, (name, k)
            np.testing.assert_array_equal(np.asarray(fs[k]), np.asarray(fr[k]),
                                          err_msg=k)


def test_streamed_tp_generates(ckpt_path, tiny_tokenizer):
    """End-to-end: TP-streamed weights drive generation on the mesh and match
    the replicated single-run output (the tp.py bit-equality contract)."""
    import pytorch_stable_diffusion_tpu as sdt

    path, cfg = ckpt_path
    mesh = make_mesh(data=2, model=4)
    models = stream.load_sd_checkpoint_streamed(path, cfg, mesh=mesh, tp=True)
    kw = dict(models=models, tokenizer=tiny_tokenizer, seed=3,
              n_inference_steps=2, config=cfg, height=16, width=16)
    with mesh:
        imgs = sdt.generate_images(["a cat", "a dog"], mesh=mesh, **kw)
    plain = stream.load_sd_checkpoint_streamed(path, cfg)
    ref = sdt.generate_images(["a cat", "a dog"],
                              **{**kw, "models": plain})
    np.testing.assert_array_equal(imgs, ref)


def test_streamed_sdxl_tp(tmp_path, tiny_tokenizer):
    """SDXL checkpoints stream too: synthetic CompVis SDXL file -> per-leaf
    TP placement (incl. the clip2 tower and stacked blocks) == eager
    convert, and the placed tree generates."""
    import jax

    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config

    cfg = tiny_sdxl_config()
    from safetensors.numpy import save_file

    sd = convert.synthetic_state_dict(cfg, seed=9)
    path = str(tmp_path / "sdxl_tiny.safetensors")
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in sd.items()}, path)

    mesh = make_mesh(data=4, model=2)
    streamed = stream.load_sd_checkpoint_streamed(path, cfg, mesh=mesh,
                                                  tp=True)
    eager = convert.convert(sd, cfg)
    assert set(streamed) == set(eager) and "clip2" in streamed
    fs, fe = flatten(streamed), flatten(eager)
    for k in fe:
        np.testing.assert_allclose(np.asarray(fs[k]), np.asarray(fe[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
    # clip2 attention kernels carry the Megatron column spec
    qk = [k for k in fs if k.startswith("clip2/") and
          k.endswith("attn/q/kernel")][0]
    assert fs[qk].sharding.spec == tp.COL
    img = tp.generate_images_tp(
        ["a cat", "a dog", "a fox", "a bird"], mesh=mesh, models=streamed,
        tokenizer=tiny_tokenizer, seed=2, n_inference_steps=2, config=cfg,
        height=16, width=16, sampler_name="euler")
    assert img.shape == (4, 16, 16, 3)
