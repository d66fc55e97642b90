"""A1111 prompt editing/alternation: realize semantics + compiled-loop
integration (per-step context switching)."""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu import prompt_schedule as ps

N_STEPS = 2
H = W = 16


def test_realize_editing_fraction():
    # when = 0.5 * 4 = 2: steps 1-2 "cat", steps 3-4 "dog"
    got = [ps.realize("a [cat:dog:0.5] pet", s, 4) for s in (1, 2, 3, 4)]
    assert got == ["a cat pet", "a cat pet", "a dog pet", "a dog pet"]


def test_realize_editing_int_step():
    got = [ps.realize("[cat:dog:1]", s, 3) for s in (1, 2, 3)]
    assert got == ["cat", "dog", "dog"]


def test_realize_add_and_remove():
    # [to:2] adds after step 2; [from::2] removes after step 2
    assert ps.realize("x[ add:2]", 2, 4) == "x"
    assert ps.realize("x[ add:2]", 3, 4) == "x add"
    assert ps.realize("[drop ::2]now", 2, 4) == "drop now"
    assert ps.realize("[drop ::2]now", 3, 4) == "now"


def test_realize_alternation():
    got = [ps.realize("[a|b|c]", s, 6) for s in range(1, 7)]
    assert got == ["a", "b", "c", "a", "b", "c"]


def test_emphasis_brackets_untouched():
    # [word] (attention down-weight) is not schedule syntax
    assert ps.realize("a [word] here", 1, 4) == "a [word] here"
    # (word:1.3) emphasis is untouched too
    assert ps.realize("(cat:1.3)", 1, 4) == "(cat:1.3)"
    # nested schedule inside an emphasis bracket still realizes
    assert ps.realize("[big [cat:dog:1]]", 2, 4) == "[big dog]"


def test_schedule_prompts_dedupe():
    real, idx = ps.schedule_prompts(["[cat:dog:2]"], [""], 4)
    assert len(real) == 2
    assert real[0] == (("cat",), ("",)) and real[1] == (("dog",), ("",))
    np.testing.assert_array_equal(idx, [0, 0, 1, 1])
    # no syntax -> K == 1
    real, idx = ps.schedule_prompts(["plain"], [""], 4)
    assert len(real) == 1 and (idx == 0).all()


def test_pipeline_prompt_editing(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=4,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W)
    mixed = sdt.generate("a [cat:dog:1]", **kw)
    cat = sdt.generate("a cat", **kw)
    dog = sdt.generate("a dog", **kw)
    assert (mixed != cat).any() and (mixed != dog).any()
    assert (mixed == sdt.generate("a [cat:dog:1]", **kw)).all()
    # a schedule that resolves to one conditioning is bitwise the plain run
    never = sdt.generate("a [cat:dog:5]", **kw)  # when=5 > n_steps
    np.testing.assert_array_equal(never, cat)
    alt_same = sdt.generate("a [cat|cat]", **kw)
    np.testing.assert_array_equal(alt_same, cat)
    # alternation with distinct words takes the K=2 path; at n_steps=2 it
    # realizes the SAME schedule as [cat:dog:1] (step1 cat, step2 dog) —
    # the two syntaxes must agree bitwise
    alt = sdt.generate("a [cat|dog]", **kw)
    assert (alt != cat).any() and (alt != dog).any()
    np.testing.assert_array_equal(alt, mixed)


def test_pipeline_editing_in_uncond(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=4,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W)
    a = sdt.generate("a cat", "[photo:dog:1]", **kw)
    b = sdt.generate("a cat", "photo", **kw)
    assert (a != b).any()


def test_pipeline_editing_composes_with_emphasis(tiny_cfg, tiny_models,
                                                 tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=4,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W,
              emphasis=True)
    a = sdt.generate("a ([cat:dog:1]:1.3)", **kw)
    b = sdt.generate("a ([cat:dog:1]:0.7)", **kw)
    assert a.shape == (H, W, 3) and (a != b).any()
