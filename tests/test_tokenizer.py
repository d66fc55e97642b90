"""CLIP BPE tokenizer vs the transformers slow tokenizer (same vocab files)."""

import json
import os

import pytest

from pytorch_stable_diffusion_tpu.weights.tokenizer import (
    CLIPTokenizer, bytes_to_unicode, make_test_tokenizer)

WORDS = ["a", "cat", "dog", "photo", "of", "the", "painting"]


@pytest.fixture(scope="module")
def tok():
    return make_test_tokenizer(WORDS, max_len=16)


@pytest.fixture(scope="module")
def hf_tok(tok, tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    d = tmp_path_factory.mktemp("tok")
    with open(d / "vocab.json", "w") as f:
        json.dump(tok.encoder, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get):
            f.write(f"{a} {b}\n")
    return transformers.CLIPTokenizer(str(d / "vocab.json"), str(d / "merges.txt"))


@pytest.mark.parametrize("text", [
    "a photo of a cat",
    "The Painting",            # case folding
    "a  cat\n of\tdog",        # whitespace cleanup
    "cat&dog!!",               # punctuation split
    "catdog",                  # unseen word -> partial merges
    "",                        # empty prompt (the uncond default)
    "caté",                    # multi-byte utf-8
])
def test_matches_transformers(tok, hf_tok, text):
    ours = tok.encode(text)
    theirs = hf_tok(text, padding="max_length", max_length=16,
                    truncation=True).input_ids
    assert ours == theirs


def test_frame_and_padding(tok):
    ids = tok.encode("a cat")
    assert ids[0] == tok.sot and len(ids) == 16
    assert ids[-1] == tok.eot  # padded with end-of-text (pipeline contract)


def test_truncation(tok):
    ids = tok.encode(" ".join(["painting"] * 100))
    assert len(ids) == 16 and ids[0] == tok.sot and ids[-1] == tok.eot


def test_decode_roundtrip(tok):
    text = "a photo of the cat"
    assert tok.decode(tok.encode(text)) == text


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_from_files_roundtrip(tok, tmp_path):
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(tok.encoder, f)
    with open(tmp_path / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get):
            f.write(f"{a} {b}\n")
    tok2 = CLIPTokenizer.from_files(str(tmp_path / "vocab.json"),
                                    str(tmp_path / "merges.txt"), max_len=16)
    assert tok2.encode("a photo of a cat") == tok.encode("a photo of a cat")


def test_fuzz_against_transformers(tok, hf_tok):
    """Random ASCII strings (fixed seed) must tokenize identically."""
    import random

    rng = random.Random(1234)
    alphabet = "abcdefghijklmnopqrstuvwxyz AB!?',.-0123456789&"
    for _ in range(25):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        ours = tok.encode(text)
        theirs = hf_tok(text, padding="max_length", max_length=16,
                        truncation=True).input_ids
        assert ours == theirs, repr(text)
