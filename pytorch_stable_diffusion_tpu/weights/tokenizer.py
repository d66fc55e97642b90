"""CLIP byte-level BPE tokenizer (self-contained, no network, no torch).

The reference loads ``transformers.CLIPTokenizer`` from local
``data/vocab.json`` + ``data/merges.txt`` (``sd/inference_demo.ipynb`` cell 2,
``data/links.txt:4-6``) and calls ``batch_encode_plus(padding="max_length",
max_length=77)`` (``sd/pipeline.py:109-115``).  This module reimplements that
tokenizer from the algorithm: byte→unicode remap, greedy lowest-rank BPE
merges with the ``</w>`` word-end marker, CLIP's token regex, whitespace
cleanup + lowercasing, then ``<|startoftext|> ... <|endoftext|>`` framing
padded to max_len with the end-of-text id.

Parity oracle in tests: transformers' slow CLIPTokenizer over the same vocab
files (tests/test_tokenizer.py).
"""

from __future__ import annotations

import functools
import gzip
import html
import json
from typing import Dict, List, Sequence, Tuple

try:
    import regex as re  # supports \p{L}/\p{N} classes like the original

    _PAT = re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        re.IGNORECASE,
    )
except ImportError:  # pragma: no cover - regex is in the base image
    # No silent stdlib-re substitute: \w+ differs from CLIP's letters-only
    # [\p{L}]+ / single-digit [\p{N}] on digit runs, underscores, and mixed
    # alphanumerics — it would quietly produce different token ids and thus
    # different images.  Fail at first use instead.
    import re

    _PAT = None

_WS = None  # lazily-compiled whitespace pattern


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP reversible byte→printable-unicode map."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


#: A1111 emphasis grammar tokens: escapes, brackets, ``:<number>)``
#: closers, and plain runs.  Works with both stdlib re and the regex pkg.
_EMPH_PAT = None


def parse_prompt_attention(text: str) -> List[List[object]]:
    """Parse the community (A1111) prompt-emphasis syntax.

    Returns ``[[fragment, weight], ...]`` with adjacent equal-weight
    fragments merged.  ``(x)`` multiplies by 1.1, ``[x]`` by 1/1.1,
    ``(x:w)`` sets an explicit multiplier for the bracketed span, nesting
    multiplies, and ``\\(`` ``\\)`` ``\\[`` ``\\]`` escape literals.
    Unbalanced openers apply to the rest of the prompt."""
    global _EMPH_PAT
    if _EMPH_PAT is None:
        import re as _stdre

        _EMPH_PAT = _stdre.compile(
            r"\\[()\[\]\\]|\(|\[|:\s*([+-]?[\d.]+)\s*\)|\)|\]|[^\\()\[\]:]+|:")
    out: List[List[object]] = []
    round_open: List[int] = []
    square_open: List[int] = []

    def scale_from(start: int, mult: float) -> None:
        for item in out[start:]:
            item[1] *= mult

    for m in _EMPH_PAT.finditer(text):
        tok, weight = m.group(0), m.group(1)
        if tok.startswith("\\"):
            out.append([tok[1:], 1.0])
        elif tok == "(":
            round_open.append(len(out))
        elif tok == "[":
            square_open.append(len(out))
        elif weight is not None and round_open:
            scale_from(round_open.pop(), float(weight))
        elif tok == ")" and round_open:
            scale_from(round_open.pop(), 1.1)
        elif tok == "]" and square_open:
            scale_from(square_open.pop(), 1.0 / 1.1)
        else:
            out.append([tok, 1.0])
    for start in round_open:
        scale_from(start, 1.1)
    for start in square_open:
        scale_from(start, 1.0 / 1.1)
    if not out:
        return [["", 1.0]]
    merged: List[List[object]] = [out[0]]
    for frag, w in out[1:]:
        if w == merged[-1][1]:
            merged[-1][0] += frag
        else:
            merged.append([frag, w])
    return merged


def _whitespace_clean(text: str) -> str:
    global _WS
    if _WS is None:
        import re as _stdre

        _WS = _stdre.compile(r"\s+")
    return _WS.sub(" ", text).strip()


def _get_pairs(word: Tuple[str, ...]):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class CLIPTokenizer:
    """Byte-level BPE with ``</w>`` end-of-word, CLIP flavor."""

    def __init__(self, vocab: Dict[str, int], merges: Sequence[Tuple[str, str]],
                 max_len: int = 77):
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.max_len = max_len
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self._cache = {"<|startoftext|>": "<|startoftext|>",
                       "<|endoftext|>": "<|endoftext|>"}
        #: textual-inversion placeholders: lowercased trigger -> token ids
        #: (ids may exceed the base vocab; the embedding table is extended
        #: by weights/textual_inversion.py)
        self.placeholders: Dict[str, List[int]] = {}
        self._ph_pat = None

    # ------------------------------------------------------------- loading
    @classmethod
    def from_files(cls, vocab_path: str, merges_path: str, max_len: int = 77):
        with open(vocab_path, encoding="utf-8") as f:
            vocab = json.load(f)
        opener = gzip.open if str(merges_path).endswith(".gz") else open
        with opener(merges_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = []
        for ln in lines[1:]:  # first line is the version header
            ln = ln.strip()
            if ln:
                merges.append(tuple(ln.split()))
        return cls(vocab, merges, max_len)

    # ----------------------------------------------------------------- BPE
    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    # -------------------------------------------------- placeholder tokens
    def add_placeholder(self, token: str, ids: Sequence[int]) -> None:
        """Register a textual-inversion trigger word: occurrences of
        ``token`` (case-insensitive, matched before BPE) expand to ``ids``."""
        self.placeholders[token.lower()] = list(ids)
        self._ph_pat = None

    def clone(self) -> "CLIPTokenizer":
        """Shallow copy with an independent placeholder table (vocab/merges
        shared read-only)."""
        import copy

        out = copy.copy(self)
        out.placeholders = dict(self.placeholders)
        out._ph_pat = None
        return out

    def _placeholder_split(self, text: str):
        if not self.placeholders:
            return [text]
        if self._ph_pat is None:
            import re as _stdre

            alts = sorted(self.placeholders, key=len, reverse=True)
            self._ph_pat = _stdre.compile(
                "(" + "|".join(_stdre.escape(a) for a in alts) + ")")
        return self._ph_pat.split(text)

    # ------------------------------------------------------------- encoding
    def tokenize(self, text: str) -> List[int]:
        """Raw BPE ids, no framing/padding."""
        if _PAT is None:  # pragma: no cover - regex is in the base image
            raise ImportError(
                "the 'regex' package is required for CLIP-faithful "
                "tokenization (stdlib re cannot express \\p{L}/\\p{N}; a "
                "\\w-based substitute would silently produce different "
                "token ids)")
        text = _whitespace_clean(html.unescape(html.unescape(text))).lower()
        ids: List[int] = []
        for part in self._placeholder_split(text):
            if part in self.placeholders:
                ids.extend(self.placeholders[part])
                continue
            for tok in _PAT.findall(part):
                tok_b = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
                for piece in self._bpe(tok_b).split(" "):
                    ids.append(self.encoder[piece])
        return ids

    def encode(self, text: str) -> List[int]:
        """sot + bpe + eot, truncated and padded with eot to max_len —
        matches transformers CLIPTokenizer(padding="max_length")."""
        ids = self.tokenize(text)
        ids = ids[: self.max_len - 2]
        full = [self.sot] + ids + [self.eot]
        full.extend([self.eot] * (self.max_len - len(full)))
        return full

    def batch_encode(self, texts: Sequence[str]) -> List[List[int]]:
        return [self.encode(t) for t in texts]

    @staticmethod
    def _break_segments(text: str) -> List[str]:
        """A1111's ``BREAK`` keyword (uppercase, standalone): force a
        window boundary.  Split BEFORE tokenization — tokenize()
        lowercases, so the keyword must be caught at the string level."""
        import re

        if "BREAK" not in text:
            return [text]
        return re.split(r"\bBREAK\b", text)

    def encode_windows(self, text: str) -> List[List[int]]:
        """Long-prompt encoding: split the raw BPE ids into
        ``max_len - 2``-token windows, each framed sot/eot and padded —
        the de-facto community scheme (the window hiddens are concatenated
        into one long cross-attention context).  Always >= 1 window.
        The A1111 ``BREAK`` keyword ends the current window early (the
        remainder is eot-padded) and starts a new one."""
        cap = self.max_len - 2
        chunks: List[List[int]] = []
        for seg in self._break_segments(text):
            ids = self.tokenize(seg)
            chunks.extend([ids[i:i + cap]
                           for i in range(0, len(ids), cap)] or [[]])
        out = []
        for ch in chunks:
            full = [self.sot] + ch + [self.eot]
            full.extend([self.eot] * (self.max_len - len(full)))
            out.append(full)
        return out

    # ---------------------------------------------------- emphasis syntax
    def tokenize_weighted(self, text: str) -> Tuple[List[int], List[float]]:
        """A1111 emphasis syntax -> (bpe ids, per-token weights).

        ``(x)`` ×1.1, ``[x]`` ÷1.1, ``(x:1.5)`` explicit, nesting
        multiplies, ``\\(`` escapes a literal bracket.  Fragments are
        tokenized independently (the community convention — BPE merges
        never span an emphasis boundary)."""
        ids: List[int] = []
        ws: List[float] = []
        for frag, w in parse_prompt_attention(text):
            t = self.tokenize(frag)
            ids.extend(t)
            ws.extend([w] * len(t))
        return ids, ws

    def encode_weighted(self, text: str) -> Tuple[List[int], List[float]]:
        """Framed/padded like :meth:`encode`, plus aligned weights
        (sot/eot/pad carry weight 1.0)."""
        ids, ws = self.tokenize_weighted(text)
        ids, ws = ids[: self.max_len - 2], ws[: self.max_len - 2]
        full = [self.sot] + ids + [self.eot]
        wfull = [1.0] + ws + [1.0]
        full.extend([self.eot] * (self.max_len - len(full)))
        wfull.extend([1.0] * (self.max_len - len(wfull)))
        return full, wfull

    def encode_windows_weighted(
            self, text: str) -> Tuple[List[List[int]], List[List[float]]]:
        """Long-prompt + emphasis: :meth:`encode_windows` with aligned
        per-window weight rows (honors the ``BREAK`` keyword)."""
        cap = self.max_len - 2
        wins, wws = [], []
        for seg in self._break_segments(text):
            ids, ws = self.tokenize_weighted(seg)
            spans = [(i, min(i + cap, len(ids)))
                     for i in range(0, len(ids), cap)] or [(0, 0)]
            for a, b in spans:
                full = [self.sot] + ids[a:b] + [self.eot]
                wfull = [1.0] + ws[a:b] + [1.0]
                full.extend([self.eot] * (self.max_len - len(full)))
                wfull.extend([1.0] * (self.max_len - len(wfull)))
                wins.append(full)
                wws.append(wfull)
        return wins, wws

    # ------------------------------------------------------------- decoding
    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[i] for i in ids
                       if i not in (self.sot, self.eot))
        data = bytearray(self.byte_decoder[ch] for ch in text)
        return data.decode("utf-8", errors="replace").replace("</w>", " ").strip()


def make_test_tokenizer(words: Sequence[str], max_len: int = 16) -> CLIPTokenizer:
    """Tiny tokenizer for tests: char-level vocab over ``words`` plus full
    merges for each word, so each listed word encodes to one id."""
    btu = bytes_to_unicode()
    vocab: Dict[str, int] = {}

    def add(tok):
        if tok not in vocab:
            vocab[tok] = len(vocab)

    for ch in btu.values():
        add(ch)
        add(ch + "</w>")
    merges: List[Tuple[str, str]] = []
    seen = set()
    for w in words:
        chars = [btu[b] for b in w.encode("utf-8")]
        chars[-1] += "</w>"
        while len(chars) > 1:  # merge left-to-right
            pair = (chars[0], chars[1])
            if pair not in seen:
                seen.add(pair)
                merges.append(pair)
                add(pair[0] + pair[1])
            chars[:2] = [chars[0] + chars[1]]
    add("<|startoftext|>")
    add("<|endoftext|>")
    return CLIPTokenizer(vocab, merges, max_len)
