"""GPT-2-style byte-level BPE tokenizer.

Behavioral counterpart of /root/reference/xdiffusion/tokenizer/bpe.py
(which ships gzipped encoder.json/vocab.bpe assets). This is a fresh
implementation of the standard byte-BPE algorithm; it loads the standard
GPT-2 vocab files when present under $XDIFFUSION_DATA_DIR/tokenizer
(encoder.json[.gz], vocab.bpe[.gz]) and otherwise falls back to a pure
byte-level vocabulary (ids 0-255 + specials) so offline text conditioning
still produces deterministic, trainable token ids with the same
`tokenize(texts, context_length)` API and vocabulary-size contract.
"""

from __future__ import annotations

import gzip
import json
import os
import re
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import numpy as np

# GPT-2 vocab size; the fallback encoder reserves the same id space so
# configs with token_vocabulary_size: 50257 work with either vocabulary.
GPT2_VOCAB_SIZE = 50257

_WORD_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte -> printable-unicode map (standard byte-BPE trick)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class Encoder:
    """Byte-BPE encoder; with no merge ranks it degrades to byte-level."""

    def __init__(
        self,
        encoder: Dict[str, int],
        bpe_merges: List[Tuple[str, str]],
        end_token: Optional[int] = None,
    ):
        self.encoder = encoder
        self.decoder = {v: k for k, v in encoder.items()}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.bpe_ranks = dict(zip(bpe_merges, range(len(bpe_merges))))
        self._cache: Dict[str, str] = {}
        # Padding/end token: the reference pads with 0s and uses a fixed
        # context length; we keep 0 as pad and expose vocab size.
        self.end_token = end_token if end_token is not None else 0

    @property
    def vocab_size(self) -> int:
        return max(GPT2_VOCAB_SIZE, len(self.encoder))

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token)
        if not self.bpe_ranks:
            out = " ".join(word)
            self._cache[token] = out
            return out
        pairs = _get_pairs(word)
        while pairs:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
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

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for token in _WORD_RE.findall(text):
            token_bytes = "".join(
                self.byte_encoder[b] for b in token.encode("utf-8")
            )
            for sub in self._bpe(token_bytes).split(" "):
                if sub in self.encoder:
                    ids.append(self.encoder[sub])
        return ids

    def decode(self, ids: List[int]) -> str:
        text = "".join(self.decoder.get(i, "") for i in ids)
        data = bytearray(self.byte_decoder.get(c, 0) for c in text)
        return data.decode("utf-8", errors="replace")

    def tokenize(
        self,
        texts: List[str],
        context_length: int = 128,
        truncate_text: bool = True,
    ) -> np.ndarray:
        """(B, context_length) int32, zero-padded (reference bpe.py:55-175
        API contract)."""
        out = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = self.encode(text)
            if len(ids) > context_length:
                if not truncate_text:
                    raise ValueError(
                        f"prompt too long ({len(ids)} > {context_length})"
                    )
                ids = ids[:context_length]
            out[i, : len(ids)] = ids
        return out


def _byte_level_encoder() -> Encoder:
    """Fallback vocabulary: one token per mapped byte (no merges)."""
    b2u = bytes_to_unicode()
    encoder = {ch: b + 1 for b, ch in b2u.items()}  # 0 reserved for pad
    return Encoder(encoder=encoder, bpe_merges=[], end_token=0)


def _find_asset(base: str, name: str) -> Optional[str]:
    for suffix in ("", ".gz"):
        p = os.path.join(base, name + suffix)
        if os.path.exists(p):
            return p
    return None


def get_encoder() -> Encoder:
    """GPT-2 vocab from disk if available; byte-level fallback otherwise."""
    from xdiffusion_tpu.datasets.mnist import data_root

    base = os.path.join(data_root(), "tokenizer")
    enc_path = _find_asset(base, "encoder.json")
    bpe_path = _find_asset(base, "vocab.bpe")
    if enc_path and bpe_path:
        opener = lambda p: gzip.open(p, "rt") if p.endswith(".gz") else open(p)
        with opener(enc_path) as f:
            encoder = json.load(f)
        with opener(bpe_path) as f:
            lines = f.read().split("\n")
        merges = [
            tuple(line.split()) for line in lines[1:] if len(line.split()) == 2
        ]
        return Encoder(encoder=encoder, bpe_merges=merges)
    return _byte_level_encoder()
