"""WordPiece tokenizer (BERT-uncased scheme), dependency-free.

Rebuild of the tokenization used by the reference's vendored
`tokenization_bert.py` (546 LoC) for the `bert-large-uncased` vocab: basic
tokenization (lowercase, accent strip, punctuation split, CJK isolation)
followed by greedy longest-match WordPiece with '##' continuations. The
vocab file is the standard one-token-per-line `vocab.txt`; GenRL looks for
it under the models root (reference loads it through HuggingFace
transformers, which this hermetic image can't download from).
"""

from __future__ import annotations

import unicodedata
from pathlib import Path
from typing import Dict, List

import numpy as np


def load_vocab(path) -> Dict[str, int]:
    vocab = {}
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            token = line.rstrip("\n")
            if token:
                vocab[token] = i
    return vocab


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


def basic_tokenize(text: str, lowercase: bool = True) -> List[str]:
    # clean: drop control chars, normalize whitespace
    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or unicodedata.category(ch) in ("Cc", "Cf"):
            continue
        out.append(" " if ch in ("\t", "\n", "\r") else ch)
    text = "".join(out)
    # isolate CJK
    out = []
    for ch in text:
        if _is_cjk(ord(ch)):
            out.append(f" {ch} ")
        else:
            out.append(ch)
    text = "".join(out)
    tokens = []
    for tok in text.split():
        if lowercase:
            tok = tok.lower()
            tok = "".join(c for c in unicodedata.normalize("NFD", tok)
                          if unicodedata.category(c) != "Mn")
        # split punctuation
        buf = []
        for ch in tok:
            if _is_punctuation(ch):
                if buf:
                    tokens.append("".join(buf))
                    buf = []
                tokens.append(ch)
            else:
                buf.append(ch)
        if buf:
            tokens.append("".join(buf))
    return tokens


def wordpiece(token: str, vocab: Dict[str, int], unk: str = "[UNK]",
              max_chars: int = 100) -> List[str]:
    if len(token) > max_chars:
        return [unk]
    pieces = []
    start = 0
    while start < len(token):
        end = len(token)
        cur = None
        while start < end:
            piece = token[start:end]
            if start > 0:
                piece = "##" + piece
            if piece in vocab:
                cur = piece
                break
            end -= 1
        if cur is None:
            return [unk]
        pieces.append(cur)
        start = end
    return pieces


class BertTokenizer:
    """encode(text) -> (input_ids, attention_mask) numpy arrays, matching the
    reference call `tokenizer(text, padding='max_length', truncation=True,
    max_length=40)` (small_utils.py:296-310)."""

    def __init__(self, vocab_path, lowercase: bool = True):
        self.vocab = load_vocab(vocab_path)
        self.lowercase = lowercase
        self.cls = self.vocab["[CLS]"]
        self.sep = self.vocab["[SEP]"]
        self.pad = self.vocab.get("[PAD]", 0)
        self.unk_token = "[UNK]"

    def tokenize(self, text: str) -> List[str]:
        out = []
        for tok in basic_tokenize(text, self.lowercase):
            out.extend(wordpiece(tok, self.vocab, self.unk_token))
        return out

    def encode(self, text: str, max_length: int = 40):
        ids = [self.vocab.get(t, self.vocab.get(self.unk_token, 0))
               for t in self.tokenize(text)]
        ids = ids[: max_length - 2]
        ids = [self.cls] + ids + [self.sep]
        mask = [1] * len(ids)
        while len(ids) < max_length:
            ids.append(self.pad)
            mask.append(0)
        return np.asarray(ids, np.int32)[None], np.asarray(mask, np.int32)[None]
