"""Tokenizer tests: synthetic merges table + (if available) real-vocab checks."""

import numpy as np
import pytest

from neighborretr_tpu.data.tokenizer import (ClipTokenizer, bytes_to_unicode,
                                             default_vocab_path)

TINY_MERGES = [
    ("h", "e"), ("l", "l"), ("he", "ll"), ("o</w>", ""),  # filler
    ("hell", "o</w>"), ("w", "o"), ("r", "l"), ("wo", "rl"),
    ("worl", "d</w>"),
]


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_tiny_bpe_merging():
    tok = ClipTokenizer(merges=[("h", "e"), ("l", "l"), ("he", "ll"),
                                ("hell", "o</w>")])
    assert tok.tokenize("hello") == ["hello</w>"]
    # unknown word falls back to characters (+ end-of-word marker)
    assert tok.tokenize("xyz") == ["x", "y", "z</w>"]


def test_special_tokens_and_vocab_layout():
    merges = [("h", "e")]
    tok = ClipTokenizer(merges=merges)
    assert tok.vocab_size == 512 + len(merges) + 2
    assert tok.eot_id == tok.vocab_size - 1
    assert tok.sot_id == tok.vocab_size - 2


def test_cleaning_lowercase_and_whitespace():
    tok = ClipTokenizer(merges=[("h", "e")])
    assert tok.tokenize("  A   CAT ") == tok.tokenize("a cat")


def test_contraction_splitting():
    tok = ClipTokenizer(merges=[])
    toks = tok.tokenize("don't")
    # regex splits into "don" + "'t" pieces, each ending with </w>
    assert toks == ["d", "o", "n</w>", "'", "t</w>"]


REAL_VOCAB = default_vocab_path()


@pytest.mark.skipif(REAL_VOCAB is None, reason="real BPE vocab not available")
def test_real_vocab_size_and_known_encodings():
    tok = ClipTokenizer(REAL_VOCAB)
    assert tok.vocab_size == 49408
    assert tok.sot_id == 49406
    assert tok.eot_id == 49407
    # canonical sanity: common words are single tokens
    assert len(tok.tokenize("hello")) == 1
    assert len(tok.tokenize("a")) == 1
    ids = tok.encode("a man is playing guitar")
    assert all(0 <= i < 49408 for i in ids)
    round_trip = tok.decode(ids).strip()
    assert round_trip == "a man is playing guitar"


# ---------------------------------------------------------------------------
# Golden parity against the real 16e6 BPE vocabulary
# ---------------------------------------------------------------------------

import os as _os

_REAL_VOCAB = _os.environ.get(
    "NEIGHBORRETR_BPE_VOCAB",
    "/root/reference/NeighborRetr/models/bpe_simple_vocab_16e6.txt.gz")

# token ids produced by the reference SimpleTokenizer (verified bit-exact
# against tokenization_clip.py on 2026-08-16); regenerate by running both
# tokenizers over the same strings with the real vocab file
_GOLDEN = {
    "a man is playing a guitar on stage":
        [320, 786, 533, 1629, 320, 5084, 525, 2170],
    "The QUICK brown fox; jumps over 12 lazy dogs!":
        [518, 3712, 2866, 3240, 282, 18911, 962, 272, 273, 10753, 3255, 256],
    "cartoon characters are talking":
        [7651, 6564, 631, 2578],
    "someone's cooking pasta, it looks delicious...":
        [2100, 568, 6283, 10441, 267, 585, 1606, 3959, 678],
    "a person is doing a demonstration of how to use a 3d printer":
        [320, 2533, 533, 1960, 320, 16722, 539, 829, 531, 1483, 320, 274,
         323, 14521],
}


@pytest.mark.skipif(not _os.path.exists(_REAL_VOCAB),
                    reason="full BPE vocab not available")
def test_golden_ids_real_vocab(monkeypatch):
    monkeypatch.setenv("NEIGHBORRETR_BPE_VOCAB", _REAL_VOCAB)
    from neighborretr_tpu.data.tokenizer import ClipTokenizer
    tok = ClipTokenizer()
    for text, expected in _GOLDEN.items():
        got = tok.convert_tokens_to_ids(tok.tokenize(text))
        assert list(got) == expected, text
