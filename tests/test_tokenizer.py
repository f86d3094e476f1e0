"""WordPiece tokenizer parity vs HF MPNetTokenizer on a synthetic
vocab — exercises lowercasing, accents, punctuation, CJK isolation,
unknown words, continuations and special-token layout. HF outputs are
committed goldens (tests/_golden.py) so routine runs skip the slow
transformers import."""

import numpy as np
import pytest

from arxiv_rag_tpu.tokenize import WordPieceTokenizer

from _golden import get_json

VOCAB = (
    ["<s>", "<pad>", "</s>", "[UNK]", "<mask>"]
    + ["the", "quick", "brown", "fox", "jump", "##s", "##ed", "over", "lazy",
       "dog", "hello", "world", "un", "##believ", "##able", "token", "##izer",
       "2", "##0", "##2", "##4", ",", ".", "!", "?", "-", "(", ")", "$",
       "cafe", "naive", "a", "##b", "##c", "中", "国"]
)

TRICKY = [
    "The quick brown fox jumps over the lazy dog.",
    "Hello,   world!  unbelievable tokenizer",
    "Café naïve — accents",          # accents stripped, em-dash punct
    "hello中国world",                 # CJK isolation
    "abc (hello) $2024?",
    "supercalifragilistic",          # unknown word
    "a" * 150,                        # > max_chars_per_word → UNK
    "",
    "   \t\n  ",
    "\x00weird�bytes",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return p


@pytest.fixture(scope="module")
def ours(vocab_file):
    return WordPieceTokenizer.from_vocab_file(vocab_file)


def _generate_golden():
    """HF MPNetTokenizer outputs (slow import; only for regeneration)."""
    import tempfile

    import transformers

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("\n".join(VOCAB) + "\n")
        path = f.name
    tok = transformers.MPNetTokenizer(path)
    return {
        "vocab": VOCAB,
        "cases": [
            {
                "text": t,
                "tokens": tok.tokenize(t),
                "ids": tok(t, add_special_tokens=True)["input_ids"],
            }
            for t in TRICKY
        ],
    }


@pytest.fixture(scope="module")
def golden():
    data = get_json("mpnet_tokenizer", _generate_golden)
    assert data["vocab"] == VOCAB, "vocab changed — delete golden and regenerate"
    return {c["text"]: c for c in data["cases"]}


def test_special_ids(ours):
    assert ours.cls_id == 0
    assert ours.pad_id == 1
    assert ours.sep_id == 2
    assert ours.unk_id == 3


@pytest.mark.parametrize("text", TRICKY)
def test_tokenize_parity(ours, golden, text):
    assert ours.tokenize(text) == golden[text]["tokens"]


@pytest.mark.parametrize("text", TRICKY)
def test_encode_parity(ours, golden, text):
    assert ours.encode(text) == golden[text]["ids"]


def test_encode_batch_shapes(ours):
    ids, mask = ours.encode_batch(["hello world", "the fox"], max_len=16, pad_to=16)
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    assert ids.dtype == np.int32
    assert ids[0, 0] == ours.cls_id
    assert (ids[mask == 0] == ours.pad_id).all()
    # row 1 is shorter → more padding
    assert mask[1].sum() < mask[0].sum() + 3


def test_truncation_keeps_sep(ours):
    long = "the quick brown fox " * 50
    enc = ours.encode(long, max_len=12)
    assert len(enc) == 12
    assert enc[0] == ours.cls_id and enc[-1] == ours.sep_id


def test_decode_roundtrip(ours):
    enc = ours.encode("the quick fox jumps")
    assert ours.decode(enc) == "the quick fox jumps"
