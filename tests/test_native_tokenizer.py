"""C++ WordPiece parity vs the pure-Python tokenizer."""

import numpy as np
import pytest

from arxiv_rag_tpu.tokenize.wordpiece import WordPieceTokenizer
from arxiv_rag_tpu.tokenize.native import (
    NativeWordPieceTokenizer,
    build_native,
    is_available,
)

VOCAB = (
    "<pad> <s> </s> [UNK] <mask> the quick brown fox jump ##s over lazy dog "
    "un ##believ ##able caf ##e deep learn ##ing model trans ##form ##er "
    ", . ! ? ( ) [ ] - 1 2 3 a b c d e f g h i j k l m n o p q r s t u v w x y z"
).split()

CASES = [
    "The quick brown fox jumps over the lazy dog",
    "unbelievable!",
    "café",                          # accent folding
    "Deep Learning models, transformers.",
    "word-with-hyphens (and parens) [brackets]",
    "",
    "   spaces\t\tand\nnewlines   ",
    "zzz unknownword123 qqq",        # UNK paths
    "a" * 150,                       # max_chars_per_word overflow -> UNK
    "123 (1) [2]",
]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    if not build_native():
        pytest.skip("native toolchain unavailable")
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    path.write_text("\n".join(VOCAB) + "\n")
    py = WordPieceTokenizer.from_vocab_file(path)
    cc = NativeWordPieceTokenizer(path)
    assert cc.vocab_size == len(VOCAB)
    return py, cc


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_parity_case(pair, idx):
    py, cc = pair
    text = CASES[idx]
    ids_py, mask_py = py.encode_batch([text], max_len=64)
    ids_cc, mask_cc = cc.encode_batch([text], max_len=64)
    np.testing.assert_array_equal(ids_cc, ids_py)
    np.testing.assert_array_equal(mask_cc, mask_py)


def test_separator_whitespace_parity(pair):
    """Zl/Zp (U+2028/U+2029) survive _clean on the Python side and
    str.split() treats them as boundaries — the native path must too
    (omitting them glued words across line separators)."""
    py, cc = pair
    for sep in ("\u2028", "\u2029", "\u2003", "\u3000"):
        text = f"hello{sep}world"
        ids_py, mask_py = py.encode_batch([text], max_len=64)
        ids_cc, mask_cc = cc.encode_batch([text], max_len=64)
        np.testing.assert_array_equal(ids_cc, ids_py, err_msg=hex(ord(sep)))
        np.testing.assert_array_equal(mask_cc, mask_py)


def test_batch_parity_and_padding(pair):
    py, cc = pair
    ids_py, mask_py = py.encode_batch(CASES, max_len=32, pad_to=48)
    ids_cc, mask_cc = cc.encode_batch(CASES, max_len=32, pad_to=48)
    assert ids_cc.shape == (len(CASES), 48)
    np.testing.assert_array_equal(ids_cc, ids_py)
    np.testing.assert_array_equal(mask_cc, mask_py)


def test_truncation_keeps_sep(pair):
    py, cc = pair
    long_text = "the quick brown fox " * 50
    ids_cc, mask_cc = cc.encode_batch([long_text], max_len=16)
    ids_py, _ = py.encode_batch([long_text], max_len=16)
    assert mask_cc[0].sum() == 16
    assert ids_cc[0, 15] == cc_sep(cc)
    np.testing.assert_array_equal(ids_cc, ids_py)


def cc_sep(cc):
    return 2  # </s> index in VOCAB


def _parity_sweep(texts, tmp_path, max_len=24):
    """Build a vocab containing every Python-folded word, so any fold
    divergence in the native tokenizer surfaces as a different id."""
    py_probe = WordPieceTokenizer.toy()
    words = set()
    for t in texts:
        words.update(py_probe.basic_tokenize(t))
    sp = py_probe.specials
    vocab = [sp.pad, sp.cls, sp.sep, sp.unk, sp.mask] + sorted(words)
    path = tmp_path / "sweep_vocab.txt"
    path.write_text("\n".join(vocab) + "\n", encoding="utf-8")
    py = WordPieceTokenizer.from_vocab_file(path)
    cc = NativeWordPieceTokenizer(path)
    ids_py, mask_py = py.encode_batch(texts, max_len=max_len)
    ids_cc, mask_cc = cc.encode_batch(texts, max_len=max_len)
    bad = np.nonzero((ids_cc != ids_py).any(axis=1))[0]
    assert bad.size == 0, (
        f"{bad.size} texts tokenize differently; first: {texts[bad[0]]!r} "
        f"py={ids_py[bad[0]].tolist()} cc={ids_cc[bad[0]].tolist()}"
    )
    np.testing.assert_array_equal(mask_cc, mask_py)


def test_fold_parity_latin_sweep(pair, tmp_path):
    """Every codepoint U+00A0-U+024F through both tokenizers (the ADVICE
    round-1 finding: the old hand-written Latin-Extended-A table was
    misaligned and force-folded non-decomposable letters)."""
    _parity_sweep([chr(cp) for cp in range(0xA0, 0x250)], tmp_path)


def test_fold_parity_greek_cyrillic_extended(pair, tmp_path):
    cps = (
        list(range(0x370, 0x400))        # Greek incl. accented forms
        + list(range(0x400, 0x460))      # Cyrillic incl. ё/й decompositions
        + list(range(0x1E00, 0x1F00))    # Latin Extended Additional
        + list(range(0x1F00, 0x1F70))    # Greek Extended (polytonic)
    )
    _parity_sweep([chr(cp) for cp in cps], tmp_path)


def test_fold_parity_words(pair, tmp_path):
    """Real-author-name shapes: the round-1 bug silently diverged on
    names like Škoda/Łukasz between index-time (native) and query-time
    (Python) tokenization."""
    _parity_sweep(
        [
            "Łukasz Škoda Čech Øre Þór Đorđe Ñandú",
            "Müller-Straße naïve façade œuvre Ævar",
            "ΛΌΓΟΣ λόγος Ψυχή", "Ёлка Йорк",
            "İstanbul ẞtraße ŉdebele",
            "한글 조합 テスト 豈",               # Hangul NFD + CJK compat ideograph
            "mixed ΣΊΣΥΦΟΣ and ASCII-text.",
        ],
        tmp_path,
        max_len=64,
    )


def test_fold_parity_random_bmp(pair, tmp_path):
    """Randomized BMP sweep (fixed seed): whitespace/control/punct
    classification and fold map must agree everywhere, not just in the
    curated ranges."""
    rng = np.random.default_rng(1234)
    cps = rng.integers(0xA0, 0xFFFF, 4000)
    texts = ["".join(chr(c) for c in cps[i : i + 4] if not 0xD800 <= c <= 0xDFFF)
             for i in range(0, len(cps), 4)]
    _parity_sweep(texts, tmp_path, max_len=48)


def test_is_available_consistency():
    assert is_available() == True  # noqa: E712  (build happened in fixture)


def test_embedder_native_path_matches_python(pair, tmp_path):
    """Embedder with native tokenizer == Embedder with Python tokenizer."""
    import jax
    import jax.numpy as jnp

    from arxiv_rag_tpu.embed import Embedder
    from arxiv_rag_tpu.models import ModelConfig, init_params

    py, cc = pair
    cfg = ModelConfig(
        vocab_size=len(VOCAB) + 8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=96,
        pad_token_id=py.pad_id,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    kw = dict(buckets=(16, 32), batch_size=4, compute_dtype=jnp.float32)
    e_py = Embedder(params, cfg, py, **kw)
    e_cc = Embedder(params, cfg, py, native_tokenizer=cc, **kw)
    texts = [c for c in CASES if c.strip()]
    np.testing.assert_allclose(
        e_cc.encode_texts(texts), e_py.encode_texts(texts), atol=1e-6
    )
