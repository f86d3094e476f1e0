"""In-repo PDF parser + extractor tests over synthesized documents."""

import zlib

import pytest

from pdfgen import content_stream_for_lines, make_pdf, simple_text_pdf
from arxiv_rag_tpu.pipeline.extract import (
    PDFError,
    PDFExtractor,
    improve_pages,
    open_pdf,
    score_text,
    validate_extraction,
)
from arxiv_rag_tpu.pipeline.extract.pdfcore import Lexer, Name, Ref
from arxiv_rag_tpu.pipeline.extract.pdftext import extract_text, parse_tounicode_cmap


# ---------------------------------------------------------------- lexer

def test_lexer_objects():
    lx = Lexer(b"<< /Name /Foo#20Bar /N 42 /F 3.5 /A [1 2 R (str) <414243>] /T true >>")
    d = lx.parse_object()
    assert d["Name"] == "Foo Bar"
    assert d["N"] == 42 and d["F"] == 3.5
    assert d["A"][0] == Ref(1, 2)
    assert d["A"][1] == b"str" and d["A"][2] == b"ABC"
    assert d["T"] is True


def test_lexer_literal_string_escapes():
    lx = Lexer(rb"(a\(b\)c \n \101 nested (p) q)")
    s = lx.parse_object()
    assert s == b"a(b)c \n A nested (p) q"


def test_lexer_name_vs_number():
    lx = Lexer(b"[ /A 1 0 R 2 3 /B ]")
    arr = lx.parse_object()
    assert arr == [Name("A"), Ref(1, 0), 2, 3, Name("B")]


# ------------------------------------------------------------- document

def test_roundtrip_classic_xref():
    pdf = simple_text_pdf(["Hello world from page one.", "And page two text."])
    doc = open_pdf(pdf)
    pages = extract_text(doc)
    assert len(pages) == 2
    assert "Hello world from page one." in pages[0]
    assert "And page two text." in pages[1]


def test_roundtrip_xref_stream_and_objstm():
    pdf = simple_text_pdf(["Object stream flavored document."], xref_stream=True)
    doc = open_pdf(pdf)
    pages = extract_text(doc)
    assert "Object stream flavored document." in pages[0]


def test_uncompressed_content():
    pdf = simple_text_pdf(["Plain uncompressed stream."], compress=False)
    assert "Plain uncompressed stream." in extract_text(open_pdf(pdf))[0]


def test_broken_startxref_recovers_by_scan():
    pdf = simple_text_pdf(["Recovered text."])
    broken = pdf.replace(b"startxref", b"startxrEF")  # destroys the pointer
    doc = open_pdf(broken)
    assert "Recovered text." in extract_text(doc)[0]


def test_not_a_pdf_raises():
    with pytest.raises(PDFError):
        open_pdf(b"this is not a pdf at all" * 100)


# ------------------------------------------------------------ text state

def test_tj_array_inserts_spaces():
    # TJ with big negative kern → word gap even without space glyphs
    content = b"BT /F1 10 Tf 72 700 Td [(Hello) -600 (world)] TJ ET"
    pdf = make_pdf([content])
    text = extract_text(open_pdf(pdf))[0]
    assert "Hello" in text and "world" in text
    assert "Helloworld" not in text.replace(" ", "") or " " in text


def test_multiline_td_layout():
    content = content_stream_for_lines(
        [(72, 720, "First line."), (72, 708, "Second line."), (72, 696, "Third line.")]
    )
    text = extract_text(open_pdf(make_pdf([content])))[0]
    lines = [l for l in text.splitlines() if l.strip()]
    assert lines == ["First line.", "Second line.", "Third line."]


def test_two_column_reading_order():
    left = [(72, 700 - 12 * i, f"left{i} column text body") for i in range(10)]
    right = [(330, 700 - 12 * i, f"right{i} column text body") for i in range(10)]
    # interleave emission order; layout must unscramble
    lines = [v for pair in zip(left, right) for v in pair]
    text = extract_text(open_pdf(make_pdf([content_stream_for_lines(lines)])))[0]
    assert text.index("left9") < text.index("right0")


def test_font_differences_decoding():
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/FirstChar 65 /LastChar 67 /Widths [500 500 500] "
        b"/Encoding << /Differences [65 /alpha /beta /summation] >> >>"
    )
    content = b"BT /F1 10 Tf 72 700 Td (ABC) Tj ET"
    text = extract_text(open_pdf(make_pdf([content], font_dict=font)))[0]
    assert "αβ∑" in text.replace(" ", "")


def test_tounicode_cmap_parsing():
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"beginbfchar\n<0041> <0061>\n<0042> <03B1>\nendbfchar\n"
        b"beginbfrange\n<0050> <0052> <0070>\n<0060> <0061> [<2211> <222B>]\nendbfrange\n"
        b"end"
    )
    m = parse_tounicode_cmap(cmap)
    assert m[0x41] == "a" and m[0x42] == "α"
    assert m[0x50] == "p" and m[0x52] == "r"
    assert m[0x60] == "∑" and m[0x61] == "∫"


# ---------------------------------------------------------- quality/improve

def test_quality_scoring_discriminates():
    good = (
        "We present a method for learning representations from data. "
        "The results in this section show that the model improves on all benchmarks. "
    ) * 40
    garbage = "�� xk9 qz" * 200
    assert score_text(good, 1).score > 0.6
    assert score_text(garbage, 1).score < 0.35
    assert score_text("", 1).score == 0.0


def test_validate_extraction_flags_empty_pages():
    pages = ["real text " * 100, "", "", ""]
    v = validate_extraction(pages)
    assert not v.valid
    assert any("empty" in i for i in v.issues)


def test_improve_removes_headers_and_watermarks():
    body = "This is body text that should stay intact here."
    pages = [
        f"Proceedings of the 41st Conference\n{body}\nPage {i}\narXiv:2401.12345v2 [cs.LG] 15 Jan 2024"
        for i in range(1, 6)
    ]
    res = improve_pages(pages)
    joined = "\n".join(res.pages)
    assert body in joined
    assert "Proceedings" not in joined
    assert "arXiv:2401" not in joined
    assert "Page 3" not in joined
    assert res.removed_lines >= 10


# ------------------------------------------------------------- extractor

def test_extractor_end_to_end(tmp_path):
    text = (
        "Deep learning models have achieved remarkable results on many tasks. "
        "In this paper we present a new approach to the problem of retrieval. "
    ) * 6
    pdf = simple_text_pdf([text, text])
    p = tmp_path / "paper.pdf"
    p.write_bytes(pdf)
    ex = PDFExtractor(cache_dir=tmp_path / "cache")
    res = ex.extract(p)
    assert res.success
    assert res.pdf_type == "text"
    assert res.quality_score > 0.4
    assert "retrieval" in res.text
    assert len(res.pages) == 2
    # cache round-trip
    res2 = ex.extract(p)
    assert res2.text == res.text


def test_extractor_scanned_detection():
    # pages with no text operators at all
    pdf = make_pdf([b"q 1 0 0 1 0 0 cm Q", b"q Q"])
    res = PDFExtractor().extract_bytes(pdf)
    assert not res.success
    assert res.pdf_type == "scanned"
    assert "OCR" in (res.error or "")


def test_extractor_rejects_garbage():
    res = PDFExtractor().extract_bytes(b"not a pdf")
    assert not res.success
    assert res.error and "parse" in res.error


def test_third_party_writer_matplotlib():
    """Cross-validation against an independent PDF producer: matplotlib's
    PDF backend (embedded Type-1 fonts, compressed streams, its own
    xref layout) — not our test generator."""
    mpl = pytest.importorskip("matplotlib")
    mpl.use("pdf")
    import io

    import matplotlib.pyplot as plt

    buf = io.BytesIO()
    fig = plt.figure(figsize=(8.5, 11))
    fig.text(0.1, 0.9, "Matplotlib Generated Document Title", size=14)
    fig.text(0.1, 0.8, "First body paragraph written by an external producer.", size=10)
    fig.text(0.1, 0.75, "Second line with digits 0123456789 and (punct).", size=10)
    fig.savefig(buf, format="pdf")
    plt.close(fig)

    pages = extract_text(open_pdf(buf.getvalue()))
    assert len(pages) == 1
    assert "Matplotlib Generated Document Title" in pages[0]
    assert "First body paragraph written by an external producer." in pages[0]
    assert "0123456789" in pages[0]


def test_per_page_strategy_merge_beats_single_strategies():
    """Reference ``pdf_extractor.py:839-910`` mixes strategies within a
    document; the round-3 repo competed whole documents only, so one
    malformed page dragged everything toward OCR-rescue. The merged
    document must beat either single strategy on the mixed fixture."""
    from pdfgen import mixed_quality_pdf
    from arxiv_rag_tpu.pipeline.extract import pdfcore
    from arxiv_rag_tpu.pipeline.extract.extractor import (
        PDFExtractor, _strategy_native, _strategy_simple,
    )
    from arxiv_rag_tpu.pipeline.extract.quality import score_text

    buf = mixed_quality_pdf()
    doc = pdfcore.open_pdf(buf)
    nat = score_text("\n\n".join(_strategy_native(doc)), num_pages=2).score
    sim = score_text("\n\n".join(_strategy_simple(doc)), num_pages=2).score
    ex = PDFExtractor(accept_score=0.95, use_cache=False)
    res = ex.extract_bytes(buf)
    assert res.success
    assert res.method_used.startswith("mixed:")
    assert res.quality_score > max(nat, sim) + 0.05
    assert len(res.pages) == 2
    # each page kept its best strategy's shape
    assert "zorp quix" in res.pages[0]       # native reconstruction
    assert "the quick brown" in res.pages[1]  # simple spacing


def test_per_page_merge_skips_when_one_strategy_dominates():
    """A document whose every page prefers the same strategy must keep
    the plain whole-document winner (no 'mixed:' method)."""
    from pdfgen import simple_text_pdf
    from arxiv_rag_tpu.pipeline.extract.extractor import PDFExtractor

    text = ("The quick brown fox jumps over the lazy dog. " * 40).strip()
    buf = simple_text_pdf([text, text])
    res = PDFExtractor(accept_score=0.99, use_cache=False).extract_bytes(buf)
    assert res.success
    assert not res.method_used.startswith("mixed:")


# ---------------------------------------------------------------------------
# RTL / bidi (reference: pdf_extractor.py:4986-5220)
# ---------------------------------------------------------------------------


def test_reorder_rtl_reverses_visual_hebrew():
    from arxiv_rag_tpu.pipeline.extract.pdftext import reorder_rtl

    # visual (x-sorted, left->right on the page) Hebrew; logical is reversed
    assert reorder_rtl("םולש") == "שלום"


def test_reorder_rtl_mixed_line_only_touches_rtl_run():
    from arxiv_rag_tpu.pipeline.extract.pdftext import reorder_rtl

    line = "see גבא for details"
    assert reorder_rtl(line) == "see אבג for details"


def test_reorder_rtl_keeps_neutrals_inside_run_and_mirrors_brackets():
    from arxiv_rag_tpu.pipeline.extract.pdftext import reorder_rtl

    # space between two RTL chars belongs to the run; bracket mirrors
    line = "x (ב א) y"
    out = reorder_rtl(line)
    assert out == "x (א ב) y"


def test_reorder_rtl_ltr_identity_and_marking():
    from arxiv_rag_tpu.pipeline.extract.pdftext import reorder_rtl

    plain = "A plain english line, nothing to do."
    assert reorder_rtl(plain) is plain
    marked = reorder_rtl("با", mark=True)
    assert marked == "‫اب‬"


def test_rtl_spans_emit_logical_order():
    from arxiv_rag_tpu.pipeline.extract.pdftext import Span, spans_to_text

    # Arabic word placed glyph-by-glyph in visual order on one baseline:
    # logical text is "كتاب" (kitab); visually the
    # first logical glyph sits rightmost.
    logical = "كتاب"
    spans = [
        Span(text=ch, x=200.0 - 10 * i, y=700.0, end_x=210.0 - 10 * i, size=10.0)
        for i, ch in enumerate(logical)
    ]
    spans.append(Span(text="intro:", x=72.0, y=700.0, end_x=110.0, size=10.0))
    out = spans_to_text(spans)
    assert logical in out
    assert "intro:" in out


def test_quality_broken_word_gate():
    """Enhanced-scorer coherence signal (reference pdf_extractor.py:7966):
    kern-gap word breaks must drag the score down monotonically."""
    from arxiv_rag_tpu.pipeline.extract.quality import score_text
    import random

    rng = random.Random(0)
    prose = (
        "We propose a novel method for dense retrieval over large corpora. "
        "The model encodes each chunk with a transformer and performs "
        "maximum inner product search on the accelerator hardware. "
    ) * 40

    def kern_break(t, frac):
        out = []
        for w in t.split():
            if len(w) > 4 and rng.random() < frac:
                i = rng.choice((1, 2))
                out.append(w[:i])
                out.append(w[i:])
            else:
                out.append(w)
        return " ".join(out)

    clean = score_text(prose, 4)
    light = score_text(kern_break(prose, 0.1), 4)
    heavy = score_text(kern_break(prose, 0.4), 4)
    assert clean.broken_ratio < 0.01
    assert clean.score > light.score > heavy.score
    assert heavy.score < clean.score - 0.3
    assert "warning:broken_words" in heavy.issues
    # legit short content words (fox/cat/dog) must NOT register
    animals = (
        "the quick brown fox jumps over the lazy dog and the small black "
        "cat sat on the warm stone wall near the old red barn today "
    ) * 20
    assert score_text(animals, 1).broken_ratio == 0.0


def test_quality_structure_hints_break_ties():
    """Enhanced-scorer structure dimension (reference :8023-8060): the
    same prose with academic section structure scores at least as high,
    and the report exposes the hit count."""
    from arxiv_rag_tpu.pipeline.extract.quality import score_text

    prose = (
        "We propose a novel method for dense retrieval over large corpora. "
        "The model encodes each chunk with a transformer and performs "
        "maximum inner product search on the accelerator hardware. "
    ) * 30
    structured = (
        "Abstract\nWe study retrieval at scale.\n1. Introduction\n"
        + prose
        + "\n2. Method\n"
        + prose
        + "\n3. Results and Discussion\n"
        + prose
        + "\nReferences\n[1] Smith et al. 2021."
    )
    r_plain = score_text(prose, 8)
    r_struct = score_text(structured, 8)
    assert r_struct.structure_hits > r_plain.structure_hits
    assert r_struct.score >= r_plain.score
