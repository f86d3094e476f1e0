"""OCR hook: scanned-PDF detection, OCR-first, OCR-rescue, and the
fail-loudly contract end to end through the pipeline runner.

Reference behavior being matched: OCR-first for scanned PDFs and OCR
rescue of low-quality extractions (``pdf_extractor.py:318-332,399-414``);
this image has no tesseract, so the tests use the toy machine-glyph
decoder over synthesized scanned PDFs (tests/pdfgen.py)."""

import json

import pytest

from pdfgen import glyph_bitmap, scanned_pdf, simple_text_pdf
from arxiv_rag_tpu.pipeline.extract.extractor import PDFExtractor
from arxiv_rag_tpu.pipeline.extract.ocr import load_ocr_plugin, toy_bitmap_ocr

SCAN_TEXT = (
    "This is a scanned page of a scientific paper about retrieval.\n"
    "The quick brown fox jumps over the lazy dog near the river bank.\n"
    "Dense retrieval systems embed chunks of documents for search tasks."
)


def test_toy_bitmap_roundtrip():
    data, w, h = glyph_bitmap(SCAN_TEXT.split("\n"))
    out = toy_bitmap_ocr(data, width=w, height=h, bits_per_component=1)
    assert out == SCAN_TEXT


def test_scanned_without_hook_fails_loudly():
    buf = scanned_pdf([SCAN_TEXT, SCAN_TEXT])
    res = PDFExtractor().extract_bytes(buf)
    assert res.pdf_type == "scanned"
    assert not res.success
    assert "no OCR backend" in (res.error or "")
    assert res.text == ""  # never silent empties presented as success


def test_scanned_with_hook_ocr_first():
    buf = scanned_pdf([SCAN_TEXT, SCAN_TEXT.replace("scanned", "second")])
    ex = PDFExtractor(ocr=toy_bitmap_ocr, ocr_accept_score=0.1)
    res = ex.extract_bytes(buf)
    assert res.success, res.error
    assert res.method_used == "ocr"
    assert res.pdf_type == "scanned"
    assert "quick brown fox" in res.text
    assert len(res.pages) == 2
    assert "second" in res.pages[1]


def test_ocr_candidate_competes_when_below_accept():
    """Below ocr_accept_score the OCR result still competes with the
    text strategies instead of being discarded."""
    buf = scanned_pdf([SCAN_TEXT])
    ex = PDFExtractor(ocr=toy_bitmap_ocr, ocr_accept_score=2.0)  # never auto-accept
    res = ex.extract_bytes(buf)
    assert res.success, res.error
    assert res.method_used == "ocr"  # text strategies yield nothing on a scan


def test_ocr_hook_failure_is_contained():
    def broken(data, **kw):
        raise RuntimeError("backend crashed")

    buf = scanned_pdf([SCAN_TEXT])
    res = PDFExtractor(ocr=broken).extract_bytes(buf)
    assert not res.success
    assert res.pdf_type == "scanned"


def test_plugin_loader():
    fn = load_ocr_plugin("arxiv_rag_tpu.pipeline.extract.ocr:toy_bitmap_ocr")
    assert fn is toy_bitmap_ocr
    assert load_ocr_plugin("") is None
    with pytest.raises(ValueError):
        load_ocr_plugin("no_colon_spec")
    with pytest.raises(ModuleNotFoundError):
        load_ocr_plugin("definitely.not.a.module:fn")


def test_text_pdf_does_not_invoke_ocr():
    calls = []

    def spy(data, **kw):
        calls.append(1)
        return ""

    buf = simple_text_pdf(["A perfectly normal text page with plenty of words. " * 20])
    res = PDFExtractor(ocr=spy).extract_bytes(buf)
    assert res.success
    assert res.method_used != "ocr"
    assert not calls  # good text never pays for OCR


# ---- end-to-end contract through the runner ------------------------------


def test_chunk_pipeline_scanned_lands_in_error_ledger(tmp_path):
    """A scanned paper (no OCR configured) must land in the progress DB
    as failed with the distinct scanned error — never a silent empty."""
    from arxiv_rag_tpu.config import load_config
    from arxiv_rag_tpu.pipeline.runner import PipelineRunner

    pdf = tmp_path / "pdfs" / "cs.LG" / "2401" / "2401.55555.pdf"
    pdf.parent.mkdir(parents=True)
    pdf.write_bytes(scanned_pdf([SCAN_TEXT]))
    cfg = load_config(overrides={"paths.root": str(tmp_path / "data")}, environ={})
    runner = PipelineRunner(cfg, corpus_dir=tmp_path / "corpus")
    stats = runner.run([("2401.55555", str(pdf), "cs.LG")], max_workers=0)
    assert stats["failed"] == 1 and stats["ok"] == 0
    rows = runner.progress.failures(runner.STAGE)
    assert rows, "failure must be recorded in the progress DB"
    assert any("scanned" in (err or "") for _, err in rows)


def test_chunk_pipeline_scanned_with_plugin_succeeds(tmp_path):
    """Same paper with the toy OCR plugin configured chunks normally."""
    from arxiv_rag_tpu.config import load_config
    from arxiv_rag_tpu.pipeline.runner import PipelineRunner

    pdf = tmp_path / "pdfs" / "cs.LG" / "2401" / "2401.66666.pdf"
    pdf.parent.mkdir(parents=True)
    long_text = "\n".join(
        f"Line {i} of the scanned paper describes dense retrieval on accelerators."
        for i in range(40)
    )
    pdf.write_bytes(scanned_pdf([long_text]))
    cfg = load_config(
        overrides={
            "paths.root": str(tmp_path / "data"),
            "extraction.ocr_enabled": True,
            "extraction.ocr_plugin": "arxiv_rag_tpu.pipeline.extract.ocr:toy_bitmap_ocr",
            "extraction.ocr_accept_quality": 0.1,
        },
        environ={},
    )
    runner = PipelineRunner(cfg, corpus_dir=tmp_path / "corpus")
    stats = runner.run([("2401.66666", str(pdf), "cs.LG")], max_workers=0)
    assert stats["ok"] == 1, stats
    assert stats["chunks"] >= 1


# ---- figure OCR: images embedded in born-digital pages --------------------

PAGE_TEXT = (
    "Dense retrieval with learned embeddings has become standard practice. "
    "We report results across multiple benchmark collections in this work.\n"
    "Figure 1 shows the throughput scaling across batch sizes and devices."
)
FIG_TEXT = "throughput qps 9000 batch 512 devices 8"


def test_figure_ocr_merges_labeled_text():
    from pdfgen import text_pdf_with_figures

    buf = text_pdf_with_figures([(PAGE_TEXT, FIG_TEXT), (PAGE_TEXT.replace("Figure 1", "no caption here"), None)])
    res = PDFExtractor(ocr=toy_bitmap_ocr).extract_bytes(buf)
    assert res.success, res.error
    assert res.pdf_type == "text"
    assert res.method_used.endswith("+figure_ocr")
    # recovered text lands on the figure's page, labeled with its caption
    assert FIG_TEXT in res.pages[0]
    assert "[Figure 1]" in res.pages[0]
    assert FIG_TEXT not in res.pages[1]
    meta = res.metadata["figure_ocr"]
    assert meta["images"] == 1 and meta["recovered"] == 1
    assert meta["figures"][0]["page"] == 1
    assert meta["figures"][0]["caption"] == "Figure 1"


def test_figure_ocr_without_caption_labels_by_page():
    from pdfgen import text_pdf_with_figures

    text = (
        "A page about systems with an unreferenced diagram embedded below. "
        "The prose runs long enough that type detection sees a text page "
        "rather than a scanned one, which needs over a hundred characters."
    )
    buf = text_pdf_with_figures([(text, FIG_TEXT)])
    res = PDFExtractor(ocr=toy_bitmap_ocr).extract_bytes(buf)
    assert res.success
    assert "[figure (page 1)]" in res.pages[0]
    assert res.metadata["figure_ocr"]["figures"][0]["caption"] is None


def test_figure_ocr_disabled_or_hookless_leaves_text_untouched():
    from pdfgen import text_pdf_with_figures

    buf = text_pdf_with_figures([(PAGE_TEXT, FIG_TEXT)])
    res_no_hook = PDFExtractor().extract_bytes(buf)
    assert res_no_hook.success and FIG_TEXT not in res_no_hook.text
    res_off = PDFExtractor(ocr=toy_bitmap_ocr, figure_ocr=False).extract_bytes(buf)
    assert res_off.success and FIG_TEXT not in res_off.text
    assert "figure_ocr" not in res_off.metadata


def test_figure_ocr_quality_score_not_depressed():
    """Figure text is additive: merging noisy plot labels must not lower
    the extraction's quality score below the text strategies' own."""
    from pdfgen import text_pdf_with_figures

    clean = PDFExtractor().extract_bytes(text_pdf_with_figures([(PAGE_TEXT, None)]))
    merged = PDFExtractor(ocr=toy_bitmap_ocr).extract_bytes(
        text_pdf_with_figures([(PAGE_TEXT, "x9 #q$ 17 zz !!")])
    )
    assert merged.quality_score >= clean.quality_score - 1e-9


def test_chunk_pipeline_figure_text_reaches_corpus(tmp_path):
    """End to end through the chunk pipeline: figure text recovered from
    an image on a text page is searchable corpus text."""
    from pdfgen import text_pdf_with_figures
    from arxiv_rag_tpu.config import load_config
    from arxiv_rag_tpu.pipeline.runner import PipelineRunner
    from arxiv_rag_tpu.store import CorpusReader

    body = "\n".join(
        f"Line {i}: retrieval systems embed chunks for approximate search."
        for i in range(30)
    ) + "\nFigure 1 compares quantized and full-precision index variants."
    pdf = tmp_path / "pdfs" / "cs.IR" / "2402" / "2402.77777.pdf"
    pdf.parent.mkdir(parents=True)
    pdf.write_bytes(text_pdf_with_figures([(body, "int8 index reaches 1263 qps")]))
    cfg = load_config(
        overrides={
            "paths.root": str(tmp_path / "data"),
            "extraction.ocr_enabled": True,
            "extraction.ocr_plugin": "arxiv_rag_tpu.pipeline.extract.ocr:toy_bitmap_ocr",
        },
        environ={},
    )
    runner = PipelineRunner(cfg, corpus_dir=tmp_path / "corpus")
    stats = runner.run([("2402.77777", str(pdf), "cs.IR")], max_workers=0)
    assert stats["ok"] == 1, stats
    texts = CorpusReader(tmp_path / "corpus").texts()
    assert any("1263 qps" in t for t in texts), "figure text must reach the corpus"
