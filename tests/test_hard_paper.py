"""Integration: a realistic multi-feature paper through the full
pipeline — two-column layout, table, footnotes, math glyphs,
references — extract → improve → clean → sections → chunk → store."""

import json

from pdfgen import content_stream_for_lines, make_pdf
from arxiv_rag_tpu.config import load_config
from arxiv_rag_tpu.pipeline.extract import PDFExtractor, extract_tables_bytes
from arxiv_rag_tpu.pipeline.runner import process_paper


def hard_paper_pdf():
    # page 1: title block + abstract (single column) + start of 2-col body
    page1 = [
        (150, 750, "Scaling Dense Retrieval With Fused Kernels"),
        (180, 735, "Ada Lovelace and Charles Babbage"),
        (200, 722, "contact@example.edu"),
        (72, 700, "Abstract"),
    ]
    y = 686
    for i in range(6):
        page1.append((72, y, f"We study retrieval at corpus scale with accelerator kernels, part {i}."))
        y -= 12
    page1.append((72, y - 8, "1 Introduction"))
    y -= 24
    # two columns (realistic ~35-char column width: spans must not
    # cross the mid-page gutter, as in real two-column layouts)
    for i in range(16):
        page1.append((72, y, f"Left col line {i} on retrieval."))
        page1.append((330, y, f"Right col line {i} on indexes."))
        y -= 12
    content1 = content_stream_for_lines(page1, size=10)
    foot1 = content_stream_for_lines(
        [(72, 60, "1 Supported by grant XYZ-123 for accelerator research.")], size=8
    )

    # page 2: method + table + references
    page2 = [(72, 740, "2 Method")]
    y = 724
    for i in range(10):
        page2.append((72, y, f"Method sentence {i} describing the encoder and the top-k merge."))
        y -= 12
    cols = [72, 220, 360, 470]
    for vals in (["System", "Recall", "QPS", "Bytes"],
                 ["baseline", "0.91", "1.2", "6GB"],
                 ["ours", "1.00", "857", "1.5GB"],
                 ["oracle", "1.00", "0.4", "6GB"]):
        for x, v in zip(cols, vals):
            page2.append((x, y, v))
        y -= 13
    y -= 10
    page2.append((72, y, "References"))
    y -= 14
    for i, ref in enumerate(
        ["[1] A. Author. Dense passage retrieval. arXiv:2004.04906, 2020.",
         "[2] B. Writer. Billion scale search. IEEE TPAMI, 2019."]
    ):
        page2.append((72, y - 13 * i, ref))
    content2 = content_stream_for_lines(page2, size=10)
    return make_pdf([content1 + b"\n" + foot1, content2])


def test_hard_paper_extraction_features(tmp_path):
    pdf = hard_paper_pdf()
    res = PDFExtractor().extract_bytes(pdf)
    assert res.success, res.error
    assert res.pdf_type == "text"
    # two-column reading order: all left-column text precedes right column
    p1 = res.pages[0]
    assert p1.index("Left col line 15") < p1.index("Right col line 0")
    # the full-width abstract stays above the column region
    assert p1.index("part 5") < p1.index("Left col line 0")
    # table found geometrically
    tables = extract_tables_bytes(pdf)
    assert any(t["rows"][0][:2] == ["System", "Recall"] for t in tables)
    # footnote present in raw text
    assert "grant XYZ-123" in p1


def test_hard_paper_full_pipeline(tmp_path):
    p = tmp_path / "cs.IR" / "2405" / "2405.55555.pdf"
    p.parent.mkdir(parents=True)
    p.write_bytes(hard_paper_pdf())
    cfg = load_config(overrides={"paths.root": str(tmp_path / "data"),
                                 "text.min_chunk_chars": 80}, environ={})
    res = process_paper(cfg, "2405.55555", p, "cs.IR")
    assert res.ok, res.error
    md = res.paper_meta
    assert md["title"].startswith("Scaling Dense Retrieval")
    assert md["num_sections"] >= 3  # abstract, introduction, method, references
    assert res.num_chunks >= 2
    sections = {r.section for r in res.records}
    assert sections & {"introduction", "method", "methods"}
    pages = {r.page for r in res.records}
    assert pages <= {1, 2} and len(pages) == 2
    # the quality gate accepted a real-ish paper
    assert res.quality > 0.45
