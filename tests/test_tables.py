"""Geometric table detection + adaptive chunking layout analysis."""

from pdfgen import content_stream_for_lines, make_pdf
from arxiv_rag_tpu.pipeline.extract import open_pdf
from arxiv_rag_tpu.pipeline.extract.pdftext import ContentInterpreter, Span
from arxiv_rag_tpu.pipeline.extract.tables import analyze_layout, detect_tables


def spans_for(pdf_bytes):
    doc = open_pdf(pdf_bytes)
    pages = doc.pages()
    out = []
    for page in pages:
        contents = doc.resolve(page.get("Contents"))
        data = contents.data()
        spans = []
        ContentInterpreter(doc, doc.resolve(page.get("Resources")) or {}, spans).run(data)
        out.append(spans)
    return out


def table_pdf():
    lines = [(72, 720, "Results are shown below in the table.")]
    cols = [72, 220, 360, 480]
    header = ["Model", "Recall", "QPS", "Memory"]
    rows = [
        ["baseline", "0.91", "1.2", "6GB"],
        ["ours-bf16", "1.00", "723", "3GB"],
        ["ours-int8", "0.99", "1300", "1.5GB"],
        ["oracle", "1.00", "0.5", "6GB"],
    ]
    y = 680
    for vals in [header] + rows:
        for x, v in zip(cols, vals):
            lines.append((x, y, v))
        y -= 14
    lines.append((72, y - 20, "The discussion continues after the table ends."))
    return make_pdf([content_stream_for_lines(lines)])


def test_detect_table_rows_and_cells():
    spans = spans_for(table_pdf())[0]
    tables = detect_tables(spans)
    assert len(tables) == 1
    t = tables[0]
    assert t.n_cols == 4
    assert len(t.rows) == 5
    assert t.rows[0] == ["Model", "Recall", "QPS", "Memory"]
    assert t.rows[2] == ["ours-bf16", "1.00", "723", "3GB"]


def test_prose_is_not_a_table():
    lines = [(72, 720 - 12 * i, f"This is an ordinary prose sentence number {i}.")
             for i in range(10)]
    spans = spans_for(make_pdf([content_stream_for_lines(lines)]))[0]
    assert detect_tables(spans) == []


def test_layout_profile_table_heavy_picks_fixed():
    spans = spans_for(table_pdf())
    prof = analyze_layout(spans)
    assert prof.table_pages == 1
    assert prof.recommended_strategy == "fixed"


def test_layout_profile_prose_picks_semantic():
    text_lines = []
    y = 750
    for i in range(55):
        text_lines.append((72, y, f"Sentence {i} of a long single column discussion of methods " * 1))
        y -= 13
    spans = spans_for(make_pdf([content_stream_for_lines(text_lines)] * 2))
    prof = analyze_layout(spans)
    assert prof.two_column_pages == 0
    assert prof.recommended_strategy == "semantic"


def test_extract_tables_bytes_end_to_end():
    from arxiv_rag_tpu.pipeline.extract import extract_tables_bytes

    out = extract_tables_bytes(table_pdf())
    assert len(out) == 1
    assert out[0]["page"] == 1 and out[0]["n_cols"] == 4


def test_footnote_detection():
    from pdfgen import make_pdf
    from arxiv_rag_tpu.pipeline.extract.tables import detect_footnotes

    # body at 10pt, footnotes at bottom in 8pt with markers
    body = [(72, 700 - 12 * i, f"Body sentence {i} at regular size.") for i in range(12)]
    content = content_stream_for_lines(body, size=10)
    foot = content_stream_for_lines(
        [(72, 80, "1 This is the first footnote with details."),
         (72, 68, "2 Second footnote referencing the dataset.")],
        size=8,
    )
    pdf = make_pdf([content + b"\n" + foot])
    spans = spans_for(pdf)[0]
    notes = detect_footnotes(spans)
    assert len(notes) == 2
    assert notes[0]["marker"] == "1"
    assert "first footnote" in notes[0]["text"]


def test_no_false_footnotes_in_plain_prose():
    from arxiv_rag_tpu.pipeline.extract.tables import detect_footnotes

    body = [(72, 700 - 12 * i, f"Uniform size line {i} with content.") for i in range(20)]
    spans = spans_for(make_pdf([content_stream_for_lines(body, size=10)]))[0]
    assert detect_footnotes(spans) == []
