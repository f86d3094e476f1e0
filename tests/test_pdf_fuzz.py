"""Robustness: the PDF reader must never crash with non-PDFError
exceptions on malformed input — only parse errors or empty results."""

import random
import zlib

import pytest

from pdfgen import simple_text_pdf
from arxiv_rag_tpu.pipeline.extract import PDFError, PDFExtractor, open_pdf
from arxiv_rag_tpu.pipeline.extract.pdftext import extract_text


def _try(buf: bytes) -> None:
    """open+extract must either work or raise PDFError — nothing else."""
    try:
        doc = open_pdf(buf)
        extract_text(doc)
    except PDFError:
        pass


def test_truncations_never_crash():
    pdf = simple_text_pdf(["Some stable text content for truncation fuzzing."])
    for frac in (0.1, 0.3, 0.5, 0.7, 0.9, 0.99):
        _try(pdf[: int(len(pdf) * frac)])


def test_random_byte_corruption_never_crashes():
    pdf = bytearray(simple_text_pdf(["Corruption fuzzing body text."] * 2))
    rng = random.Random(42)
    for trial in range(30):
        mutated = bytearray(pdf)
        for _ in range(rng.randint(1, 20)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        _try(bytes(mutated))


def test_garbage_inputs():
    rng = random.Random(7)
    _try(b"")
    _try(b"%PDF-1.5\n")
    _try(b"%PDF-1.5\n" + bytes(rng.randrange(256) for _ in range(5000)))
    _try(b"%PDF-" + b"\xff" * 100)


def test_hostile_structures():
    # self-referencing object; endless Kids loop; bogus stream length
    evil = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [2 0 R 3 0 R] /Count 2 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 999999 >>\nstream\nBT (hi) Tj ET\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R /Size 5 >>\n"
    )
    _try(evil)
    # deep reference chain
    chain = b"%PDF-1.4\n" + b"".join(
        f"{i} 0 obj\n{i + 1} 0 R\nendobj\n".encode() for i in range(1, 60)
    ) + b"60 0 obj\n<< /Type /Catalog >>\nendobj\ntrailer\n<< /Root 1 0 R >>\n"
    _try(chain)


def test_zlib_bomb_is_bounded():
    # a huge-but-legal compressed stream shouldn't hang (zlib handles it);
    # just assert we finish and produce something
    big = zlib.compress(b"BT /F1 10 Tf " + b"(x) Tj " * 50_000 + b"ET")
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(big)).encode() + b" /Filter /FlateDecode >>\n"
        b"stream\n" + big + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R /Size 6 >>\n"
    )
    doc = open_pdf(pdf)
    pages = extract_text(doc)
    assert len(pages) == 1
    assert "x" in pages[0]


def test_extractor_bytes_never_crashes_on_fuzz():
    rng = random.Random(3)
    ex = PDFExtractor()
    pdf = bytearray(simple_text_pdf(["Extractor level fuzz body."]))
    for _ in range(10):
        mutated = bytearray(pdf)
        for _ in range(rng.randint(5, 60)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        res = ex.extract_bytes(bytes(mutated))  # must return, never raise
        assert res.success in (True, False)
