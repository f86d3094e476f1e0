"""Tiny PDF writer used to synthesize test documents for the in-repo
PDF parser. Supports classic xref tables or cross-reference streams +
object streams, FlateDecode content, multiple pages/columns, and
/Differences-encoded fonts — enough to exercise every parser path."""

from __future__ import annotations

import zlib


def _esc(s: str) -> bytes:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)").encode("latin-1", "replace")


def content_stream_for_lines(
    lines: list[tuple[float, float, str]], font: str = "F1", size: float = 10.0
) -> bytes:
    """Build a content stream placing each (x, y, text) with Td."""
    out = [b"BT", f"/{font} {size} Tf".encode()]
    prev = (0.0, 0.0)
    for x, y, text in lines:
        dx, dy = x - prev[0], y - prev[1]
        out.append(f"{dx:.2f} {dy:.2f} Td".encode())
        out.append(b"(" + _esc(text) + b") Tj")
        prev = (x, y)
    out.append(b"ET")
    return b"\n".join(out)


def make_pdf(
    page_contents: list[bytes],
    compress: bool = True,
    xref_stream: bool = False,
    font_dict: bytes | None = None,
) -> bytes:
    """Assemble a PDF whose i-th page has the i-th content stream."""
    n_pages = len(page_contents)
    font = font_dict or b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objects: dict[int, bytes] = {}
    # 1 catalog, 2 pages root, 3 font; pages at 4..; contents after
    kids = " ".join(f"{4 + i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>".encode()
    objects[3] = font
    first_content = 4 + n_pages
    for i in range(n_pages):
        objects[4 + i] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> /Contents {first_content + i} 0 R >>"
        ).encode()
    stream_objs: dict[int, tuple[bytes, bytes]] = {}
    for i, data in enumerate(page_contents):
        if compress:
            payload = zlib.compress(data)
            sdict = f"<< /Length {len(payload)} /Filter /FlateDecode >>".encode()
        else:
            payload = data
            sdict = f"<< /Length {len(payload)} >>".encode()
        stream_objs[first_content + i] = (sdict, payload)

    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(buf)
        buf.extend(f"{num} 0 obj\n".encode())
        buf.extend(body)
        buf.extend(b"\nendobj\n")

    if not xref_stream:
        for num in sorted(objects):
            emit(num, objects[num])
        for num in sorted(stream_objs):
            sdict, payload = stream_objs[num]
            emit(num, sdict + b"\nstream\n" + payload + b"\nendstream")
        max_num = max(list(objects) + list(stream_objs))
        xref_pos = len(buf)
        buf.extend(f"xref\n0 {max_num + 1}\n".encode())
        buf.extend(b"0000000000 65535 f \n")
        for num in range(1, max_num + 1):
            buf.extend(f"{offsets[num]:010d} 00000 n \n".encode())
        buf.extend(
            f"trailer\n<< /Size {max_num + 1} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF".encode()
        )
        return bytes(buf)

    # xref-stream flavor: non-stream objects go into an object stream
    objstm_num = max(list(objects) + list(stream_objs)) + 1
    xrefstm_num = objstm_num + 1
    header_parts = []
    body_parts = []
    off = 0
    for num in sorted(objects):
        body = objects[num] + b"\n"
        header_parts.append(f"{num} {off}".encode())
        body_parts.append(body)
        off += len(body)
    header = b" ".join(header_parts) + b"\n"
    objstm_payload = header + b"".join(body_parts)
    compressed = zlib.compress(objstm_payload)
    objstm_dict = (
        f"<< /Type /ObjStm /N {len(objects)} /First {len(header)} "
        f"/Length {len(compressed)} /Filter /FlateDecode >>"
    ).encode()
    for num in sorted(stream_objs):
        sdict, payload = stream_objs[num]
        emit(num, sdict + b"\nstream\n" + payload + b"\nendstream")
    emit(objstm_num, objstm_dict + b"\nstream\n" + compressed + b"\nendstream")

    # build the xref stream: type-2 entries for objects in the objstm
    max_num = xrefstm_num
    rows = bytearray()

    def row(t: int, f2: int, f3: int) -> bytes:
        return bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")

    rows += row(0, 0, 65535)
    for num in range(1, max_num + 1):
        if num in objects:
            rows += row(2, objstm_num, sorted(objects).index(num))
        elif num in offsets:
            rows += row(1, offsets[num], 0)
        elif num == xrefstm_num:
            rows += row(1, 0, 0)  # patched below
        else:
            rows += row(0, 0, 0)
    xref_pos = len(buf)
    # patch xrefstm's own offset
    idx = xrefstm_num * 7
    rows[idx : idx + 7] = row(1, xref_pos, 0)
    xref_payload = zlib.compress(bytes(rows))
    xref_dict = (
        f"<< /Type /XRef /Size {max_num + 1} /W [1 4 2] /Root 1 0 R "
        f"/Length {len(xref_payload)} /Filter /FlateDecode >>"
    ).encode()
    emit(xrefstm_num, xref_dict + b"\nstream\n" + xref_payload + b"\nendstream")
    buf.extend(f"startxref\n{xref_pos}\n%%EOF".encode())
    return bytes(buf)


def simple_text_pdf(pages_text: list[str], **kw) -> bytes:
    """One text block per page, wrapped at ~80 chars, 10pt."""
    contents = []
    for text in pages_text:
        lines = []
        y = 750.0
        for raw_line in text.split("\n"):
            while len(raw_line) > 90:
                lines.append((72.0, y, raw_line[:90]))
                raw_line = raw_line[90:]
                y -= 12
            lines.append((72.0, y, raw_line))
            y -= 12
        contents.append(content_stream_for_lines(lines))
    return make_pdf(contents, **kw)


def glyph_bitmap(lines: list[str]) -> tuple[bytes, int, int]:
    """Machine-glyph 1-bit bitmap: 8x8 cells, all eight rows of a cell
    carry the char's code point as a bit pattern (decoded by
    arxiv_rag_tpu.pipeline.extract.ocr.toy_bitmap_ocr)."""
    width_chars = max((len(ln) for ln in lines), default=1)
    width_chars = max(width_chars, 1)
    rows = bytearray()
    for ln in lines:
        padded = ln.ljust(width_chars)
        row = bytes(ord(c) & 0xFF for c in padded)
        for _ in range(8):
            rows += row
    return bytes(rows), width_chars * 8, len(lines) * 8


def scanned_pdf(pages_text: list[str]) -> bytes:
    """A 'scanned' PDF: each page is a single image XObject (no text
    operators at all, so detect_pdf_type reports 'scanned')."""
    n_pages = len(pages_text)
    objects: dict[int, bytes] = {}
    stream_objs: dict[int, tuple[bytes, bytes]] = {}
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>".encode()
    first_img = 3 + n_pages
    first_content = first_img + n_pages
    for i, text in enumerate(pages_text):
        img_num = first_img + i
        content_num = first_content + i
        objects[3 + i] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /XObject << /Im1 {img_num} 0 R >> >> "
            f"/Contents {content_num} 0 R >>"
        ).encode()
        data, w, h = glyph_bitmap(text.split("\n"))
        payload = zlib.compress(data)
        idict = (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
            f"/Length {len(payload)} /Filter /FlateDecode >>"
        ).encode()
        stream_objs[img_num] = (idict, payload)
        cstream = f"q {w} 0 0 {h} 72 600 cm /Im1 Do Q".encode()
        stream_objs[content_num] = (
            f"<< /Length {len(cstream)} >>".encode(), cstream)

    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(buf)
        buf.extend(f"{num} 0 obj\n".encode())
        buf.extend(body)
        buf.extend(b"\nendobj\n")

    for num in sorted(objects):
        emit(num, objects[num])
    for num in sorted(stream_objs):
        sdict, payload = stream_objs[num]
        emit(num, sdict + b"\nstream\n" + payload + b"\nendstream")
    max_num = max(list(objects) + list(stream_objs))
    xref_pos = len(buf)
    buf.extend(f"xref\n0 {max_num + 1}\n".encode())
    buf.extend(b"0000000000 65535 f \n")
    for num in range(1, max_num + 1):
        buf.extend(f"{offsets[num]:010d} 00000 n \n".encode())
    buf.extend(
        f"trailer\n<< /Size {max_num + 1} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF".encode()
    )
    return bytes(buf)


def text_pdf_with_figures(
    pages: list[tuple[str, str | None]],
) -> bytes:
    """Born-digital pages that ALSO embed an image XObject: each entry is
    (page_text, figure_text_or_None). Page text goes through normal text
    operators (so detect_pdf_type says 'text'); the figure text is
    encoded as a machine-glyph bitmap (decodable by toy_bitmap_ocr).
    Exercises the figure-OCR routing (reference
    pdf_extractor.py:5221-5506)."""
    n_pages = len(pages)
    objects: dict[int, bytes] = {}
    stream_objs: dict[int, tuple[bytes, bytes]] = {}
    kids = " ".join(f"{4 + i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>".encode()
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    first_img = 4 + n_pages
    first_content = first_img + n_pages
    for i, (text, figure) in enumerate(pages):
        img_num = first_img + i
        content_num = first_content + i
        xobj = f"/XObject << /Im1 {img_num} 0 R >> " if figure is not None else ""
        objects[4 + i] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> {xobj}>> "
            f"/Contents {content_num} 0 R >>"
        ).encode()
        lines = []
        y = 750.0
        for raw in text.split("\n"):
            lines.append((72.0, y, raw))
            y -= 12
        cparts = [content_stream_for_lines(lines)]
        if figure is not None:
            data, w, h = glyph_bitmap(figure.split("\n"))
            payload = zlib.compress(data)
            idict = (
                f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
                f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                f"/Length {len(payload)} /Filter /FlateDecode >>"
            ).encode()
            stream_objs[img_num] = (idict, payload)
            cparts.append(f"q {w} 0 0 {h} 72 300 cm /Im1 Do Q".encode())
        cstream = b"\n".join(cparts)
        stream_objs[content_num] = (
            f"<< /Length {len(cstream)} >>".encode(), cstream)

    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(buf)
        buf.extend(f"{num} 0 obj\n".encode())
        buf.extend(body)
        buf.extend(b"\nendobj\n")

    for num in sorted(objects):
        emit(num, objects[num])
    for num in sorted(stream_objs):
        sdict, payload = stream_objs[num]
        emit(num, sdict + b"\nstream\n" + payload + b"\nendstream")
    max_num = max(list(objects) + list(stream_objs))
    xref_pos = len(buf)
    buf.extend(f"xref\n0 {max_num + 1}\n".encode())
    buf.extend(b"0000000000 65535 f \n")
    for num in range(1, max_num + 1):
        if num in offsets:
            buf.extend(f"{offsets[num]:010d} 00000 n \n".encode())
        else:  # figureless pages leave image-number gaps: free entries
            buf.extend(b"0000000000 65535 f \n")
    buf.extend(
        f"trailer\n<< /Size {max_num + 1} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF".encode()
    )
    return bytes(buf)


def mixed_quality_pdf() -> bytes:
    """Two pages, each malformed for a DIFFERENT extraction strategy
    (per-page merge fixture, reference ``pdf_extractor.py:839-910``):

    - page 0 emits one span per GLYPH with tight advances: the simple
      strategy inserts a space between every span ("z o r p ..."),
      collapsing word structure; the native gap rule reconstructs words.
    - page 1 emits word spans that all claim x=72 (broken font metrics):
      the native x-sort glues each line into one giant token, while
      emission-order simple keeps the spacing.

    Neither whole-document strategy reaches a 0.95 accept gate (the
    reference's own quality bar), but a best-per-page merge scores ~1.0.
    """
    pseudo = ("zorp quix blat fenk wubble prang stiv moxel cradup lonfir "
              "velch bostin garnel tups hixor javeln kwint ployt drazen muff")
    common = ("the quick brown fox jumps over the lazy dog and then the "
              "small black cat sat on the warm stone wall near the old red barn")
    lines_a = []
    y = 700.0
    for _ in range(25):
        x = 72.0
        for ch in pseudo:
            if ch != " ":
                lines_a.append((x, y, ch))
            x += 5.0 if ch != " " else 4.0
        y -= 14
    lines_b = []
    y = 700.0
    for _ in range(25):
        for w in common.split():
            lines_b.append((72.0, y, w))
        y -= 14
    return make_pdf([
        content_stream_for_lines(lines_a, size=10),
        content_stream_for_lines(lines_b, size=10),
    ])
