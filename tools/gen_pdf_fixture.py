#!/usr/bin/env python3
"""Generate a REAL-WORLD-SHAPED PDF fixture: PDF 1.5 with a cross-reference
STREAM (/Type /XRef) compressed with FlateDecode under a PNG Up predictor
(/DecodeParms << /Predictor 12 /Columns 7 >>) — the layout mainstream PDF
writers emit and the shape crawled PDFs actually have (no classic xref
table at all). Built by hand with CPython zlib, fully independent of the
JVM extractor, so PdfTextSpec pins extraction against a second
implementation's bytes.

The extractor (graft.sources.PdfText) finds content streams by scanning,
not via the xref — this fixture proves that design on the modern layout:
the text must come out, and the xref stream's binary payload must inject
nothing.

Output: tools/fixtures/predictor_xref.pdf (deterministic bytes).
"""
import os
import zlib

LINES = ["Predictor xref fixture", "DecodeParms survive"]


def content_stream():
    ops = ["BT /F1 12 Tf 14 TL 72 720 Td"]
    for i, ln in enumerate(LINES):
        ops.append(("(%s) Tj" if i == 0 else "T* (%s) Tj") % ln)
    ops.append("ET")
    return " ".join(ops).encode("latin-1")


def main():
    out = bytearray()
    offsets = {}

    def add(objnum, body):
        offsets[objnum] = len(out)
        out.extend(("%d 0 obj\n" % objnum).encode())
        out.extend(body)
        out.extend(b"\nendobj\n")

    out.extend(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    add(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    flate = zlib.compress(content_stream(), 6)
    add(4, b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
           % (len(flate), flate))
    add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    # xref STREAM (object 6): W = [1 4 2] -> 7 bytes/row, one row per
    # object 0..6; PNG Up predictor: each row prefixed with filter tag 2,
    # bytes = row - previous_row (mod 256)
    xref_off = len(out)
    rows = []
    for n in range(7):
        if n == 0:
            typ, off, gen = 0, 0, 65535  # free-list head
        elif n == 6:
            typ, off, gen = 1, xref_off, 0
        else:
            typ, off, gen = 1, offsets[n], 0
        rows.append(bytes([typ]) + off.to_bytes(4, "big") + gen.to_bytes(2, "big"))
    prev = bytes(7)
    pred = bytearray()
    for r in rows:
        pred.append(2)  # PNG Up filter tag
        pred.extend((r[i] - prev[i]) & 0xFF for i in range(7))
        prev = r
    xflate = zlib.compress(bytes(pred), 6)
    add(6, b"<< /Type /XRef /Size 7 /Root 1 0 R /W [1 4 2] "
           b"/Filter /FlateDecode "
           b"/DecodeParms << /Predictor 12 /Columns 7 >> "
           b"/Length %d >>\nstream\n%s\nendstream" % (len(xflate), xflate))
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_off)

    dest = os.path.join(os.path.dirname(__file__), "fixtures",
                        "predictor_xref.pdf")
    with open(dest, "wb") as f:
        f.write(bytes(out))
    print("wrote %s (%d bytes), text lines: %s" % (dest, len(out), LINES))


if __name__ == "__main__":
    main()
