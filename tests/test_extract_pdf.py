"""Unit tests for the PDF branch: writer/parser round trip, span geometry,
1-based page numbering (reference convention, no-ocr-api/np_ocr/data.py:56),
and the page-count invariant analogue (data.py:28)."""

from no_ocr_spark.extract.api import extract_document
from no_ocr_spark.extract.pdf import (
    build_pdf,
    build_pdf_custom,
    is_pdf,
    page_text,
    parse_pdf,
    pdf_text,
)


def test_roundtrip_two_pages():
    pdf = build_pdf([["Hello world.", "Second line."], ["Page two."]])
    assert is_pdf(pdf)
    pages = parse_pdf(pdf)
    assert len(pages) == 2  # the data.py:28 invariant: page count agrees
    assert [s.text for s in pages[0]] == ["Hello world.", "Second line."]
    assert [s.text for s in pages[1]] == ["Page two."]


def test_span_geometry_monotone_lines():
    pdf = build_pdf([["aaa", "bbb", "ccc"]])
    (spans,) = parse_pdf(pdf)
    ys = [s.y0 for s in spans]
    assert ys == sorted(ys, reverse=True)  # lines descend down the page
    assert all(s.x1 > s.x0 for s in spans)
    assert [s.line for s in spans] == [0, 1, 2]
    assert all(s.block == 0 for s in spans)


def test_escapes():
    pdf = build_pdf([["a(b)c\\d"]])
    (spans,) = parse_pdf(pdf)
    assert spans[0].text == "a(b)c\\d"


def test_pdf_text_join():
    pdf = build_pdf([["l1", "l2"], ["l3"]])
    assert pdf_text(pdf) == "l1\nl2\n\nl3"


def test_extract_document_pdf_branch():
    pdf = build_pdf([["x y z"], ["w"]])
    rec = extract_document(pdf)
    assert rec["method"] == "pdf_minispan_v1"
    assert rec["n_blocks"] == 2
    assert {s["page"] for s in rec["spans"]} == {1, 2}  # 1-based
    assert rec["error"] is None


def test_extract_document_quarantines_garbage():
    rec = extract_document(b"%PDF-1.4 then complete garbage \xff\xff")
    assert rec["method"] in ("pdf_minispan_v1", "error")
    assert isinstance(rec["text"], str)


# ---------------------------------------------------------- general-PDF ops


def test_tj_array_show_concatenates_with_kerning():
    # TJ: strings concatenate into ONE span; numbers kern by -n/1000*size
    pdf = build_pdf_custom(
        ["BT /F1 10 Tf 72 720 Td [(Hel) 120 (lo) -80 ( world)] TJ ET"])
    (spans,) = parse_pdf(pdf)
    assert [s.text for s in spans] == ["Hello world"]
    # width = 0.6*10*len("Hello world") - 120/1000*10 + 80/1000*10
    assert abs((spans[0].x1 - spans[0].x0) - (0.6 * 10 * 11 - 1.2 + 0.8)) < 0.01


def test_hex_string_show():
    # <48656C6C6F> = "Hello"; odd-digit <48656C6C6F2> pads a trailing 0 = "Hello "
    pdf = build_pdf_custom(
        ["BT /F1 12 Tf 72 720 Td <48656C6C6F> Tj <2120> Tj ET"])
    (spans,) = parse_pdf(pdf)
    assert [s.text for s in spans] == ["Hello", "! "]


def test_quote_operators_next_line_show():
    # ' = T* + Tj ; " = aw ac string with T* + show
    pdf = build_pdf_custom(
        ["BT /F1 12 Tf 14 TL 72 720 Td (first) Tj (second) ' 2 1 (third) \" ET"])
    (spans,) = parse_pdf(pdf)
    assert [s.text for s in spans] == ["first", "second", "third"]
    ys = [s.y0 for s in spans]
    assert ys == sorted(ys, reverse=True)  # each show moved one line down
    assert abs((ys[0] - ys[1]) - 14.0) < 0.01  # TL leading respected


def test_page_tree_order_beats_file_order():
    # objects for page 2 appear BEFORE page 1 in the file; the page tree
    # still says page 1 first — the parser must follow the tree
    pdf = build_pdf_custom(
        ["BT /F1 12 Tf 72 720 Td (page one) Tj ET",
         "BT /F1 12 Tf 72 720 Td (page two) Tj ET"],
        reverse_pages_in_file=True,
    )
    assert pdf.find(b"page two") < pdf.find(b"page one")  # file order reversed
    assert pdf_text(pdf) == "page one\n\npage two"        # tree order wins


def test_contents_array_concatenates_streams():
    # a page whose /Contents is an ARRAY of two streams: both parsed, in order
    base = build_pdf_custom(["BT /F1 12 Tf 72 720 Td (A) Tj ET"])
    # hand-edit: add a second content stream object 6 and reference both
    extra = b"BT /F1 12 Tf 72 700 Td (B) Tj ET"
    stream_obj = (b"6 0 obj\n<< /Length %d >>\nstream\n" % len(extra)
                  + extra + b"\nendstream\nendobj\n")
    pdf = base.replace(b"/Contents 4 0 R", b"/Contents [4 0 R 6 0 R]")
    pdf = pdf.replace(b"xref\n", stream_obj + b"xref\n", 1)
    (spans,) = parse_pdf(pdf)
    assert [s.text for s in spans] == ["A", "B"]


def test_nested_page_tree():
    # Catalog -> Pages(root) -> [Pages(inner) -> [p1], p2]
    p1 = b"BT /F1 12 Tf 72 720 Td (one) Tj ET"
    p2 = b"BT /F1 12 Tf 72 720 Td (two) Tj ET"
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"),
        (3, b"<< /Type /Pages /Parent 2 0 R /Kids [4 0 R] /Count 1 >>"),
        (4, b"<< /Type /Page /Parent 3 0 R /Contents 6 0 R >>"),
        (5, b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>"),
        (6, b"<< /Length %d >>\nstream\n%s\nendstream" % (len(p1), p1)),
        (7, b"<< /Length %d >>\nstream\n%s\nendstream" % (len(p2), p2)),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for oid, body in objs:
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 8 /Root 1 0 R >>\n%%EOF\n"
    assert pdf_text(bytes(out)) == "one\n\ntwo"


def test_build_pdf_font_ref_resolves_to_font_object():
    # multi-page PDFs must reference the actual font object, not a page obj
    pdf = build_pdf([["a"], ["b"], ["c"]])  # font object id = 3 + 2*3 = 9
    assert b"/Font << /F1 9 0 R >>" in pdf
    assert b"9 0 obj\n<< /Type /Font" in pdf


def test_all_writer_styles_extract_identically():
    pages = [["Hello world one.", "Second line here."], ["Page two text."]]
    base = None
    for style in ("tj", "tj_arr", "quote", "reversed", "encoded",
                  "aesv2", "aesv3"):
        pdf = build_pdf(pages, style=style)
        parsed = parse_pdf(pdf)
        spans = [(s.text, s.x0, s.y0, s.x1, s.y1, s.block, s.line)
                 for p in parsed for s in p]
        if base is None:
            base = (pdf_text(pdf), spans)
        else:
            assert pdf_text(pdf) == base[0], style
            assert spans == base[1], style


# ------------------------------------------------------------ encodings


def test_encoded_style_really_uses_the_table():
    # the raw bytes carry \x01/\x02, NOT 'a'/'e' — only the /Differences
    # table restores the text, so a latin-1-only parser would corrupt it
    pdf = build_pdf([["banana tree"]], style="encoded")
    assert rb"b\001n\001n\001 tr\002\002" in pdf  # octal-escaped codes
    assert b"banana" not in pdf  # the text exists only via the table
    assert pdf_text(pdf) == "banana tree"


def test_differences_encoding_byte_identical():
    # consecutive names advance the code; a second int restarts it
    pdf = build_pdf_custom(
        ["BT /F1 12 Tf 72 720 Td (A B a) Tj ET"],
        fonts={"F1": {"differences": "65 /eacute /adieresis 97 /ccedilla"}},
    )
    (spans,) = parse_pdf(pdf)
    assert spans[0].text == "é ä ç"


def test_differences_uni_names_and_agl_accents():
    pdf = build_pdf_custom(
        ["BT /F1 12 Tf 72 720 Td (\x01\x02\x03) Tj ET"],
        fonts={"F1": {"differences": "1 /uni20AC /germandbls /ntilde"}},
    )
    (spans,) = parse_pdf(pdf)
    assert spans[0].text == "€ßñ"


def test_tounicode_bfchar_and_both_bfrange_forms():
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"1 beginbfchar <41> <00E9> endbfchar\n"
            b"2 beginbfrange\n"
            b"<61> <63> <0041>\n"
            b"<64> <65> [<0058> <00590059>]\n"
            b"endbfrange\nend")
    pdf = build_pdf_custom(
        ["BT /F1 12 Tf 72 720 Td (Aabcde) Tj ET"],
        fonts={"F1": {"tounicode": cmap}},
    )
    (spans,) = parse_pdf(pdf)
    # A->é, a..c -> A..C (last-unit increment), d -> X, e -> YY (multi-unit)
    assert spans[0].text == "éABCXYY"


def test_tounicode_beats_differences():
    cmap = b"1 beginbfchar <41> <005A> endbfchar"
    pdf = build_pdf_custom(
        ["BT /F1 12 Tf 72 720 Td (A) Tj ET"],
        fonts={"F1": {"differences": "65 /eacute", "tounicode": cmap}},
    )
    (spans,) = parse_pdf(pdf)
    assert spans[0].text == "Z"


def test_fonts_switch_mid_page():
    # Tf switches the active decode table; F2 is identity latin-1
    pdf = build_pdf_custom(
        ["BT /F1 12 Tf 72 720 Td (A) Tj /F2 12 Tf (A) Tj ET"],
        fonts={"F1": {"differences": "65 /eacute"},
               "F2": {"base": "Courier"}},
    )
    (spans,) = parse_pdf(pdf)
    assert [s.text for s in spans] == ["é", "A"]


# ------------------------------------------------- length-aware objects


def _wrap_flate_stored(content: bytes) -> bytes:
    import zlib

    # level=0 => stored (uncompressed) deflate blocks: the compressed
    # payload contains `content` VERBATIM, marker bytes included
    return zlib.compress(content, 0)


def test_endobj_bytes_inside_flate_stream_do_not_truncate():
    content = b"BT /F1 12 Tf 72 720 Td (before endobj after) Tj ET"
    data = _wrap_flate_stored(content)
    assert b"endobj" in data  # the adversarial condition is real
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(data), data)),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for oid, body in objs:
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    assert pdf_text(bytes(out)) == "before endobj after"


def test_indirect_length_forward_reference():
    content = b"BT /F1 12 Tf 72 720 Td (indirect endstream len) Tj ET"
    data = _wrap_flate_stored(content)
    assert b"endstream" in content  # payload fakes the end marker too
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        # /Length lives in object 5, which appears AFTER the stream
        (4, b"<< /Length 5 0 R /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % data),
        (5, b"%d" % len(data)),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for oid, body in objs:
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    assert pdf_text(bytes(out)) == "indirect endstream len"


def test_resources_inherit_from_pages_node():
    # the page has no /Resources; the encoding comes from the parent
    # Pages node (PDF 32000-1 7.7.3.4 inheritable attributes)
    p = b"BT /F1 12 Tf 72 720 Td (A) Tj ET"
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, b"<< /Length %d >>\nstream\n%s\nendstream" % (len(p), p)),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding << /Differences [65 /eacute] >> >>"),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for oid, body in objs:
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    assert pdf_text(bytes(out)) == "é"


def test_winansi_and_macroman_base_encodings():
    # CP1252 0x93/0x94 are curly quotes; mac-roman 0x8E is é
    pdf = build_pdf_custom(
        ["BT /F1 12 Tf 72 720 Td (\\223q\\224) Tj /F2 12 Tf (\\216) Tj ET"],
        fonts={"F1": {}, "F2": {}},
    )
    pdf = pdf.replace(b"/BaseFont /Helvetica >>",
                      b"/BaseFont /Helvetica /Encoding /WinAnsiEncoding >>", 1)
    pdf = pdf.replace(b"/BaseFont /Helvetica >>",
                      b"/BaseFont /Helvetica /Encoding /MacRomanEncoding >>", 1)
    (spans,) = parse_pdf(pdf)
    assert [s.text for s in spans] == ["“q”", "é"]


def test_base_encoding_under_differences_dict():
    # /BaseEncoding inside the encoding dict + a Differences override
    pdf = build_pdf_custom(
        ["BT /F1 12 Tf 72 720 Td (\\223A\\224) Tj ET"],
        fonts={"F1": {"differences": "65 /eacute"}},
    )
    pdf = pdf.replace(
        b"/Encoding << /Type /Encoding /Differences",
        b"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
        b"/Differences", 1)
    (spans,) = parse_pdf(pdf)
    assert spans[0].text == "“é”"


def test_object_stream_pdf15():
    """Page + font dicts packed in a /Type /ObjStm compressed stream — the
    layout every modern PDF writer produces. Only the Catalog and the
    content stream live at the top level."""
    import zlib

    inner = [
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding << /Differences [65 /eacute] >> >>"),
    ]
    offsets, blobs, pos = [], [], 0
    for oid, body in inner:
        offsets.append(b"%d %d" % (oid, pos))
        blobs.append(body)
        pos += len(body) + 1
    header = b" ".join(offsets) + b"\n"
    objstm_data = header + b"\n".join(blobs)
    first = len(header)
    comp = zlib.compress(objstm_data)

    content = b"BT /F1 12 Tf 72 720 Td (A) Tj ET"
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (4, b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)),
        (6, b"<< /Type /ObjStm /N 3 /First %d /Length %d /Filter /FlateDecode "
            b">>\nstream\n%s\nendstream" % (first, len(comp), comp)),
    ]
    out = bytearray(b"%PDF-1.5\n")
    for oid, body in objs:
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    assert pdf_text(bytes(out)) == "é"


def test_stream_filter_chain_asciihex_and_a85():
    import base64

    content = b"BT /F1 12 Tf 72 720 Td (filtered) Tj ET"
    hx = content.hex().encode() + b">"
    a85 = base64.a85encode(zlib_compress(content)) + b"~>"
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, b"<< /Length %d /Filter /ASCIIHexDecode >>\nstream\n%s\nendstream"
            % (len(hx), hx)),
        (5, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"),
        # filter CHAIN: A85 transport around a Flate payload, spec order
        (6, b"<< /Length %d /Filter [/ASCII85Decode /FlateDecode] >>"
            b"\nstream\n%s\nendstream" % (len(a85), a85)),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for oid, body in objs:
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    assert pdf_text(bytes(out)) == "filtered\n\nfiltered"


def zlib_compress(b):
    import zlib

    return zlib.compress(b)


def _lzw_encode(data: bytes) -> bytes:
    """Minimal TIFF-style LZW encoder (the decoder's inverse) for the
    round-trip test: emits CLEAR first, EOD last, early width change."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    codes = [(256, 9)]
    w = b""
    for ch in bytes(data):
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        # The decoder's table lags the encoder's by one entry (it can only
        # add an entry after seeing the NEXT code), so with early change the
        # encoder widens at next_code >= 2^width while the decoder widens at
        # table_len >= 2^width - 1 (libtiff tif_lzw.c uses the same pair).
        if next_code >= (1 << width) and width < 12:
            width += 1
        w = bytes([ch])
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    acc = bits = 0
    out = bytearray()
    for code, wd in codes:
        acc = (acc << wd) | code
        bits += wd
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def test_lzw_decode_roundtrip():
    from no_ocr_spark.extract.pdf import _lzw_decode

    for payload in [b"-----A---B", b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
                    bytes(range(256)) * 3,
                    b"the quick brown fox " * 50]:
        assert _lzw_decode(_lzw_encode(payload)) == payload


def test_lzw_filtered_content_stream():
    content = b"BT /F1 12 Tf 72 720 Td (lzw text) Tj ET"
    enc = _lzw_encode(content)
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, b"<< /Length %d /Filter /LZWDecode >>\nstream\n%s\nendstream"
            % (len(enc), enc)),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for oid, body in objs:
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    assert pdf_text(bytes(out)) == "lzw text"


def test_rc4_public_vectors():
    """Wikipedia's published RC4 test vectors."""
    from no_ocr_spark.extract.pdf import _rc4

    assert _rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert _rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert (_rc4(b"Secret", b"Attack at dawn").hex().upper()
            == "45A01F645FC35B383552544B9BF5")


def _encrypt_pdf(pages_content: list[bytes], r: int, bits: int) -> bytes:
    """Build an RC4-encrypted PDF with an EMPTY user password. The key
    schedule here is written against the spec independently of the
    parser's (Algorithm 2): md5(pad || O || P_le || ID0), 50 extra rounds
    for R3, per-object md5(key || oid_le3 || gen_le2)."""
    import hashlib
    import struct

    pad = bytes.fromhex(
        "28BF4E5E4E758A4164004E56FFFA0108"
        "2E2E00B6D0683E802F0CA9FE6453697A"
    )
    o_entry = bytes(range(32))  # owner hash: arbitrary for empty-user open
    p = -44
    id0 = b"\x01\x02\x03\x04\x05\x06\x07\x08"
    n = bits // 8
    key = hashlib.md5(pad + o_entry + struct.pack("<i", p) + id0).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    key = key[:n]

    def objkey(oid):
        return hashlib.md5(
            key + oid.to_bytes(3, "little") + b"\x00\x00"
        ).digest()[: min(n + 5, 16)]

    from no_ocr_spark.extract.pdf import _rc4

    # /U per spec Algorithm 4 (R2) / 5 (R3) — written independently of the
    # parser's validator
    if r == 2:
        u_entry = _rc4(key, pad)
    else:
        u16 = _rc4(key, hashlib.md5(pad + id0).digest())
        for i in range(1, 20):
            u16 = _rc4(bytes(b ^ i for b in key), u16)
        u_entry = u16 + b"\x00" * 16

    kid_refs = " ".join(
        f"{3 + 2 * i} 0 R" for i in range(len(pages_content))
    ).encode()
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [" + kid_refs + b"] /Count %d >>"
            % len(pages_content)),
    ]
    for i, content in enumerate(pages_content):
        page_oid = 3 + 2 * i
        cont_oid = page_oid + 1
        enc = _rc4(objkey(cont_oid), content)
        objs.append((page_oid,
                     b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>"
                     % cont_oid))
        objs.append((cont_oid,
                     b"<< /Length %d >>\nstream\n" % len(enc) + enc
                     + b"\nendstream"))
    enc_oid = 3 + 2 * len(pages_content)
    v = 1 if bits == 40 else 2
    objs.append((enc_oid,
                 b"<< /Filter /Standard /V %d /R %d /Length %d /P %d "
                 b"/O <%s> /U <%s> >>"
                 % (v, r, bits, p, o_entry.hex().encode(),
                    u_entry.hex().encode())))
    out = bytearray(b"%PDF-1.4\n")
    for oid, body in objs:
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += (b"trailer\n<< /Size %d /Root 1 0 R /Encrypt %d 0 R "
            b"/ID [<%s> <%s>] >>\n%%%%EOF\n"
            % (enc_oid + 1, enc_oid, id0.hex().encode(), id0.hex().encode()))
    return bytes(out)


def test_encrypted_rc4_40bit_r2():
    pdf = _encrypt_pdf(
        [b"BT /F1 12 Tf 72 720 Td (secret forty) Tj ET"], r=2, bits=40)
    assert pdf_text(pdf) == "secret forty"


def test_encrypted_rc4_128bit_r3_two_pages():
    pdf = _encrypt_pdf(
        [b"BT /F1 12 Tf 72 720 Td (page one) Tj ET",
         b"BT /F1 12 Tf 72 720 Td (page two) Tj ET"], r=3, bits=128)
    assert pdf_text(pdf) == "page one\n\npage two"


def test_encrypted_aes_quarantined():
    pdf = _encrypt_pdf(
        [b"BT /F1 12 Tf 72 720 Td (x) Tj ET"], r=2, bits=40)
    # rewrite the encrypt dict to claim AESV2 (V4/R4)
    pdf = pdf.replace(b"/V 1 /R 2", b"/V 4 /R 4")
    import pytest

    from no_ocr_spark.extract.pdf import UnsupportedEncryptionError

    with pytest.raises(UnsupportedEncryptionError):
        parse_pdf(pdf)
    rec = extract_document(pdf)
    assert rec["error"] is not None
    assert "UnsupportedEncryption" in rec["error"]
    assert rec["text"] == ""


def test_content_comments_skipped():
    content = (b"% (this is not text) Tj\n"
               b"BT /F1 12 Tf 72 720 Td (real) Tj ET % trailing (no) Tj")
    pdf = _raw_pdf_one_page(content)
    assert pdf_text(pdf) == "real"


def test_inline_image_data_skipped():
    # binary image payload contains bytes that would tokenize as a show op
    img = b"\x00\x01(fake) Tj\xff\xfe"
    content = (b"BI /W 2 /H 2 /BPC 8 /CS /RGB ID " + img + b" EI\n"
               b"BT /F1 12 Tf 72 720 Td (after image) Tj ET")
    pdf = _raw_pdf_one_page(content)
    assert pdf_text(pdf) == "after image"


def _raw_pdf_one_page(content: bytes) -> bytes:
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, b"<< /Length %d >>\nstream\n" % len(content) + content
            + b"\nendstream"),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for oid, body in objs:
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def test_type0_two_byte_cmap_cjk():
    """Type0/CID font with a 2-byte ToUnicode CMap (the CJK shape): show
    strings consume 2-byte code units; bfchar + bfrange both covered."""
    import zlib

    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"2 beginbfchar\n"
            b"<0041> <4F60>\n"
            b"<0042> <597D>\n"
            b"endbfchar\n"
            b"1 beginbfrange\n"
            b"<0100> <0102> <4E16>\n"
            b"endbfrange\n"
            b"endcmap\n")
    comp = zlib.compress(cmap)
    # show <0041 0042 0100 0101 0102>: 你 好 世 丗 丘? (base 4E16 ++)
    content = (b"BT /F9 12 Tf 72 720 Td "
               b"<00410042010001010102> Tj ET")
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F9 5 0 R >> >> >>"),
        (4, b"<< /Length %d >>\nstream\n" % len(content) + content
            + b"\nendstream"),
        (5, b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
            b"/Encoding /Identity-H /ToUnicode 6 0 R >>"),
        (6, b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
            + comp + b"\nendstream"),
    ]
    out = bytearray(b"%PDF-1.5\n")
    for oid, body in objs:
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    assert pdf_text(bytes(out)) == "你好世丗丘"


def test_one_byte_cmap_still_one_byte():
    """A 1-byte CMap must NOT trip the 2-byte path (regression guard for
    the width marker)."""
    from no_ocr_spark.extract.pdf import _WIDTH_KEY, _parse_tounicode

    m = _parse_tounicode(
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfchar <41> <00E9> endbfchar\n")
    assert _WIDTH_KEY not in m
    assert m[0x41] == "é"


def test_encrypted_nonempty_user_password_quarantined():
    """A PDF keyed with a NON-empty user password must be quarantined
    (wrong-key silent garbage was the round-3 review finding #1): the /U
    entry no longer validates against the empty-password key."""
    pdf = _encrypt_pdf(
        [b"BT /F1 12 Tf 72 720 Td (sealed) Tj ET"], r=3, bits=128)
    # corrupt /U so the empty-password Algorithm-5 check fails, which is
    # exactly what a real non-empty-user-password file looks like
    import re as _re

    m = _re.search(rb"/U <([0-9a-f]+)>", pdf)
    bad_u = ("ff" * 32).encode()
    pdf = pdf.replace(m.group(1), bad_u)
    import pytest

    from no_ocr_spark.extract.pdf import UnsupportedEncryptionError

    with pytest.raises(UnsupportedEncryptionError):
        parse_pdf(pdf)
    rec = extract_document(pdf)
    assert rec["error"] is not None and "UnsupportedEncryption" in rec["error"]


def test_unencrypted_pdf_quoting_encrypt_marker_extracts():
    """Review finding #3: an UNencrypted doc whose content QUOTES
    '/Encrypt 9 0 R' (e.g. a PDF about PDF internals) must not be treated
    as encrypted — detection is trailer-scoped."""
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"(trailer dict holds /Encrypt 9 0 R entries) Tj ET")
    pdf = _raw_pdf_one_page(content)
    assert pdf_text(pdf) == "trailer dict holds /Encrypt 9 0 R entries"


def test_corrupt_lzw_stream_skipped_not_crash():
    """Review finding #2: corrupt LZW data (out-of-range code) must skip
    the stream, not raise IndexError through the page walk."""
    from no_ocr_spark.extract.pdf import _inflate

    # 9-bit code 300 with an empty table -> out-of-range table reference
    corrupt = bytes([300 >> 1, (300 & 1) << 7])
    assert _inflate(b"<< /Filter /LZWDecode >>", corrupt) is None
    good = b"BT /F1 12 Tf 72 720 Td (ok) Tj ET"
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, b"<< /Length %d /Filter /LZWDecode >>\nstream\n" % len(corrupt)
            + corrupt + b"\nendstream"),
        (5, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"),
        (6, b"<< /Length %d >>\nstream\n" % len(good) + good
            + b"\nendstream"),
    ]
    # page 1's stream is corrupt -> empty page; doc still parses
    objs[1] = (2, b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>")
    out = bytearray(b"%PDF-1.4\n")
    for oid, body in objs:
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    assert pdf_text(bytes(out)) == "ok"


def test_inline_image_data_abutting_ei():
    """Review finding #4 (spec 8.9.7): image data may abut EI with no
    whitespace — the page tail must survive."""
    content = (b"BI /W 1 /H 1 /BPC 8 /CS /G ID \xabEI\n"
               b"BT /F1 12 Tf 72 720 Td (tail survives) Tj ET")
    pdf = _raw_pdf_one_page(content)
    assert pdf_text(pdf) == "tail survives"


def test_aes_fips197_vectors():
    """FIPS-197 appendix B/C vectors pin the from-scratch AES core."""
    from no_ocr_spark.extract.pdf import (
        _aes_cbc_decrypt,
        _aes_cbc_encrypt,
        _aes_decrypt_block,
        _aes_encrypt_block,
        _aes_round_keys,
        _aes_tables,
    )

    sbox, inv_sbox, _ = _aes_tables()
    assert sbox[0x00] == 0x63 and sbox[0x01] == 0x7C and sbox[0x53] == 0xED
    assert inv_sbox[0x63] == 0x00
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk = _aes_round_keys(key)
    ct = _aes_encrypt_block(rk, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert _aes_decrypt_block(rk, ct) == pt
    k2 = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    p2 = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    assert (_aes_encrypt_block(_aes_round_keys(k2), p2).hex()
            == "3925841d02dc09fbdc118597196a0b32")
    # appendix C.2/C.3: the 192/256-bit key schedules (extra SubWord leg)
    k192, k256 = bytes(range(24)), bytes(range(32))
    assert (_aes_encrypt_block(_aes_round_keys(k192), pt).hex()
            == "dda97ca4864cdfe06eaf70a0ec0d7191")
    ct256 = _aes_encrypt_block(_aes_round_keys(k256), pt)
    assert ct256.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert _aes_decrypt_block(_aes_round_keys(k256), ct256) == pt
    for k in (key, k192, k256):
        for n in (0, 1, 15, 16, 17, 100):
            data = bytes(range(256))[:n]
            assert _aes_cbc_decrypt(
                k, _aes_cbc_encrypt(k, data, iv=bytes(16))) == data


def test_encrypted_aesv2_extracts_byte_identically():
    """V4/R4 /CFM /AESV2, empty user password: the dominant encrypted-PDF
    config. Text must round-trip byte-identically vs the unencrypted
    build, and the plaintext must be absent from the file bytes."""
    pages = [["alpha beta gamma", "second line"], ["page two text"]]
    plain = build_pdf(pages, style="tj")
    enc = build_pdf(pages, style="aesv2")
    assert pdf_text(enc) == pdf_text(plain)
    assert b"alpha beta gamma" not in enc
    # and the multi-style invariant holds: aesv2 joins the rotation
    for style in ["tj", "tj_arr", "quote", "reversed", "encoded", "aesv2"]:
        assert pdf_text(build_pdf(pages, style=style)) == pdf_text(plain), style


def test_encrypted_aesv2_wrong_password_quarantined():
    """A non-empty-user-password AESV2 file must be quarantined by the /U
    check, not silently 'decrypted' into garbage."""
    import pytest

    from no_ocr_spark.extract.pdf import UnsupportedEncryptionError

    enc = build_pdf([["secret stuff"]], style="aesv2")
    # corrupt the /U entry: simulates a file whose user password is set
    import re as _re

    m = _re.search(rb"/U <([0-9a-f]{64})>", enc)
    assert m
    bad = enc.replace(m.group(1), bytes.fromhex("ff").hex().encode() * 32)
    with pytest.raises(UnsupportedEncryptionError):
        parse_pdf(bad)
    rec = extract_document(bad)
    assert rec["error"] is not None and rec["text"] == ""


def test_encrypted_aesv3_extracts_byte_identically():
    """V5 /CFM /AESV3, empty user password: R=6 (ISO 32000-2 hardened
    hash, Algorithm 2.B) and the deprecated R=5 (plain SHA-256) both
    round-trip byte-identically vs the unencrypted build — through U
    validation, the /UE AES-256-CBC file-key unwrap, and per-stream
    AES-256 decryption with NO per-object key derivation."""
    pages = [["alpha beta gamma", "second line"], ["page two text"]]
    plain = build_pdf(pages, style="tj")
    for style in ("aesv3", "aesv3r5"):
        enc = build_pdf(pages, style=style)
        assert pdf_text(enc) == pdf_text(plain), style
        assert b"alpha beta gamma" not in enc


def test_encrypted_aesv3_wrong_password_quarantined():
    """A non-empty-user-password V5 file must fail the Algorithm 2.B /U
    hash check and quarantine, not silently 'decrypt' into garbage."""
    import re as _re

    import pytest

    from no_ocr_spark.extract.pdf import UnsupportedEncryptionError

    enc = build_pdf([["secret stuff"]], style="aesv3")
    m = _re.search(rb"/U <([0-9a-f]{96})>", enc)
    assert m
    bad = enc.replace(m.group(1), b"ff" * 48)
    with pytest.raises(UnsupportedEncryptionError, match="password"):
        parse_pdf(bad)
    rec = extract_document(bad)
    assert rec["error"] is not None and rec["text"] == ""


def test_encrypted_aesv3_perms_integrity_check():
    """A corrupted /UE yields a wrong file key; the /Perms 'adb'
    decryption check (Algorithm 13) must catch it and quarantine —
    without it every stream would 'decrypt' to garbage text."""
    import re as _re

    import pytest

    from no_ocr_spark.extract.pdf import UnsupportedEncryptionError

    enc = build_pdf([["integrity matters"]], style="aesv3")
    m = _re.search(rb"/UE <([0-9a-f]{64})>", enc)
    assert m
    flipped = bytearray(bytes.fromhex(m.group(1).decode()))
    flipped[0] ^= 0xFF
    bad = enc.replace(m.group(1), bytes(flipped).hex().encode())
    with pytest.raises(UnsupportedEncryptionError, match="Perms"):
        parse_pdf(bad)


def test_encrypted_v5_malformed_entries_quarantined():
    """A dict claiming V5 without real V5 entries (48-byte /U, /UE) —
    e.g. a doctored V4 file — must quarantine as malformed, never fall
    through to a V4-style key schedule."""
    import pytest

    from no_ocr_spark.extract.pdf import UnsupportedEncryptionError

    enc = build_pdf([["x"]], style="aesv2")
    bad = enc.replace(b"/V 4 /R 4", b"/V 5 /R 6").replace(
        b"/CFM /AESV2", b"/CFM /AESV3")
    with pytest.raises(UnsupportedEncryptionError):
        parse_pdf(bad)
    rec = extract_document(bad)
    assert "UnsupportedEncryption" in rec["error"]


def test_encrypted_v4_stmf_identity_reads_clear_streams():
    """/StmF /Identity means streams are NOT encrypted even though the
    file carries an /Encrypt dict (strings-only encryption): the parser
    must read them as plain text, not decrypt them into garbage."""
    plain = build_pdf([["identity stream text"]], style="tj")
    enc = build_pdf([["identity stream text"]], style="aesv2")
    import re as _re

    # take the AESV2 file's encrypt dict + trailer, but leave the stream
    # payloads as in the PLAIN build and point /StmF at /Identity
    m = _re.search(rb"trailer\n<< (.*) >>", enc)
    assert m and b"/Encrypt" in m.group(1)
    enc_dict = _re.search(
        rb"(\d+) 0 obj\n(<< /Filter /Standard.*?>>)\nendobj", enc, _re.S)
    assert enc_dict
    body = enc_dict.group(2).replace(b"/StmF /StdCF", b"/StmF /Identity")
    eid = int(enc_dict.group(1))
    out = plain.replace(
        b"trailer\n<< ",
        b"%d 0 obj\n" % eid + body + b"\nendobj\ntrailer\n<< ", 1)
    out = out.replace(b"/Root 1 0 R >>",
                      b"/Root 1 0 R /Encrypt %d 0 R "
                      b"/ID [<00112233445566778899aabbccddeeff> "
                      b"<00112233445566778899aabbccddeeff>] >>" % eid, 1)
    assert pdf_text(out) == "identity stream text"


def test_encrypted_v4_cfm_v2_rc4():
    """/V 4 with /CFM /V2 = RC4 under the crypt-filter framework (no sAlT,
    no CBC). Built independently of the parser via the RC4 fixture
    builder, then rewritten to the V4 dict shape."""
    pdf = _encrypt_pdf(
        [b"BT /F1 12 Tf 72 720 Td (v4 rc4 text) Tj ET"], r=3, bits=128)
    pdf = pdf.replace(
        b"/V 2 /R 3 /Length 128",
        b"/V 4 /R 4 /Length 128"
        b" /CF << /StdCF << /CFM /V2 /Length 16 >> >>"
        b" /StmF /StdCF /StrF /StdCF")
    assert pdf_text(pdf) == "v4 rc4 text"


def test_encrypted_v4_cf_before_length_key_order():
    """PDF dict key order is arbitrary: a V4 dict ordered '/CF <<...>>
    /Length 128' must read the TOP-LEVEL /Length (bits), not the crypt
    filter's /Length (bytes) — the first-match regex bug derived a 2-byte
    RC4 key and falsely quarantined valid files."""
    pdf = _encrypt_pdf(
        [b"BT /F1 12 Tf 72 720 Td (cf order ok) Tj ET"], r=3, bits=128)
    pdf = pdf.replace(
        b"/V 2 /R 3 /Length 128",
        b"/V 4 /R 4"
        b" /CF << /StdCF << /CFM /V2 /Length 16 >> >>"
        b" /StmF /StdCF /StrF /StdCF /Length 128")
    assert pdf_text(pdf) == "cf order ok"


def test_encrypted_v4_multi_filter_resolves_stmf_name():
    """A /CF dict can define SEVERAL filters; the algorithm must come from
    the one /StmF names, not the first /CFM in the byte stream. Here an
    /AltF RC4 filter precedes the AESV2 /StdCF that /StmF points at —
    first-match /CFM selection would RC4-'decrypt' AES streams into
    garbage without quarantining (the /U check is CFM-independent)."""
    pages = [["multi filter text"]]
    enc = build_pdf(pages, style="aesv2")
    bad_order = enc.replace(
        b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >>",
        b"/CF << /AltF << /CFM /V2 /Length 16 >> "
        b"/StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >>")
    assert bad_order != enc
    assert pdf_text(bad_order) == pdf_text(build_pdf(pages, style="tj"))

    # and /StmF naming a filter that is not defined quarantines
    import pytest

    from no_ocr_spark.extract.pdf import UnsupportedEncryptionError

    undef = enc.replace(b"/StmF /StdCF", b"/StmF /NoSuchF")
    with pytest.raises(UnsupportedEncryptionError):
        parse_pdf(undef)


def test_encrypt_dict_key_order_invariant():
    """PDF dictionary key order is arbitrary (ISO 32000-1 §7.3.7): every
    permutation of the top-level /Encrypt entries must parse identically —
    the class of bug where a regex grabs a same-named key from a nested
    crypt-filter dict (caught once with /Length) can only recur as a
    permutation failure."""
    import itertools as it

    pages = [["order invariant"]]
    enc = build_pdf(pages, style="aesv2")
    want = pdf_text(build_pdf(pages, style="tj"))
    import re as _re

    m = _re.search(rb"(\d+) 0 obj\n<< (/Filter /Standard.*?) >>\nendobj",
                   enc, _re.S)
    assert m
    body = m.group(2)
    # the builder's dict shape is known — list its top-level entries
    # explicitly (a generic splitter can't tell '/StmF /StdCF' apart from
    # two entries)
    cf = _re.search(rb"/CF << .*? >> >>", body, _re.S)
    o = _re.search(rb"/O <[0-9a-f]+>", body)
    u = _re.search(rb"/U <[0-9a-f]+>", body)
    assert cf and o and u
    entries = [b"/Filter /Standard", b"/V 4", b"/R 4", b"/Length 128",
               cf.group(0), b"/StmF /StdCF", b"/StrF /StdCF",
               b"/P -44", o.group(0), u.group(0)]
    assert b" ".join(entries) == body, (b" ".join(entries), body)
    for perm in it.islice(it.permutations(entries), 0, 720, 97):
        shuffled = b" ".join(perm)
        out = enc.replace(body, shuffled)
        assert out != enc or shuffled == body
        assert pdf_text(out) == want, shuffled[:80]


def test_encrypted_aesv3_dict_key_order_invariance():
    """Review finding: /U lookup must not match the '/U' prefix of /UE.
    PDF dict key order is arbitrary — reorder the V5 /Encrypt dict so
    /UE and /OE precede /U and /O; extraction must be unaffected."""
    import re as _re

    pages = [["order invariant text"]]
    enc = build_pdf(pages, style="aesv3")
    m = _re.search(
        rb"(/P -?\d+) (/O <[0-9a-f]+>) (/U <[0-9a-f]+>) (/OE <[0-9a-f]+>)"
        rb" (/UE <[0-9a-f]+>) (/Perms <[0-9a-f]+>)", enc)
    assert m, "fixture layout changed; update the reorder regex"
    p, o, u, oe, ue, perms = m.groups()
    reordered = b" ".join([perms, ue, oe, u, o, p])
    swapped = enc[:m.start()] + reordered + enc[m.end():]
    assert swapped != enc
    assert pdf_text(swapped) == pdf_text(build_pdf(pages, style="tj"))


def test_object_stream_inside_aes256_encrypted_pdf():
    """The modern-writer combination: objects packed in /ObjStm AND the
    file AES-256-encrypted — the carrier stream must decrypt BEFORE
    ObjStm expansion (the ordering _object_map documents), or every
    packed object is lost."""
    import zlib

    from no_ocr_spark.extract.pdf import _aesv3_encrypt_built

    inner = [
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding << /Differences [65 /eacute] >> >>"),
    ]
    offsets, blobs, pos = [], [], 0
    for oid, body in inner:
        offsets.append(b"%d %d" % (oid, pos))
        blobs.append(body)
        pos += len(body) + 1
    header = b" ".join(offsets) + b"\n"
    comp = zlib.compress(header + b"\n".join(blobs))
    content = b"BT /F1 12 Tf 72 720 Td (A) Tj ET"
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (4, b"<< /Length %d >>\nstream\n%s\nendstream"
            % (len(content), content)),
        (6, b"<< /Type /ObjStm /N 3 /First %d /Length %d "
            b"/Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(header), len(comp), comp)),
    ]
    enc_objs, trailer_extra = _aesv3_encrypt_built(objs, 7)
    out = bytearray(b"%PDF-1.5\n")
    for oid, body in enc_objs:
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    out += (b"trailer\n<< /Size 8 /Root 1 0 R" + trailer_extra
            + b" >>\n%%EOF\n")
    # both payloads are ciphertext in the file...
    assert comp not in bytes(out) and content not in bytes(out)
    # ...and extraction still resolves the packed font's /Differences
    assert pdf_text(bytes(out)) == "é"
