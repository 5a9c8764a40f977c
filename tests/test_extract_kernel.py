"""Byte-parity of the Arrow-buffer extraction kernel against the regex spec.

The kernel (extract_kernel.py) must be byte-identical to
``extract._extract_text_bytes_spec`` — the executable definition of the
per-row invariant — on well-formed pages, adversarial tag soup, and fuzzed
inputs, and must fail the same way on invalid utf-8.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from influxer_spark.extract import _extract_text_bytes_spec, extract_text_bytes
from influxer_spark.extract_kernel import extract_kernel

EDGE_CASES = [
    b'<html><head><title>t</title></head><body> <p class="c1"> hello  world </p> <p> x\ty </p> </body></html>',
    b"no body tags at all  just   text",
    b"<body>unclosed body here <b>bold</b>",      # no </body> → whole doc
    b'<body onload="x()">attr body</body>',
    b"<html><body> nested <div><span>deep</span></div> </body></html>tail",
    "é utf8 <body> café € </body>".encode(),
    b"",
    b"<body></body>",
    b"<body> a\x0b b \x0c c </body>",
    b"<body x> two </body> bodies <body> second </body>",
    b"</body> stray closer <body> real </body>",
    b"<body no gt at all",                         # opener never closes
    b"<body no-gt <body ok> yes </body>",          # re.search retries starts
    b"< lone lt > and <unclosed",
    b"a<b>c",
    b"x  <b>  y",
    b"<body>\n\n</body>",
    b"<<>> <body><<x>></body>",
    b"tag<a<b>mid",                                # '<' consumed inside span
    b"head<x>head<body>in < body</body>",          # lone '<' inside body
    b"<body>a<z</body>b",
    b" \t\r\n ",
    b"<body>   </body>",
]


def _run(cases: list[bytes]) -> list[str]:
    return extract_kernel(pa.array(cases, type=pa.binary())).to_pylist()


def test_edge_cases_match_spec():
    got = _run(EDGE_CASES)
    for case, g in zip(EDGE_CASES, got):
        assert g == _extract_text_bytes_spec(case), case


def test_sliced_batches_match_whole():
    arr = pa.array(EDGE_CASES * 7, type=pa.binary())
    whole = extract_kernel(arr).to_pylist()
    parts = []
    for i in range(0, len(arr), 5):
        parts.extend(extract_kernel(arr.slice(i, 5)).to_pylist())
    assert parts == whole


def test_empty_batch():
    assert _run([]) == []


def test_null_html_raises():
    with pytest.raises(ValueError, match="null html"):
        extract_kernel(pa.array([b"x", None], type=pa.binary()))


def test_invalid_utf8_raises_like_strict_decode():
    bad = b"<body> \xff\xfe </body>"
    with pytest.raises(UnicodeDecodeError):
        _extract_text_bytes_spec(bad)
    with pytest.raises(pa.ArrowInvalid):
        _run([bad])


def test_corpus_parity_and_scalar_agreement():
    """Generated-corpus sample: kernel == spec == optimized scalar path."""
    from influxer_spark.datagen import generate_pages
    import pyarrow.parquet as pq
    import os, tempfile

    d = os.path.join(tempfile.gettempdir(), "influxer_kernel_parity_pages")
    if not os.path.exists(os.path.join(d, "pages.parquet")):
        generate_pages(d, n_rows=5000, seed=7, days=3)
    t = pq.read_table(os.path.join(d, "pages.parquet"), columns=["html", "text"])
    htmls = t["html"].combine_chunks()
    got = extract_kernel(htmls).to_pylist()
    assert got == t["text"].to_pylist()  # datagen invariant
    sample = htmls.to_pylist()[:500]
    assert got[:500] == [extract_text_bytes(h) for h in sample]


# tag soup fragments the fuzzer assembles — biased toward boundary tokens
_TOKENS = st.sampled_from(
    [
        b"<body>", b"</body>", b"<body", b"<body x=1>", b"<", b">", b"<>",
        b"<p>", b"</p>", b" ", b"\t", b"\n", b"\x0b", b"\x0c", b"\r",
        b"a", b"bc", b"body", b"/body", b"<bo", b"dy>", b"\xc3\xa9",
    ]
)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.lists(_TOKENS, max_size=30), max_size=8))
def test_fuzz_tag_soup_matches_spec(rows):
    cases = [b"".join(r) for r in rows]
    expected = []
    for c in cases:
        try:
            expected.append(_extract_text_bytes_spec(c))
        except UnicodeDecodeError:
            expected.append(None)  # kernel must also fail the batch
    if any(e is None for e in expected):
        with pytest.raises(pa.ArrowInvalid):
            _run(cases)
    else:
        assert _run(cases) == expected


@settings(max_examples=150, deadline=None)
@given(st.lists(st.binary(max_size=60), max_size=10))
def test_fuzz_random_bytes_matches_spec(rows):
    expected = []
    for c in rows:
        try:
            expected.append(_extract_text_bytes_spec(c))
        except UnicodeDecodeError:
            expected.append(None)
    if any(e is None for e in expected):
        with pytest.raises(pa.ArrowInvalid):
            _run(rows)
    else:
        assert _run(rows) == expected
