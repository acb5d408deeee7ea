"""Property-based invariants (SURVEY.md §5.2), hypothesis-driven, kernel-only
(no Spark session — these run on the pure pandas/numpy layer).

- spans: in-bounds, ordered, non-overlapping for ANY payload string
- NMS: output is an antichain under containment; idempotent; min-size gated
- dedup: exact dedup idempotence f(f(x)) == f(x)
- classification: total over the payload universe (never raises, kind in domain)
- layout: extracted text is stable under re-parse (determinism)
"""
from __future__ import annotations

import base64

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.config import ALL_KINDS, DEFAULT_CONFIG
from pdf_parser_spark.kernels.extract import extract_one
from pdf_parser_spark.kernels.geometry import contained_matrix, nms_keep_mask
from pdf_parser_spark.kernels.pdf_mini import PageSpec, TextRun, build_pdf

# -------------------------------------------------------------- payloads ---

payload_strings = st.one_of(
    st.text(max_size=300),
    st.text(alphabet="<>abp /\"=romanz ", max_size=300),  # html-ish tag soup
    st.builds(
        lambda words: base64.b64encode(
            build_pdf(
                [
                    PageSpec(
                        text_runs=[
                            TextRun(x=72, y=700 - 14 * i, size=10, text=w)
                            for i, w in enumerate(words)
                        ]
                    )
                ]
            )
        ).decode(),
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                min_size=1,
                max_size=40,
            ),
            min_size=1,
            max_size=8,
        ),
    ),
)


@settings(max_examples=150, deadline=None)
@given(payload_strings)
def test_extract_total_and_span_invariants(payload):
    kind, text, spans, n_blocks, ok = extract_one(payload, DEFAULT_CONFIG)
    assert kind in ALL_KINDS
    assert isinstance(text, str) and isinstance(n_blocks, int)
    prev_end = 0
    for r in spans:
        s, e = r["start"], r["end"]
        assert 0 <= s < e <= len(payload)
        assert s >= prev_end  # ordered, non-overlapping
        prev_end = e


@settings(max_examples=150, deadline=None)
@given(payload_strings)
def test_extract_deterministic(payload):
    assert extract_one(payload, DEFAULT_CONFIG) == extract_one(payload, DEFAULT_CONFIG)


# ------------------------------------------------------------------- NMS ---

boxes_strategy = st.lists(
    st.tuples(
        st.floats(0, 500, allow_nan=False),
        st.floats(0, 700, allow_nan=False),
        st.floats(1, 110, allow_nan=False),
        st.floats(1, 90, allow_nan=False),
        st.integers(10, 700),  # px_w
        st.integers(10, 700),  # px_h
    ),
    min_size=0,
    max_size=12,
)


def _unpack(raw):
    boxes = np.array([[x, y, x + w, y + h] for x, y, w, h, _, _ in raw]).reshape(
        -1, 4
    )
    areas = np.array([pw * ph for *_, pw, ph in raw], dtype=float)
    return boxes, areas


@settings(max_examples=200, deadline=None)
@given(boxes_strategy)
def test_nms_antichain_under_containment(raw):
    boxes, areas = _unpack(raw)
    keep = nms_keep_mask(boxes, areas, min_size=100, overlap_threshold=0.8)
    kept = boxes[keep]
    if len(kept) > 1:
        m = contained_matrix(kept, kept)
        np.fill_diagonal(m, False)
        assert not m.any(), "kept box contained in another kept box"


@settings(max_examples=200, deadline=None)
@given(boxes_strategy)
def test_nms_min_size_gate_and_idempotence(raw):
    boxes, areas = _unpack(raw)
    keep = nms_keep_mask(boxes, areas, min_size=100, overlap_threshold=0.8)
    # F2: nothing below min_size**2 pixel area survives
    assert not (areas[keep] < 100 * 100).any()
    # idempotence: re-running on the survivors keeps all of them
    if keep.any():
        keep2 = nms_keep_mask(
            boxes[keep], areas[keep], min_size=100, overlap_threshold=0.8
        )
        assert keep2.all()


# ------------------------------------------------------------ exact dedup ---

@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=30), max_size=30))
def test_exact_dedup_idempotent_first_wins(texts):
    # pandas-level model of operators.dedup.exact_dedup semantics
    import pandas as pd

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    def dedup(d):
        return d.loc[~d["text"].duplicated(keep="first")]

    once = dedup(df)
    assert dedup(once).equals(once)  # f(f(x)) == f(x)
    # survivor is always the lowest doc_id of its content group
    for _, grp in df.groupby("text"):
        assert grp["doc_id"].min() in set(once["doc_id"])
