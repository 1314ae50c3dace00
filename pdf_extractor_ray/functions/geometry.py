"""Bounding-box geometry: overlap tests and region clustering.

Re-implements the reference's vector-drawing region detector semantics
(/root/reference/src/pdf_processor.py:248-325): iterative overlap-merge
clustering of drawing bboxes with a merge distance, minimum cluster
membership and minimum region size.  Pure functions — used per page
inside ``map_batches`` (page-local, no shuffle; SURVEY §2.1 S6).
"""

from __future__ import annotations

Box = tuple[float, float, float, float]  # (x0, y0, x1, y1)


def boxes_overlap(a: Box, b: Box, margin: float = 0.0) -> bool:
    """Axis-aligned overlap test with an expansion margin (the
    reference's merge_distance semantics)."""
    return not (
        a[2] + margin < b[0]
        or b[2] + margin < a[0]
        or a[3] + margin < b[1]
        or b[3] + margin < a[1]
    )


def merge_boxes(a: Box, b: Box) -> Box:
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def box_size(a: Box) -> tuple[float, float]:
    return (a[2] - a[0], a[3] - a[1])


def cluster_boxes(
    boxes: list[Box],
    merge_distance: float = 20.0,
    min_members: int = 3,
    min_size: float = 30.0,
) -> list[Box]:
    """Iterative overlap-merge clustering (fixpoint), then filter by
    member count and minimum width/height — reference defaults
    (≥3 drawings, merge_distance 20, min_size 30;
    pdf_processor.py:248-325).  Deterministic: input order preserved
    through merging, output sorted by (y0, x0)."""
    if not boxes:
        return []

    clusters: list[tuple[Box, int]] = [(b, 1) for b in boxes]
    changed = True
    while changed:
        changed = False
        out: list[tuple[Box, int]] = []
        for box, count in clusters:
            merged = False
            for i, (obox, ocount) in enumerate(out):
                if boxes_overlap(box, obox, margin=merge_distance):
                    out[i] = (merge_boxes(box, obox), count + ocount)
                    merged = True
                    changed = True
                    break
            if not merged:
                out.append((box, count))
        clusters = out

    regions = [
        box
        for box, count in clusters
        if count >= min_members
        and box_size(box)[0] >= min_size
        and box_size(box)[1] >= min_size
    ]
    return sorted(regions, key=lambda r: (r[1], r[0]))


def filter_min_size(boxes: list[Box], min_px: float = 50.0) -> list[Box]:
    """Embedded-image minimum-size filter (reference ≥50 px,
    pdf_processor.py:105-206)."""
    return [b for b in boxes if box_size(b)[0] >= min_px and box_size(b)[1] >= min_px]
