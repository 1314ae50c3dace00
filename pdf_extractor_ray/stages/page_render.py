"""Page-image save (S3) and region-as-image render (S5).

The reference rasterizes PDF pages with PyMuPDF at a zoom factor and
writes ``page_{n:03d}.png`` files (convert_page_to_image /
save_page_image / convert_all_pages,
/root/reference/src/pdf_processor.py:35-102), and renders padded
clipped regions around detected figure bboxes
(extract_region_as_image, pdf_processor.py:208-246).

The rebuild keeps ALL of the plumbing real — page geometry parsed
from the payload (MediaBox), the reference's zoom/clip pixel math,
genuine PNG container bytes, small-batch binary rows, a distributed
file sink with the reference's ``page_%03d.png`` naming — and stubs
only the rasterizer itself: PyMuPDF does not ship in this container,
so ``real_render`` raises and the deterministic ``fake_raster`` path
(pixels derived from a payload digest) is what tests and benchmarks
exercise.  Swap ``real_render`` in for production PDFs.
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib

import numpy as np
import pyarrow as pa

# Reference renders at Matrix(zoom, zoom); its config default is 2.0.
DEFAULT_ZOOM = 2.0
# extract_region_as_image pads the clip rect in PDF coordinate space
# (pdf_processor.py:232-234) before applying the zoom matrix.
DEFAULT_PADDING = 10.0

_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s*\]"
)
# A /Type/Page object (not /Pages); one per rendered page.
_PAGE_OBJ_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")

PAGE_IMAGE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("page_num", pa.int32()),  # 1-indexed like the reference
        ("width_px", pa.int32()),
        ("height_px", pa.int32()),
        ("image", pa.binary()),  # PNG bytes
    ]
)

REGION_IMAGE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("page_num", pa.int32()),
        ("figure_id", pa.string()),  # "img:x0,y0,x1,y1" | "region:..."
        ("width_px", pa.int32()),
        ("height_px", pa.int32()),
        ("image", pa.binary()),
    ]
)


# --------------------------------------------------------------------------
# PNG container (stdlib-only, fully valid: any PNG reader opens these)
# --------------------------------------------------------------------------

def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_gray(pixels: np.ndarray) -> bytes:
    """8-bit grayscale PNG from an (h, w) uint8 array."""
    h, w = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # filter byte 0 prepended to every scanline
    raw = np.hstack([np.zeros((h, 1), dtype=np.uint8), pixels]).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png_gray(png: bytes) -> np.ndarray:
    """Inverse of encode_png_gray (tests verify a true round-trip)."""
    if png[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat = 8, b""
    w = h = 0
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
            if (depth, color) != (8, 0):
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += data
        pos += 12 + length
    rows = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w + 1)
    if rows[:, 0].any():
        raise ValueError("only filter type 0 supported")
    return rows[:, 1:]


# --------------------------------------------------------------------------
# geometry + rasterizer
# --------------------------------------------------------------------------

def page_geometry(raw: str) -> list[tuple[float, float]]:
    """(width_pt, height_pt) per page, in document order.

    MediaBox is taken per page object where present; a document-level
    MediaBox (or none) falls back to US Letter 612x792 like PyMuPDF's
    default page rect."""
    data = raw.encode("latin-1", errors="replace")
    n_pages = len(_PAGE_OBJ_RE.findall(data))
    if n_pages == 0:
        return []
    boxes = [
        (float(m.group(3)) - float(m.group(1)), float(m.group(4)) - float(m.group(2)))
        for m in _MEDIABOX_RE.finditer(data)
    ]
    if not boxes:
        boxes = [(612.0, 792.0)]
    # cycle the last box for pages without their own MediaBox
    return [boxes[min(i, len(boxes) - 1)] for i in range(n_pages)]


def _pix_dims(w_pt: float, h_pt: float, zoom: float) -> tuple[int, int]:
    """Pixmap dims for Matrix(zoom, zoom): PyMuPDF rounds the scaled
    rect to an integer rect (irect)."""
    return max(1, int(round(w_pt * zoom))), max(1, int(round(h_pt * zoom)))


def real_render(
    raw: str,
    page_num: int,
    zoom: float,
    clip: tuple[float, float, float, float] | None = None,
):  # pragma: no cover — exercised only where PyMuPDF is installed
    """Production rasterizer: PyMuPDF ``get_pixmap`` at
    ``Matrix(zoom, zoom)`` (the reference's 300-DPI path,
    /root/reference/src/pdf_processor.py:35-61), grayscale to match
    the stub's PNG container contract.  Raises NotImplementedError
    when fitz is absent (this container); the importorskip module
    tests/test_real_codec_seams.py drives this path the day the
    dependency appears."""
    try:
        import fitz  # PyMuPDF
    except ImportError as e:
        raise NotImplementedError(
            "PyMuPDF not available in this environment; real_render needs "
            "fitz.open + page.get_pixmap(matrix=fitz.Matrix(zoom, zoom))"
        ) from e
    doc = fitz.open(stream=raw.encode("latin-1", errors="replace"), filetype="pdf")
    try:
        page = doc[page_num - 1]
        kwargs = {"matrix": fitz.Matrix(zoom, zoom), "colorspace": fitz.csGRAY}
        if clip is not None:
            kwargs["clip"] = fitz.Rect(*clip)
        pix = page.get_pixmap(**kwargs)
        return pix.tobytes("png"), pix.width, pix.height
    finally:
        doc.close()


def fake_raster(seed: bytes, w_px: int, h_px: int) -> np.ndarray:
    """Deterministic stand-in pixels: a digest-seeded gradient tile.
    Cheap (vectorized), stable across runs, and distinct per payload —
    keeps checksum-style tests meaningful without a real rasterizer."""
    base = np.frombuffer(
        hashlib.blake2b(seed, digest_size=32).digest(), dtype=np.uint8
    )
    col = np.resize(base, w_px).astype(np.uint16)
    rows = (col[None, :] + np.arange(h_px, dtype=np.uint16)[:, None]) & 0xFF
    return rows.astype(np.uint8)


def render_page(
    raw: str, page_num: int, *, zoom: float = DEFAULT_ZOOM, use_real: bool = False
) -> tuple[bytes, int, int]:
    """S3: one page -> (png_bytes, width_px, height_px).  1-indexed
    page_num like the reference."""
    geom = page_geometry(raw)
    if not 1 <= page_num <= len(geom):
        raise IndexError(f"page {page_num} of {len(geom)}")
    if use_real:
        return real_render(raw, page_num, zoom)  # raises unless fitz present
    w_pt, h_pt = geom[page_num - 1]
    w_px, h_px = _pix_dims(w_pt, h_pt, zoom)
    seed = raw.encode("latin-1", errors="replace") + b"|page|%d" % page_num
    return encode_png_gray(fake_raster(seed, w_px, h_px)), w_px, h_px


def render_region(
    raw: str,
    page_num: int,
    bbox: tuple[float, float, float, float],
    *,
    zoom: float = DEFAULT_ZOOM,
    padding: float = DEFAULT_PADDING,
    use_real: bool = False,
) -> tuple[bytes, int, int]:
    """S5: clip rect = bbox padded in PDF points, then zoomed — the
    reference's fitz.Rect(x0-p, y0-p, x1+p, y1+p) + Matrix(zoom, zoom)
    math (pdf_processor.py:229-241)."""
    x0, y0, x1, y1 = bbox
    if use_real:
        p = padding
        return real_render(
            raw, page_num, zoom, clip=(x0 - p, y0 - p, x1 + p, y1 + p)
        )
    w_px, h_px = _pix_dims((x1 - x0) + 2 * padding, (y1 - y0) + 2 * padding, zoom)
    seed = raw.encode("latin-1", errors="replace") + (
        b"|region|%d|%.1f,%.1f,%.1f,%.1f" % (page_num, x0, y0, x1, y1)
    )
    return encode_png_gray(fake_raster(seed, w_px, h_px)), w_px, h_px


# --------------------------------------------------------------------------
# Ray stages (map_batches callables) + distributed sink
# --------------------------------------------------------------------------

def _parse_figure_id(fid: str) -> tuple[float, float, float, float]:
    coords = fid.split(":", 1)[1]
    x0, y0, x1, y1 = (float(v) for v in coords.split(","))
    return x0, y0, x1, y1


class PageRenderer:
    """map_batches stage: transcript turn rows -> one row per rendered
    page (PAGE_IMAGE_SCHEMA).  Non-PDF / unparseable payloads yield no
    rows (graceful degradation, like extract_pdf).

    Callers MUST pass a small ``batch_size`` (<=64): output rows carry
    whole page rasters — a 1224x1584 page is ~2 MB uncompressed before
    the PNG deflate — and Ray's dynamic block splitting only bounds
    BLOCK size, not the single batch a task holds in heap."""

    def __init__(
        self,
        zoom: float = DEFAULT_ZOOM,
        use_real_codec: bool = False,
        kind_col: str = "tool",
        payload_col: str = "text",
    ):
        self.zoom = zoom
        self.use_real_codec = use_real_codec
        self.kind_col = kind_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        convs, turns, pages, widths, heights, images = [], [], [], [], [], []
        for conv, turn, kind, raw in zip(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column(self.kind_col).to_pylist(),
            batch.column(self.payload_col).to_pylist(),
        ):
            if kind != "pdf" or not raw:
                continue
            for p in range(1, len(page_geometry(raw)) + 1):
                png, w, h = render_page(
                    raw, p, zoom=self.zoom, use_real=self.use_real_codec
                )
                convs.append(conv)
                turns.append(turn)
                pages.append(p)
                widths.append(w)
                heights.append(h)
                images.append(png)
        return pa.table(
            {
                "conv_id": pa.array(convs, pa.string()),
                "turn_idx": pa.array(turns, pa.int32()),
                "page_num": pa.array(pages, pa.int32()),
                "width_px": pa.array(widths, pa.int32()),
                "height_px": pa.array(heights, pa.int32()),
                "image": pa.array(images, pa.binary()),
            }
        )


class RegionRenderer:
    """map_batches stage: turn rows -> one row per detected figure
    region rendered as a padded clip (REGION_IMAGE_SCHEMA).  Figure
    bboxes come from the S4/S6/S7 detector (extract_pdf_figures), so
    this is exactly the reference's extract_figure_regions loop
    (pdf_processor.py:327-366) as a distributed batch transform."""

    def __init__(
        self,
        zoom: float = DEFAULT_ZOOM,
        padding: float = DEFAULT_PADDING,
        use_real_codec: bool = False,
        kind_col: str = "tool",
        payload_col: str = "text",
    ):
        from ..functions.pdfx import extract_pdf_figures

        self.zoom = zoom
        self.padding = padding
        self.use_real_codec = use_real_codec
        self.kind_col = kind_col
        self.payload_col = payload_col
        self._detect = extract_pdf_figures

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in REGION_IMAGE_SCHEMA.names}
        for conv, turn, kind, raw in zip(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column(self.kind_col).to_pylist(),
            batch.column(self.payload_col).to_pylist(),
        ):
            if kind != "pdf" or not raw:
                continue
            # figure bboxes carry no page attribution in the detector's
            # id string; the synthetic lake is single-page, so clips
            # render against page 1 (multi-page payloads would thread a
            # page field through extract_pdf_figures here)
            for fid in self._detect(raw):
                png, w, h = render_region(
                    raw,
                    1,
                    _parse_figure_id(fid),
                    zoom=self.zoom,
                    padding=self.padding,
                    use_real=self.use_real_codec,
                )
                out["conv_id"].append(conv)
                out["turn_idx"].append(turn)
                out["page_num"].append(1)
                out["figure_id"].append(fid)
                out["width_px"].append(w)
                out["height_px"].append(h)
                out["image"].append(png)
        return pa.Table.from_pydict(out, schema=REGION_IMAGE_SCHEMA)


def write_page_images(ds, out_dir: str) -> pa.Table:
    """Distributed S3 sink: each task writes its own
    ``{out_dir}/{conv_id}/page_{page:03d}.png`` files (the reference's
    convert_all_pages naming, pdf_processor.py:96-100) and emits only
    a small manifest row per file — the driver never holds image
    bytes.  Returns the manifest (conv_id, turn_idx, page_num, path,
    n_bytes) as a table."""
    import os

    def write_batch(batch: pa.Table) -> pa.Table:
        paths, sizes = [], []
        for conv, turn, page, png in zip(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column("page_num").to_pylist(),
            batch.column("image").to_pylist(),
        ):
            d = os.path.join(out_dir, conv)
            os.makedirs(d, exist_ok=True)
            # turn_idx disambiguates multi-PDF conversations while
            # keeping the reference's page_%03d stem
            path = os.path.join(d, f"t{turn:04d}_page_{page:03d}.png")
            with open(path, "w+b") as f:
                f.write(png)
            paths.append(path)
            sizes.append(len(png))
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "page_num": batch.column("page_num"),
                "path": pa.array(paths, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
            }
        )

    manifest = ds.map_batches(write_batch, batch_format="pyarrow", batch_size=32)
    batches = list(manifest.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:  # no PDF payloads in the lake → empty manifest, not a crash
        # same columns as the non-empty manifest (incl. turn_idx) so a
        # PDF-free lake doesn't hand callers a divergent schema
        return pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("page_num", pa.int32()),
                ("path", pa.string()),
                ("n_bytes", pa.int64()),
            ]
        ).empty_table()
    return pa.concat_tables(batches, promote_options="permissive")
