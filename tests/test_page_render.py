"""S3 page-image save / S5 region render (stages/page_render.py) —
reference pdf_processor.py:35-102 (convert_page_to_image,
save_page_image, convert_all_pages) and :208-246
(extract_region_as_image)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from pdf_extractor_ray.datagen import make_pdf
from pdf_extractor_ray.stages.page_render import (
    DEFAULT_PADDING,
    DEFAULT_ZOOM,
    PageRenderer,
    RegionRenderer,
    decode_png_gray,
    encode_png_gray,
    fake_raster,
    page_geometry,
    render_page,
    render_region,
    write_page_images,
)

PDF = make_pdf(["alpha beta gamma", "second paragraph here"])
PDF_FIGS = make_pdf(
    ["figure doc"],
    images=[(100, 500, 120, 90)],  # ≥50px — kept
    rects=[(50, 50, 40, 40), (95, 50, 40, 40), (50, 95, 40, 40), (95, 95, 40, 40)],
)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=257),
        h=st.integers(min_value=1, max_value=61),
        seed=st.binary(min_size=0, max_size=64),
    )
    def test_png_roundtrip_property(w, h, seed):
        pix = fake_raster(seed, w, h)
        assert np.array_equal(decode_png_gray(encode_png_gray(pix)), pix)

except ImportError:  # pragma: no cover
    pass


def test_png_roundtrip_exact():
    pix = fake_raster(b"seed", 37, 11)
    png = encode_png_gray(pix)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    back = decode_png_gray(png)
    assert back.shape == (11, 37)
    assert np.array_equal(back, pix)


def test_page_geometry_letter():
    assert page_geometry(PDF) == [(612.0, 792.0)]
    assert page_geometry("not a pdf") == []


def test_render_page_zoom_dims_and_determinism():
    png, w, h = render_page(PDF, 1)
    # PyMuPDF irect math: 612x792 pt at zoom 2.0 -> 1224x1584 px
    assert (w, h) == (612 * 2, 792 * 2)
    assert decode_png_gray(png).shape == (h, w)
    png2, _, _ = render_page(PDF, 1)
    assert png == png2  # deterministic
    other, _, _ = render_page(PDF_FIGS, 1)
    assert other != png  # payload-dependent
    with pytest.raises(IndexError):
        render_page(PDF, 2)


def test_render_region_padding_math():
    # clip = bbox padded by 10pt each side, then zoomed 2x
    png, w, h = render_region(PDF_FIGS, 1, (100.0, 500.0, 220.0, 590.0))
    assert (w, h) == (
        round((120 + 2 * DEFAULT_PADDING) * DEFAULT_ZOOM),
        round((90 + 2 * DEFAULT_PADDING) * DEFAULT_ZOOM),
    )
    assert decode_png_gray(png).shape == (h, w)


def test_real_codec_is_honest_stub():
    try:
        import fitz  # noqa: F401

        pytest.skip("fitz present — real path covered by test_real_codec_seams.py")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        render_page(PDF, 1, use_real=True)


@pytest.mark.usefixtures("ray_session")
def test_page_and_region_stages(tmp_path):
    import ray

    rows = pa.table(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "tool": ["pdf", "html", "pdf"],
            "text": [PDF, "<html><body>x</body></html>", PDF_FIGS],
        }
    )
    ds = ray.data.from_arrow(rows)

    pages = ds.map_batches(
        PageRenderer(zoom=0.5), batch_format="pyarrow", batch_size=32
    )
    got = pa.concat_tables(list(pages.iter_batches(batch_format="pyarrow")))
    # only the two pdf turns render; html is skipped
    assert got.num_rows == 2
    assert set(got.column("conv_id").to_pylist()) == {"c1", "c2"}
    assert got.column("page_num").to_pylist() == [1, 1]
    assert got.column("width_px").to_pylist() == [306, 306]  # 612 * 0.5

    regions = ds.map_batches(
        RegionRenderer(zoom=1.0), batch_format="pyarrow", batch_size=32
    )
    rg = pa.concat_tables(list(regions.iter_batches(batch_format="pyarrow")))
    # PDF_FIGS plants one keepable image + one 4-rect cluster region
    fids = rg.column("figure_id").to_pylist()
    assert any(f.startswith("img:") for f in fids)
    assert any(f.startswith("region:") for f in fids)
    for fid, w, h, png in zip(
        fids,
        rg.column("width_px").to_pylist(),
        rg.column("height_px").to_pylist(),
        rg.column("image").to_pylist(),
    ):
        assert decode_png_gray(png).shape == (h, w)

    # distributed sink: reference page_%03d naming, manifest == files
    out = str(tmp_path / "imgs")
    manifest = write_page_images(pages, out)
    assert manifest.num_rows == 2
    for path, n in zip(
        manifest.column("path").to_pylist(), manifest.column("n_bytes").to_pylist()
    ):
        assert os.path.exists(path)
        assert os.path.getsize(path) == n
        assert os.path.basename(path) == "t0000_page_001.png"
