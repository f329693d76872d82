"""Import-gated Pillow codec integration: runs ONLY when Pillow is
installed (this container ships without it, so the module records skips);
the Pillow-ABSENT branch — factories raising ImportError with the install
hint — is pinned unconditionally in tests/test_operators.py, and the seam
contract itself is pinned with fake codecs there. On a cluster image with
Pillow these tests drive real PNG/JPEG payloads through the SAME
``decoder=`` / ``resizer=`` seams with zero code changes."""

from __future__ import annotations

import pytest

PIL = pytest.importorskip("PIL")


def _png_payload(w: int = 8, h: int = 6, color=(10, 200, 30)) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


class TestPillowSeam:
    def test_decoder_extracts_real_png_features(self, spark):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            multimodal,
        )

        df = spark.createDataFrame(
            [(1, _png_payload()), (2, _png_payload(16, 4, (0, 0, 255)))],
            "doc_id long, payload binary")
        out = {r.doc_id: r.features for r in multimodal.extract_features(
            df, decoder=multimodal.pillow_feature_decoder()).collect()}
        # [width, height, mean_r, mean_g, mean_b, std_r, std_g, std_b]
        assert out[1][:2] == [8.0, 6.0]
        assert out[1][2:5] == [10.0, 200.0, 30.0]
        assert out[2][:2] == [16.0, 4.0]
        assert out[2][4] == 255.0

    def test_resizer_resamples_real_png(self, spark):
        import io

        from PIL import Image

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            multimodal,
        )

        df = spark.createDataFrame(
            [(1, _png_payload(32, 32))], "doc_id long, payload binary")
        out = multimodal.resize_assets(
            df, target=(4, 4),
            resizer=multimodal.pillow_resizer((4, 4))).first()
        assert (out.width, out.height) == (4, 4)
        img = Image.open(io.BytesIO(bytes(out.payload)))
        assert img.size == (4, 4)
