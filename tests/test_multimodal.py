"""Multimodal binary-column plumbing: deterministic payloads, Arrow-batched
feature/frame kernels, DuckDB oracles, metadata-only column pruning."""

import duckdb
import pytest

from nmalign_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


def _cmp(spark, duck, name):
    sdf = (mm.QUERIES[name](spark, SF).toPandas()
           .sort_values("media_id", kind="mergesort").reset_index(drop=True))
    odf = (duck.execute(mm.ORACLES[name]).fetchdf()
           .sort_values("media_id", kind="mergesort").reset_index(drop=True))
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    return sdf, odf


def test_media_meta_matches_oracle(spark, duck):
    sdf, odf = _cmp(spark, duck, "mm_media_meta")
    for c in sdf.columns:
        assert (sdf[c].values == odf[c].values).all(), c


def test_features_checksums_match(spark, duck):
    sdf, odf = _cmp(spark, duck, "mm_media_features")
    assert (sdf["checksum"].values == odf["checksum"].values).all()
    assert (sdf["n_bytes"] == mm.N_MD5_BLOCKS * 32).all()


def test_frame_sampling_matches_oracle(spark, duck):
    sdf = (mm.QUERIES["mm_frame_sample"](spark, SF).toPandas()
           .sort_values(["media_id", "frame_no"]).reset_index(drop=True))
    odf = (duck.execute(mm.ORACLES["mm_frame_sample"]).fetchdf()
           .sort_values(["media_id", "frame_no"]).reset_index(drop=True))
    assert (sdf["frame_md5"].values == odf["frame_md5"].values).all()
    # every 2nd of 8 frames per video payload
    assert set(sdf["frame_no"].unique()) == {0, 2, 4, 6}


def test_resize_plan_bounds(spark, duck):
    sdf, _ = _cmp(spark, duck, "mm_resize_plan")
    assert (sdf[["out_w", "out_h"]].max(axis=1) <= 256).all()
    assert (sdf[["out_w", "out_h"]].min(axis=1) >= 1).all()


def test_meta_scan_prunes_payload(spark):
    """The metadata-only query must never read the payload bytes: the decoded
    plan's parquet ReadSchema contains only the meta source columns."""
    plan = (mm.QUERIES["mm_media_meta"](spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    # payload (the only consumer of `text`) is dropped, so Catalyst must
    # prune `text` out of the parquet scan entirely
    readschema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert readschema and "text" not in readschema[0]
    assert "n_chars" in readschema[0] and "doc_id" in readschema[0]


def test_decode_gated_when_codec_absent():
    """Without an importable PIL the decode raises the documented
    NotImplementedError (this sandbox ships no imaging library).  If a
    future environment has Pillow, the dispatch path below covers it."""
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow present: absent-path not testable here")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG....")


def test_decode_dispatches_to_pil_when_present(monkeypatch):
    """The moment a codec is importable, decode_image must return the
    RGB ndarray PIL produces — proven with a minimal in-memory PIL stand-
    in so the dispatch contract (open -> convert('RGB') -> asarray, file
    handle closed) is exercised even in this codec-less sandbox."""
    import sys
    import types

    import numpy as np

    class _FakeImage:
        def __init__(self, buf):
            self.buf = buf
            self.closed = False

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            self.closed = True

        def convert(self, mode):
            assert mode == "RGB"
            # 1x N x 3: derived from the payload bytes, shape-checkable
            data = list(self.buf.getvalue()[:6])
            return np.array(data, dtype=np.uint8).reshape(1, 2, 3)

        def __array__(self, dtype=None, copy=None):
            raise AssertionError("asarray must receive convert()'s output")

    fake_image_mod = types.SimpleNamespace(open=_FakeImage)
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    out = mm.decode_image(bytes([10, 20, 30, 40, 50, 60, 99]))
    assert out.shape == (1, 2, 3) and out.dtype == np.uint8
    assert out.flatten().tolist() == [10, 20, 30, 40, 50, 60]
