"""Multimodal plumbing: codec roundtrip, PSNR invariant (input_hint:
decoded-pixel PSNR ≥ 40 dB for lossy + caption equality), phash
reproducibility, resize/frame-sample batch shapes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark import multimodal as mm
from crawler_spark.synth import SynthConfig, corpus_df, gen_all


@pytest.fixture(scope="module")
def web(spark):
    cfg = SynthConfig(n_pages=120, n_hosts=5, with_images=True)
    df = corpus_df(spark, cfg).persist()
    df.count()
    return cfg, df


def test_codec_roundtrip_psnr():
    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, size=(64, 32), dtype=np.uint8)
    loss = mm.sgi_decode(mm.sgi_encode(pix, "jpeg"))[0]
    assert mm.psnr(pix, loss) >= 40.0  # lossy invariant
    exact = mm.sgi_decode(mm.sgi_encode(pix, "png"))[0]
    assert np.array_equal(exact, pix)
    assert mm.psnr(pix, exact) == float("inf")


def test_decode_stats_distributed(spark, web):
    cfg, df = web
    out = mm.decode_stats(df)
    rows = out.collect()
    assert len(rows) == cfg.n_pages
    meta = {r.image_id: (r.dec_w, r.dec_h, r.dec_fmt) for r in rows}
    for r in df.select("image_id", "w", "h", "fmt").collect():
        assert meta[r.image_id] == (r.w, r.h, r.fmt)


def test_psnr_invariant_vs_generator(spark, web):
    """Per-row invariant of the input_hint: decoded pixels of every
    corpus row reconstruct within PSNR≥40dB of the pre-encode pixels
    (exact for png; quantized for jpeg) and captions match exactly."""
    cfg, df = web
    pdf = gen_all(cfg)  # driver-side regeneration == the 'reference' rows
    spark_rows = {r.image_id: r for r in df.select("image_id", "bytes", "caption", "fmt").collect()}
    for _, ref in pdf.head(30).iterrows():
        got = spark_rows[ref.image_id]
        assert got.caption == ref.caption
        pix_got, fmt = mm.sgi_decode(bytes(got.bytes))
        pix_ref, _ = mm.sgi_decode(bytes(ref["bytes"]))
        assert fmt == ref.fmt
        assert mm.psnr(pix_got, pix_ref) == float("inf")  # same deterministic source


def test_phash_recompute_matches_column(spark, web):
    cfg, df = web
    joined = mm.phash_udf_frame(df).join(df.select("image_id", "phash"), "image_id")
    bad = joined.filter(F.col("phash") != F.col("phash2")).count()
    assert bad == 0


def test_resize_shapes(spark, web):
    cfg, df = web
    out = mm.resize_images(df.limit(10), 16, 16).collect()
    assert len(out) == 10
    for r in out:
        pix, fmt = mm.sgi_decode(bytes(r.bytes))
        assert pix.shape == (16, 16)


def test_frame_sample_plumbing(spark, web):
    cfg, df = web
    out = mm.frame_sample(df.limit(5)).collect()
    assert len(out) == 5
    assert all(r.frame_idx == 0 for r in out)


def test_decode_rejects_foreign_format():
    with pytest.raises(NotImplementedError):
        mm.sgi_decode(b"\x89PNG\r\n\x1a\nxxxxxxxx")


def test_image_neardup_pipeline_matches_column_path(spark):
    """decode→recomputed-phash→banded pairs must equal the pairs computed
    from the corpus's stored phash column — the bytes path and the
    column path are the same function of the data."""
    from pyspark.sql import functions as F

    from crawler_spark.multimodal.images import phash_udf_frame
    from crawler_spark.operators.dedup import phash_neardup_pairs
    from crawler_spark.synth import SynthConfig, corpus_df

    cfg = SynthConfig(n_pages=300, n_hosts=6, with_images=True)
    corpus = corpus_df(spark, cfg).persist()
    corpus.count()
    from_bytes = phash_neardup_pairs(
        phash_udf_frame(corpus.select("image_id", "bytes")),
        "phash2", "image_id", max_hamming=12,
    )
    from_column = phash_neardup_pairs(
        corpus.select("image_id", "phash"), "phash", "image_id", max_hamming=12
    )
    a = {(r.id_a, r.id_b, r.hamming) for r in from_bytes.collect()}
    b = {(r.id_a, r.id_b, r.hamming) for r in from_column.collect()}
    assert a == b
    assert a, "near-dup pair set must be non-vacuous"
    corpus.unpersist()
