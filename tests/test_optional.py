"""Optional-wheel seam coverage: each test exercises a production seam
(PIL decode, fastText adapter, pyav frame iterator, NLTK sentence-split
parity) through the REAL third-party library, and skips cleanly where the
wheel is absent (this sandbox ships none of them). Run `pytest -m optional`
on an environment that has them."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.optional


def test_pil_decode_seam(spark):
    """decode_image routes non-QIMG jpeg/webp bytes through PIL when the
    wheel exists; a real JPEG must decode to the original pixels within
    the lossy PSNR bar the pipeline enforces (>= 40 dB)."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    from corpusama_spark.io.imagecodec import decode_image, psnr

    rng = np.random.default_rng(3)
    arr = (rng.integers(0, 255, (48, 64, 3))).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=98)
    got = decode_image(buf.getvalue(), "jpeg")
    assert got.shape == arr.shape
    assert psnr(arr, got) >= 30  # quality-98 JPEG of noise; smooth images >= 40
    # corrupt bytes stay a tolerated ValueError, not a crash
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8broken", "jpeg")


def test_fasttext_adapter_seam(spark):
    """With $CORPUSAMA_FASTTEXT_MODEL set, load_model returns the real
    fastText model wrapped in the adapter and labels obvious lines."""
    pytest.importorskip("fasttext")
    if not os.environ.get("CORPUSAMA_FASTTEXT_MODEL"):
        pytest.skip("CORPUSAMA_FASTTEXT_MODEL not set")
    from corpusama_spark.functions.langid import FastTextAdapter, load_model

    model = load_model()
    assert isinstance(model, FastTextAdapter)
    langs, scores = model.predict(
        ["the water supply is restored", "la distribución de alimentos"]
    )
    assert langs[0].startswith("en") and langs[1].startswith("es")
    assert all(0 < s <= 1.0 for s in scores)


def test_pyav_frame_seam(spark):
    """_iter_frames routes non-QVID containers through pyav; a real mp4
    yields every frame, and sample_frames takes every k-th."""
    av = pytest.importorskip("av")
    import io

    import pandas as pd

    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as out:
        stream = out.add_stream("mpeg4", rate=4)
        stream.width, stream.height, stream.pix_fmt = 64, 48, "yuv420p"
        for i in range(6):
            frame = av.VideoFrame.from_ndarray(
                np.full((48, 64, 3), i * 40, dtype=np.uint8), format="rgb24"
            )
            out.mux(stream.encode(frame))
        out.mux(stream.encode())
    from corpusama_spark.functions.imageops import sample_frames

    df = spark.createDataFrame(
        pd.DataFrame({"video_id": ["v1"], "bytes": [buf.getvalue()]})
    )
    rows = sample_frames(df, every_k=2).collect()
    assert [r.frame_no for r in rows] == [0, 2, 4]
    assert all(r.fmt == "png" for r in rows)


def test_nltk_sentence_split_parity(spark):
    """M5 parity: the engine's language-aware rules agree with the
    reference's NLTK sent_tokenize (base_pipeline.py:380-383, nltk_langs
    :46-50) on abbreviation-bearing text for each supported language."""
    nltk = pytest.importorskip("nltk")
    from nltk.tokenize import sent_tokenize

    from corpusama_spark.operators.sentences import NLTK_LANGS, split_sentences

    cases = {
        "en": "Mr. Smith went to Washington. He left today.",
        "fr": "M. Dupont est arrivé. Il part demain.",
        "es": "El Sr. García lo sabe. Llega mañana.",
    }
    for lang, text in cases.items():
        try:
            want = sent_tokenize(text, language=NLTK_LANGS[lang])
        except LookupError:
            pytest.skip("nltk punkt data not downloaded")
        df = spark.createDataFrame([(text,)], ["t"])
        got = df.select(split_sentences(F.col("t"), lang).alias("s")).first().s
        assert got == want, (lang, got, want)
