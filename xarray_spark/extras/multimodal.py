"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode kernels need codec libraries (PIL/ffmpeg/torchaudio) that are
NOT in this container — they are stubbed behind deterministic fakes /
NotImplementedError.  Everything Spark-side is real and tested: schemas,
partition-aware batching, mapInPandas signatures, and the
feature-extraction pipeline shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("data", T.BinaryType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("n_bytes", T.LongType()),
])


def _fake_decode(data: bytes) -> list[float]:
    """Deterministic stand-in for a real image decode + embed: hashes the
    bytes into a fixed-length pseudo-feature.  REPLACE with a real codec
    (PIL + model) when the runtime has one."""
    h = 1469598103934665603
    for by in data[:4096]:
        h = ((h ^ by) * 1099511628211) % (1 << 64)
    out = []
    state = h
    for _ in range(8):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(((state >> 40) / float(1 << 23)) - 1.0)
    return out


def extract_features(df: DataFrame, data_col: str = "data", id_col: str = "media_id",
                     batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    mapInPandas so each Python worker sees whole record batches (no
    per-row serde); at scale, repartition first so batches are
    size-bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(x)) if x is not None else None
                for x in pdf[data_col]
            ]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "feature": feats,
                "n_bytes": [len(bytes(x)) if x is not None else 0 for x in pdf[data_col]],
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("pixels", T.ArrayType(T.FloatType())),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def _fake_pixels(data: bytes, width: int, height: int, channels: int = 3):
    """Deterministic stand-in for the CODEC KERNEL ONLY (libjpeg/PIL is
    not in this runtime): an LCG seeded by the payload hash emits a
    plausible float32 pixel buffer.  The mapInPandas plumbing around it
    is the real pipeline."""
    import numpy as np
    h = 1469598103934665603
    for by in data[:1024]:
        h = ((h ^ by) * 1099511628211) % (1 << 64)
    n = width * height * channels
    out = np.empty(n, dtype="float64")
    a, c = np.uint64(6364136223846793005), np.uint64(1442695040888963407)
    with np.errstate(over="ignore"):  # uint64 LCG wraps by design
        state = np.uint64(h | 1)
        for i in range(n):
            state = state * a + c
            out[i] = float(state >> np.uint64(40)) / float(1 << 24)
    return out.astype("float32")


def decode_image(df: DataFrame, data_col: str = "data", id_col: str = "media_id",
                 width_col: str = "width", height_col: str = "height") -> DataFrame:
    """Image decode: binary payload → flat float32 pixel buffer
    (media_id, width, height, channels, pixels).

    The Spark side is real — Arrow record batches through mapInPandas,
    one output row per image, size-bounded by arrow.maxRecordsPerBatch.
    The codec kernel uses PIL when the runtime has it and otherwise the
    clearly-marked deterministic fake (_fake_pixels)."""
    try:  # pragma: no cover - PIL absent in this runtime
        from PIL import Image  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io

        import numpy as np
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [],
                    "channels": [], "pixels": []}
            for _, r in pdf.iterrows():
                data = bytes(r[data_col]) if r[data_col] is not None else b""
                w, h = int(r[width_col]), int(r[height_col])
                if have_pil:  # pragma: no cover
                    from PIL import Image
                    img = np.asarray(Image.open(_io.BytesIO(data)).convert("RGB"))
                    h, w, ch = img.shape
                    px = (img.astype("float32") / 255.0).ravel()
                else:
                    ch = 3
                    px = _fake_pixels(data, w, h, ch)
                rows["media_id"].append(r[id_col])
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["pixels"].append(px)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, DECODED_SCHEMA)


def resize_image(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Bilinear resize of decoded pixel buffers — REAL numpy math (no
    codec needed), Arrow-batched: each image's flat buffer reshapes to
    (h, w, c), samples on the target grid with bilinear weights, and
    flattens back.  Output schema matches DECODED_SCHEMA with the new
    dimensions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            out_px = []
            for _, r in pdf.iterrows():
                w, h, ch = int(r["width"]), int(r["height"]), int(r["channels"])
                img = np.asarray(r["pixels"], dtype="float32").reshape(h, w, ch)
                ys = np.linspace(0, h - 1, out_h)
                xs = np.linspace(0, w - 1, out_w)
                y0 = np.floor(ys).astype(int); y1 = np.minimum(y0 + 1, h - 1)
                x0 = np.floor(xs).astype(int); x1 = np.minimum(x0 + 1, w - 1)
                wy = (ys - y0)[:, None, None]; wx = (xs - x0)[None, :, None]
                top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
                bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
                out_px.append(((1 - wy) * top + wy * bot).astype("float32").ravel())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": out_w, "height": out_h,
                "channels": pdf["channels"],
                "pixels": out_px,
            })

    return decoded.mapInPandas(run, DECODED_SCHEMA)


def frame_sample(df: DataFrame, data_col: str = "data", id_col: str = "media_id",
                 every_n: int = 30, frame_bytes: int = 1024) -> DataFrame:
    """Video frame sampling: one row per kept frame
    (media_id, frame_idx, frame).

    The demux kernel is the stub — without ffmpeg the payload is split
    into fixed-size pseudo-frames (``frame_bytes``); with ffmpeg
    bindings, replace ``_demux``.  The sampling logic (keep every Nth
    frame), the row explosion, and the Arrow batch shape are the real
    pipeline and survive a codec swap unchanged."""

    def _demux(data: bytes) -> list[bytes]:
        # ffmpeg call point — fixed-size split stands in for the demuxer
        return [data[i:i + frame_bytes]
                for i in range(0, len(data), frame_bytes)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, r in pdf.iterrows():
                data = bytes(r[data_col]) if r[data_col] is not None else b""
                for i, fr in enumerate(_demux(data)):
                    if i % every_n == 0:
                        ids.append(r[id_col]); idxs.append(i); frames.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return df.mapInPandas(run, FRAME_SCHEMA)


def synth_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads)."""
    rows = [
        (i, bytes([(i * 37 + j) % 256 for j in range(128 + (i % 5) * 32)]), "fake", 16, 16)
        for i in range(n)
    ]
    # Arrow local path: the JVM reads the batches directly — the
    # pickled-slice route cost one Python-worker handshake per
    # defaultParallelism slice, SERIALIZED by the old coalesce()
    # (measured 2.5 s at local[32] for 32 rows vs 0.09 s here)
    from xarray_spark._utils import local_df
    return local_df(spark, rows, IMAGE_SCHEMA)


# --------------------------------------------------------------------- #
# audio: raw-PCM decode is REAL (no codec library needed for PCM16);
# compressed formats (mp3/aac/flac) are the stubbed kernel.
# --------------------------------------------------------------------- #

AUDIO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("data", T.BinaryType()),
    T.StructField("format", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
])

DECODED_AUDIO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("samples", T.ArrayType(T.DoubleType())),
    T.StructField("sample_rate", T.IntegerType()),
])

AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
])


def decode_audio(df: DataFrame, data_col: str = "data", id_col: str = "media_id",
                 format_col: str = "format",
                 rate_col: str = "sample_rate") -> DataFrame:
    """Decode audio payloads to normalized float64 sample arrays.

    ``pcm16``: REAL decode — little-endian int16 → x/32768, exact
    numpy math, no codec library involved (a trailing odd byte is
    dropped).  Compressed formats are the codec kernel this runtime
    cannot supply: they raise NotImplementedError at the decode point;
    the Arrow batching, schema, and downstream feature pipeline are
    format-agnostic and survive a codec swap unchanged."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_s, out_r = [], [], []
            for _, r in pdf.iterrows():
                fmt = r[format_col]
                if fmt != "pcm16":
                    raise NotImplementedError(
                        f"audio codec {fmt!r} needs ffmpeg/torchaudio; "
                        "only raw pcm16 decodes in this runtime")
                data = bytes(r[data_col]) if r[data_col] is not None else b""
                usable = len(data) - (len(data) % 2)
                x = np.frombuffer(data[:usable], dtype="<i2").astype("float64")
                out_id.append(r[id_col])
                out_s.append(x / 32768.0)
                out_r.append(r[rate_col])
            yield pd.DataFrame({"media_id": out_id, "samples": out_s,
                                "sample_rate": out_r})

    return df.mapInPandas(run, DECODED_AUDIO_SCHEMA)


def audio_features(decoded: DataFrame, frame_len: int = 32,
                   samples_col: str = "samples",
                   id_col: str = "media_id") -> DataFrame:
    """Per-frame RMS energy and zero-crossing rate over non-overlapping
    ``frame_len``-sample frames (partial tail frames dropped) — the
    standard first-pass audio quality/VAD features, all exact numpy.

    Scale shape: one Arrow batch in, a frame-exploded batch out — the
    explosion happens inside the Python worker, so Spark shuffles frame
    ROWS (3 scalars each), never sample arrays."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, rms_o, zcr_o = [], [], [], []
            for _, r in pdf.iterrows():
                x = np.asarray(r[samples_col], dtype="float64")
                n_frames = len(x) // frame_len
                if n_frames == 0:
                    continue
                fr = x[: n_frames * frame_len].reshape(n_frames, frame_len)
                rms = np.sqrt((fr * fr).mean(axis=1))
                signchg = (fr[:, 1:] * fr[:, :-1]) < 0
                zcr = signchg.sum(axis=1) / float(frame_len - 1)
                for k in range(n_frames):
                    ids.append(r[id_col]); idxs.append(k)
                    rms_o.append(float(rms[k])); zcr_o.append(float(zcr[k]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "rms": rms_o, "zcr": zcr_o})

    return decoded.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def synth_audio_table(spark, n: int = 32) -> DataFrame:
    """Deterministic fake audio table: byte j of media i is
    (i*37 + j) % 256 — closed form, so an external oracle can re-derive
    every PCM sample without touching the blob."""
    rows = [
        (i, bytes([(i * 37 + j) % 256 for j in range(128 + (i % 5) * 32)]),
         "pcm16", 16000)
        for i in range(n)
    ]
    from xarray_spark._utils import local_df
    return local_df(spark, rows, AUDIO_SCHEMA)
