"""Multimodal columns: opaque binary payloads + Arrow-batched decode plumbing.

Design (per the scale brief): image/audio/video travel as `binary` columns
with typed metadata beside them; decode / feature-extract / resize /
frame-sample run as Pandas functions over mapInPandas — Arrow batch
transfer, never row-at-a-time Python. The actual codec step is STUBBED
(image/audio libs are not in this container): `decode_image` raises
NotImplementedError unless PIL is importable, and the tested operators use
a deterministic fake decode so the Spark-side plumbing — schema, batch
shape, UDF signature, fan-out rows — is real and oracle-checked.

Scale posture: binary payloads dominate bytes at 100 TB — operators must
never shuffle the blob. Both operators here are narrow maps (mapInPandas)
emitting compact metadata/rows; the blob never leaves its input partition
and is pruned from every downstream plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

IMAGE_META_SCHEMA = ("doc_id bigint, n_bytes bigint, width int, height int, "
                     "channels int, format string")
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_md5 string"

_FORMATS = ["jpeg", "png", "webp"]


def with_binary_payload(docs: DataFrame, text_col: str = "text",
                        payload_col: str = "payload") -> DataFrame:
    """Attach a `binary` payload column (UTF-8 bytes of the text — the
    deterministic stand-in for real image/audio bytes)."""
    return docs.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8"))


def decode_image(payload: bytes):
    """Real decode path — stub. The container has no imaging libs; a real
    deployment swaps this for PIL/torchvision inside the same mapInPandas
    operators below."""
    try:
        from PIL import Image  # noqa: F401
        import io
        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires PIL; install pillow to enable the real "
            "decode path (deterministic fake decode is used in tests)") from exc


def image_meta(docs_with_payload: DataFrame,
               payload_col: str = "payload") -> DataFrame:
    """Fake-decode image metadata from the payload, Arrow-batched.

    Deterministic fake: width/height/format derived arithmetically from the
    byte length (a real decoder reads the codec header — same plumbing).
    Output: (doc_id, n_bytes, width, height, channels, format).
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[payload_col].map(len)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": n,
                "width": (n % 640 + 1).astype("int32"),
                "height": (n * 7 % 480 + 1).astype("int32"),
                "channels": 3,
                "format": (n % 3).map(lambda i: _FORMATS[i]),
            })
    return (docs_with_payload.select("doc_id", payload_col)
            .mapInPandas(fn, IMAGE_META_SCHEMA))


RESIZE_SCHEMA = ("doc_id bigint, width int, height int, "
                 "out_width int, out_height int")
AUDIO_SCHEMA = ("doc_id bigint, n_samples bigint, duration_ms bigint, "
                "rms_x1000 bigint")


def resize_plan(meta: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize planning over decoded image metadata:
    out = dims scaled so max(side) == max_side (integer arithmetic — the
    actual pixel resample is the PIL step stubbed in decode_image).
    Input needs (doc_id, width, height)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h = pdf["width"], pdf["height"]
            long_side = w.where(w >= h, h)
            ow = (w * max_side // long_side).astype("int32")
            oh = (h * max_side // long_side).astype("int32")
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "width": w,
                                "height": h, "out_width": ow,
                                "out_height": oh})
    return meta.select("doc_id", "width", "height").mapInPandas(
        fn, RESIZE_SCHEMA)


def audio_stats(docs_with_payload: DataFrame, sample_rate: int = 16000,
                payload_col: str = "payload") -> DataFrame:
    """Fake-decode audio stats from the payload: treat bytes as 16-bit PCM
    (n_samples = n_bytes DIV 2), duration at `sample_rate`, and an RMS
    stand-in from the byte sum (a real decoder reads frames — same
    Arrow-batched plumbing)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[payload_col].map(len)
            samples = n // 2
            byte_sum = pdf[payload_col].map(lambda b: sum(b))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_samples": samples,
                "duration_ms": samples * 1000 // sample_rate,
                "rms_x1000": byte_sum * 1000 // n.where(n > 0, 1),
            })
    return (docs_with_payload.select("doc_id", payload_col)
            .mapInPandas(fn, AUDIO_SCHEMA))


EMBED_SCHEMA = "doc_id bigint, dim int, vec_csv string"


def embed_documents_stub(docs: DataFrame, dim: int = 8,
                         text_col: str = "text") -> DataFrame:
    """Batch-inference harness shape (model.apply over Arrow batches):
    'embed' each document. The model is a deterministic stub — component i
    = int(md5(text)[4i:4i+4], 16) — a real deployment swaps the lambda for
    a torch/onnx call over the same mapInPandas plumbing; the vector is
    surfaced as a csv string for engine-portable comparison."""
    assert dim * 4 <= 32
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for t in pdf[text_col]:
                h = hashlib.md5(t.encode()).hexdigest()
                vecs.append(",".join(str(int(h[4 * i:4 * i + 4], 16))
                                     for i in range(dim)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "dim": dim,
                                "vec_csv": vecs})
    return docs.select("doc_id", text_col).mapInPandas(fn, EMBED_SCHEMA)


def frame_sample(docs_with_payload: DataFrame, stride: int = 5,
                 payload_col: str = "payload") -> DataFrame:
    """Treat the payload as a fake video of (n_bytes % 30 + 1) frames and
    emit every `stride`-th frame as its own row — the 1→N fan-out shape of
    real frame sampling. frame_md5 stands in for decoded frame bytes.
    Output: (doc_id, frame_idx, frame_md5).
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                n_frames = len(payload) % 30 + 1
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(
                        f"{doc_id}#{i}".encode()).hexdigest())
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame_md5": pd.Series(hashes, dtype="object")})
    return (docs_with_payload.select("doc_id", payload_col)
            .mapInPandas(fn, FRAME_SCHEMA))
