"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side machinery (schema, batching, partition sizing, UDF
signatures) is real and tested; the decode step is REAL for every
self-describing container (round 12, ``llmops/media_codecs.py``,
pure stdlib/numpy from the public specs): WAV PCM full decode,
BMP 24/32bpp full decode + nearest-neighbor resize, PNG 8-bit full
decode (all five scanline filters) + resize, JPEG/GIF dimension and
GIF frame-count extraction.  Only entropy-coded pixel/sample data
(JPEG/mp3/mp4 content) and video containers stay pluggable behind
the ``DECODERS``/``RESIZERS``/``FEATURIZERS`` registries — an
external codec (PIL/ffmpeg) drops in without touching the Spark
plan, and unsupported payloads fail per-row (ok=false), never the
task.  ``_fake_decode`` remains available for plumbing tests.

Scale notes: binary payloads ride the exchange only when selected —
metadata extraction projects (id, modality, content) and nothing else;
``mapInPandas`` streams Arrow batches so one executor never holds more
than ``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs.  For
100 MB+ media, ingest POINTERS instead of payloads:
``read_media_pointers`` lists files through the ``binaryFile`` source
with the content column pruned away (only path/size/mtime are ever
read), and the extractors take ``from_paths=True`` to open each file
inside the task — the blob then never rides a shuffle or the Arrow
channel at all, and a repartition of the pointer table costs bytes of
path string per row, not the media.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "id long, modality string, n_bytes long, content_hash string, "
    "width int, height int, n_frames int, ok boolean, error string"
)


def _fake_decode(payload: bytes, modality: str) -> dict:
    """Deterministic stand-in for a real media decoder.

    Derives pseudo-dimensions from the payload hash so tests get stable,
    content-dependent values. Replace via ``DECODERS[modality]``."""
    import hashlib

    h = hashlib.sha256(payload).hexdigest()
    return {
        "width": int(h[:4], 16) % 4096,
        "height": int(h[4:8], 16) % 4096,
        "n_frames": 1 if modality == "image" else int(h[8:12], 16) % 300,
    }


def _unavailable_decode(payload: bytes, modality: str) -> dict:
    raise NotImplementedError(
        f"real {modality} decoding requires media libraries not present "
        "in this environment; register a decoder in DECODERS"
    )


def _real_decode(payload: bytes, modality: str) -> dict:
    from .media_codecs import real_media_decode

    return real_media_decode(payload, modality)


#: Pluggable decoder registry.  image/audio default to the REAL
#: pure-Python codecs (BMP/PNG/JPEG/GIF, WAV PCM — see media_codecs);
#: video containers genuinely need ffmpeg, so video keeps the
#: deterministic fake until a real codec is registered.
DECODERS: dict[str, Callable[[bytes, str], dict]] = {
    "image": _real_decode,
    "audio": _real_decode,
    "video": _fake_decode,
}


#: Extension → modality map used by ``read_media_pointers``.
_MODALITY_BY_EXT = {
    "image": ("jpg", "jpeg", "png", "gif", "bmp", "webp", "tiff"),
    "audio": ("wav", "mp3", "flac", "ogg", "m4a", "opus"),
    "video": ("mp4", "mkv", "avi", "mov", "webm"),
}


def read_media_pointers(
    spark,
    path: str,
    pattern: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Pointer ingestion for large media: list files via the
    ``binaryFile`` source but select only (path, length, mtime) — the
    source prunes the content column, so no payload bytes are read.
    Modality is inferred from the file extension.

    Returns (media_path, n_bytes, mtime, modality).  Feed to the
    extractors with ``from_paths=True``."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if pattern is not None:
        reader = reader.option("pathGlobFilter", pattern)
    df = reader.load(path).select(
        F.col("path").alias("media_path"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("mtime"),
    )
    ext = F.lower(F.element_at(F.split("media_path", r"\."), -1))
    modality = F.lit("unknown")
    for m, exts in _MODALITY_BY_EXT.items():
        modality = F.when(ext.isin(*exts), m).otherwise(modality)
    return df.withColumn("modality", modality)


def _load_path(p: str) -> bytes:
    """Open one media file inside the task (executor-local read).
    ``binaryFile`` emits file: URIs; strip the scheme for local paths —
    object-store schemes would dispatch to their client here."""
    local = p[len("file:"):] if p.startswith("file:") else p
    with open(local, "rb") as fh:
        return fh.read()


def extract_media_metadata(
    df: DataFrame,
    id_col: str = "id",
    content_col: str = "content",
    modality_col: str = "modality",
    from_paths: bool = False,
) -> DataFrame:
    """Decode opaque binary media columns into typed metadata rows via
    Arrow-batched ``mapInPandas``. Decode failures are captured per row
    (ok=false, error) instead of failing the task — at scale a single
    corrupt blob must not kill a 10k-partition job.

    ``from_paths=True``: ``content_col`` holds file paths (from
    ``read_media_pointers``); each task opens its own files and the
    payload never crosses the Arrow channel or a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                modality = r[modality_col]
                base = {
                    "id": r[id_col],
                    "modality": modality,
                    "n_bytes": None,
                    "content_hash": None,
                    "width": None,
                    "height": None,
                    "n_frames": None,
                    "ok": False,
                    "error": None,
                }
                try:  # per-row failure isolation: load AND decode
                    if from_paths:
                        payload = _load_path(r[content_col])
                    else:
                        payload = (
                            bytes(r[content_col])
                            if r[content_col] is not None
                            else b""
                        )
                    base["n_bytes"] = len(payload)
                    base["content_hash"] = hashlib.sha256(payload).hexdigest()
                    decoder = DECODERS.get(modality, _unavailable_decode)
                    base.update(decoder(payload, modality))
                    base["ok"] = True
                except Exception as exc:
                    base["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(base)
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "modality", "n_bytes", "content_hash",
                    "width", "height", "n_frames", "ok", "error",
                ],
            )

    return df.select(id_col, modality_col, content_col).mapInPandas(
        run, schema=META_SCHEMA
    )


def binary_metadata(
    df: DataFrame, id_col: str = "doc_id", binary_col: str = "blob"
) -> DataFrame:
    """Pure-Catalyst metadata over a binary column (no UDF): byte length
    + sha256. The cheap first pass before any decode fan-out."""
    return df.select(
        F.col(id_col),
        F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(binary_col), 256).alias("content_sha256"),
    )


FEATURES_SCHEMA = (
    "id long, modality string, feature array<float>, feat_dim int, ok boolean"
)


def _fake_features(payload: bytes, modality: str, dim: int) -> list[float]:
    """Deterministic stand-in for decode→resize→embed: derives a
    unit-norm feature vector from the payload hash. Replaces cleanly
    with a real (PIL/ffmpeg + model) pipeline; the Spark-side contract
    — Arrow batches in, fixed-dim float vectors out — is identical."""
    import hashlib
    import math

    h = hashlib.sha256(payload + modality.encode()).digest()
    vals = [((h[i % 32] / 255.0) * 2.0 - 1.0) for i in range(dim)]
    nrm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / nrm for v in vals]


def _image_features(payload: bytes, modality: str, dim: int) -> list[float]:
    from .media_codecs import image_content_features

    return image_content_features(payload, dim)


def _audio_features(payload: bytes, modality: str, dim: int) -> list[float]:
    from .media_codecs import wav_signal_features

    return wav_signal_features(payload, dim)


#: Pluggable featurizer registry (modality → fn(payload, mod, dim)).
#: image/audio default to REAL content features over the decoded
#: pixels/PCM (channel stats + histogram; rms/zcr/spectrum — see
#: media_codecs); video keeps the deterministic hash stand-in until a
#: real frame pipeline is registered (an embedding MODEL is genuinely
#: out of scope for a pure-Python layer either way).
FEATURIZERS: dict[str, Callable[[bytes, str, int], list[float]]] = {
    "image": _image_features,
    "audio": _audio_features,
    "video": _fake_features,
}


def extract_media_features(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "id",
    content_col: str = "content",
    modality_col: str = "modality",
    from_paths: bool = False,
) -> DataFrame:
    """Decode + feature-extract media blobs into fixed-dim vectors via
    mapInPandas — the fan-out stage feeding similarity search
    (llmops.simsearch) on multimodal corpora.

    Batch-shape contract: every output row carries a feat_dim-length
    array<float>; failures yield ok=false with a null feature, never a
    task failure.  ``from_paths=True``: ``content_col`` holds file
    paths (``read_media_pointers``); payloads are opened in-task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    if from_paths:
                        payload = _load_path(r[content_col])
                    else:
                        payload = (
                            bytes(r[content_col])
                            if r[content_col] is not None
                            else b""
                        )
                    featurizer = FEATURIZERS.get(r[modality_col])
                    if featurizer is None:
                        raise NotImplementedError(
                            f"no featurizer for {r[modality_col]!r}"
                        )
                    feat = featurizer(payload, r[modality_col], dim)
                    rows.append((r[id_col], r[modality_col], feat, dim, True))
                except Exception:
                    rows.append((r[id_col], r[modality_col], None, dim, False))
            yield pd.DataFrame(
                rows, columns=["id", "modality", "feature", "feat_dim", "ok"]
            )

    return df.select(id_col, modality_col, content_col).mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


RESIZED_SCHEMA = (
    "id long, modality string, content binary, width int, height int,"
    " ok boolean, error string"
)


def _fake_resize(
    payload: bytes, modality: str, width: int, height: int
) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: an 8-byte
    target-dimension header over the content hash, so output bytes are
    stable, content-dependent, and dimension-dependent.  A real
    implementation (PIL ``Image.resize`` + re-encode) drops into
    ``RESIZERS`` without touching the Spark plan."""
    import hashlib

    return (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + hashlib.sha256(payload).digest()
    )


def _unavailable_transform(payload: bytes, modality: str, *a) -> bytes:
    raise NotImplementedError(
        f"real {modality} transforms require media libraries not present"
        " in this environment; register in RESIZERS / FRAME_SAMPLERS"
    )


def _real_resize(
    payload: bytes, modality: str, width: int, height: int
) -> bytes:
    from .media_codecs import real_image_resize

    return real_image_resize(payload, modality, width, height)


#: Pluggable resize registry (modality → fn(payload, modality, w, h)).
#: image defaults to the REAL nearest-neighbor decode→resize→re-encode
#: for BMP/PNG (media_codecs); entropy-coded containers fail per-row
#: until an external codec is registered.
RESIZERS: dict[str, Callable[..., bytes]] = {"image": _real_resize}


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "id",
    content_col: str = "content",
    modality_col: str = "modality",
    from_paths: bool = False,
) -> DataFrame:
    """Resize media blobs to (width, height) via Arrow-batched
    ``mapInPandas`` — the normalization step before feature extraction
    or vision-model packing.  Same contracts as the extractors:
    per-row failure isolation (a corrupt blob yields ok=false, never a
    task failure), pluggable codec (``RESIZERS``), and
    ``from_paths=True`` to open pointer-ingested files in-task so the
    original payload never rides a shuffle.

    Scale note: output blobs DO ride the Arrow channel (they are the
    product); size the batch via
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of
    resized frames fits executor memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                modality = r[modality_col]
                try:
                    if from_paths:
                        payload = _load_path(r[content_col])
                    else:
                        payload = (
                            bytes(r[content_col])
                            if r[content_col] is not None
                            else b""
                        )
                    fn = RESIZERS.get(modality, _unavailable_transform)
                    out = fn(payload, modality, width, height)
                    rows.append(
                        (r[id_col], modality, out, width, height, True,
                         None)
                    )
                except Exception as exc:
                    rows.append(
                        (r[id_col], modality, None, width, height, False,
                         f"{type(exc).__name__}: {exc}")
                    )
            yield pd.DataFrame(
                rows,
                columns=["id", "modality", "content", "width", "height",
                         "ok", "error"],
            )

    return df.select(id_col, modality_col, content_col).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = (
    "id long, frame_idx int, frame binary, ok boolean, error string"
)


def _fake_frame_sampler(
    payload: bytes, modality: str, n_frames: int
) -> list[bytes]:
    """Deterministic stand-in for video frame sampling: a hash chain
    over the payload yields ``n_frames`` stable pseudo-frames.  A real
    sampler (ffmpeg keyframe / uniform-timestamp extraction) drops
    into ``FRAME_SAMPLERS`` with the same signature."""
    import hashlib

    frames, h = [], payload
    for i in range(n_frames):
        h = hashlib.sha256(h + bytes([i & 255])).digest()
        frames.append(h)
    return frames


#: Pluggable frame-sampler registry (modality → fn(payload, mod, n)).
FRAME_SAMPLERS: dict[str, Callable[..., list[bytes]]] = {
    "video": _fake_frame_sampler,
}


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "id",
    content_col: str = "content",
    modality_col: str = "modality",
    from_paths: bool = False,
) -> DataFrame:
    """Sample ``n_frames`` frames per video blob, exploded to one row
    per frame: (id, frame_idx, frame, ok, error).  A failed blob emits
    ONE ok=false row (frame_idx 0) so the failure stays visible in the
    output without multiplying error rows.

    Scale: the row fan-out is n_frames×, each carrying a frame blob —
    downstream ops (resize, feature-extract over frames) consume this
    stream without ever reassembling whole videos; at 100 TB keep the
    source as pointers (``from_paths=True``) so only frames, never
    source videos, ride the Arrow channel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                modality = r[modality_col]
                try:
                    if from_paths:
                        payload = _load_path(r[content_col])
                    else:
                        payload = (
                            bytes(r[content_col])
                            if r[content_col] is not None
                            else b""
                        )
                    fn = FRAME_SAMPLERS.get(
                        modality, _unavailable_transform
                    )
                    for i, frame in enumerate(
                        fn(payload, modality, n_frames)
                    ):
                        rows.append((r[id_col], i, frame, True, None))
                except Exception as exc:
                    rows.append(
                        (r[id_col], 0, None, False,
                         f"{type(exc).__name__}: {exc}")
                    )
            yield pd.DataFrame(
                rows,
                columns=["id", "frame_idx", "frame", "ok", "error"],
            )

    return df.select(id_col, modality_col, content_col).mapInPandas(
        run, schema=FRAMES_SCHEMA
    )
