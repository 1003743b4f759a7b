"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side machinery (schema, batching, partition sizing, UDF
signatures) is real and tested; the codec step itself is stubbed —
image/audio libraries are not in this container — behind
``DECODERS``: the default "fake" decoder is deterministic so tests can
assert end-to-end plumbing, and a real decoder (PIL/ffmpeg) drops in
without touching the Spark plan.

Scale notes: binary payloads ride the exchange only when selected —
metadata extraction projects (id, modality, content) and nothing else;
``mapInPandas`` streams Arrow batches so one executor never holds more
than ``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs; for 100 MB+
media files switch ingestion to ``binaryFile`` + path pointers and feed
the UDF paths, not payloads.
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


#: Pluggable decoder registry; swap in real codecs when available.
DECODERS: dict[str, Callable[[bytes, str], dict]] = {
    "image": _fake_decode,
    "audio": _fake_decode,
    "video": _fake_decode,
}


def extract_media_metadata(
    df: DataFrame,
    id_col: str = "id",
    content_col: str = "content",
    modality_col: str = "modality",
) -> DataFrame:
    """Decode opaque binary media columns into typed metadata rows via
    Arrow-batched ``mapInPandas``. Decode failures are captured per row
    (ok=false, error) instead of failing the task — at scale a single
    corrupt blob must not kill a 10k-partition job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[content_col]) if r[content_col] is not None else b""
                modality = r[modality_col]
                base = {
                    "id": r[id_col],
                    "modality": modality,
                    "n_bytes": len(payload),
                    "content_hash": hashlib.sha256(payload).hexdigest(),
                    "width": None,
                    "height": None,
                    "n_frames": None,
                    "ok": False,
                    "error": None,
                }
                try:
                    decoder = DECODERS.get(modality, _unavailable_decode)
                    base.update(decoder(payload, modality))
                    base["ok"] = True
                except Exception as exc:  # per-row failure isolation
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
        F.length(F.col(binary_col)).alias("n_bytes"),
        F.sha2(F.col(binary_col), 256).alias("content_sha256"),
    )
