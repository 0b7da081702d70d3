"""Multimodal-column plumbing (SURVEY §2.9 X4).

Driver-mandated extension: treat image/audio/video as opaque ``binary``
columns with typed metadata structs, with decode / feature-extract /
resize / frame-sample as Arrow-batched Pandas functions over
``mapInPandas``.

The decode step itself is STUBBED — the image/audio libraries are not in
this container — behind an import-try: with Pillow/librosa installed the
real decoder slots into ``_decode_image_real``; without them a
deterministic fake (seeded by content hash) exercises the full Spark-side
plumbing: schema, binary transport through Arrow, batch iteration,
partition sizing.

Scale notes: binary payloads make *row size*, not row count, the
partitioning constraint — ``repartition`` by byte-size budget before
mapInPandas (``target_partition_bytes``), and keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low enough that a batch
of blobs fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_SCHEMA = (
    "n_bytes long, content_sha string, width int, height int, format string"
)

try:  # the real decoder gate — not present in this container
    import PIL.Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def attach_blob(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Materialize an opaque ``binary`` media column (here: the utf-8
    bytes of a text payload stand in for real media bytes — deterministic
    and schema-faithful)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(payload_col), "utf-8").alias("blob"),
    )


def _decode_image_real(data: bytes) -> tuple[int, int, str]:
    """Real decode path (requires Pillow)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "Image decoding requires Pillow, which is not installed in this "
            "environment; the deterministic fake decoder is used instead."
        )
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(data))
    return img.width, img.height, img.format or "unknown"


def _decode_image_fake(data: bytes) -> tuple[int, int, str]:
    """Deterministic fake decode: dimensions derived from the content
    hash, so tests are stable and the plumbing (batch shapes, schema,
    null handling) is fully exercised."""
    digest = hashlib.md5(data).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    return width, height, "fake"


def decode_metadata(
    df: DataFrame,
    id_col: str,
    blob_col: str = "blob",
    use_real_decoder: bool = False,
    target_partition_bytes: int | None = None,
) -> DataFrame:
    """Extract typed metadata from binary media via Arrow-batched
    ``mapInPandas`` — the X4 decode/feature-extract plumbing."""
    use_real = use_real_decoder or _HAS_PIL
    out_schema = f"{id_col} long, {METADATA_SCHEMA}"

    src = df.select(id_col, blob_col)
    if target_partition_bytes:
        # row-size-aware repartitioning: estimate rows per partition from
        # the average blob size of a sample
        sample = src.select(F.avg(F.length(F.col(blob_col)))).first()[0] or 1
        total = src.count()
        rows_per_part = max(1, int(target_partition_bytes / max(sample, 1)))
        src = src.repartition(max(1, total // rows_per_part))

    # The closure must stay self-contained (only plain-value captures,
    # imports inside): cloudpickle ships it by value, so executors never
    # need this package importable — the driver contract calls us from an
    # arbitrary cwd with only the driver's sys.path.
    def batches(it: Iterator) -> Iterator:
        import hashlib as _hashlib

        import pandas as pd

        def decode(data: bytes) -> tuple[int, int, str]:
            if use_real:
                import io

                import PIL.Image

                img = PIL.Image.open(io.BytesIO(data))
                return img.width, img.height, img.format or "unknown"
            digest = _hashlib.md5(data).digest()
            return 64 + digest[0] % 192, 64 + digest[1] % 192, "fake"

        for pdf in it:
            metas = []
            for _, row in pdf.iterrows():
                data = bytes(row[blob_col])
                width, height, fmt = decode(data)
                metas.append(
                    (
                        row[id_col],
                        len(data),
                        _hashlib.sha256(data).hexdigest(),
                        width,
                        height,
                        fmt,
                    )
                )
            yield pd.DataFrame(
                metas,
                columns=[id_col, "n_bytes", "content_sha", "width", "height", "format"],
            )

    return src.mapInPandas(batches, schema=out_schema)


def frame_sample(
    df: DataFrame,
    id_col: str,
    blob_col: str = "blob",
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame sampling plumbing: one blob row fans out to up to
    ``max_frames`` frame rows — the one-to-many Arrow batch shape
    (output length ≠ input length through ``mapInPandas``).

    The real decoder (keyframe extraction) is gated behind the media
    libraries; the deterministic fake emits one "frame" per
    ``every_n_bytes`` window of the payload, carrying (frame_index,
    offset, frame_sha) — so schema, row expansion, and batch handling
    are fully exercised. frame_sha is sha256 over the window's UPPER
    hex encoding (see :func:`audio_windows` — DuckDB cannot slice or
    hash BLOBs, hex slicing keeps the oracle byte-exact on any text). Row-size note as in :func:`decode_metadata`:
    output multiplicity × blob size drives partition memory, so cap
    ``max_frames`` and size partitions by bytes, not rows.
    """
    out_schema = f"{id_col} long, frame_index int, offset long, frame_sha string"

    # self-contained closure: plain-value captures, imports inside
    def batches(it: Iterator) -> Iterator:
        import hashlib as _hashlib

        import pandas as pd

        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row[blob_col])
                n = min(max_frames, max(1, len(data) // every_n_bytes))
                for i in range(n):
                    off = i * every_n_bytes
                    window = data[off : off + every_n_bytes]
                    rows.append(
                        (
                            row[id_col],
                            i,
                            off,
                            _hashlib.sha256(
                                window.hex().upper().encode()
                            ).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_index", "offset", "frame_sha"]
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=out_schema)


def resize_stub(df: DataFrame, id_col: str, blob_col: str = "blob") -> DataFrame:
    """Resize plumbing: passes blobs through the same Arrow path; the
    actual pixel transform raises behind the Pillow gate."""
    out_schema = f"{id_col} long, blob binary"
    has_pil = _HAS_PIL

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            if has_pil:
                raise NotImplementedError("wire the real resize here")
            yield pdf[[id_col, blob_col]]

    return df.select(id_col, blob_col).mapInPandas(batches, schema=out_schema)


def audio_windows(
    df: DataFrame,
    id_col: str,
    blob_col: str = "blob",
    sample_rate: int = 16000,
    bytes_per_sample: int = 2,
    window_s: float = 1.0,
) -> DataFrame:
    """Time-window segmentation of opaque audio blobs: sample-rate
    metadata turns seconds into byte ranges, each window is sliced with
    binary ``substring`` and content-addressed with sha256 — the
    chunking stage in front of any audio featurizer.

    The content address is sha256 over the window's HEX encoding (not
    the raw bytes): DuckDB's sha256 only accepts VARCHAR and cannot
    slice BLOBs, while hex-string slicing is byte slicing (2 chars per
    byte) in both engines — so the differential oracle stays byte-exact
    on arbitrary (multi-byte) payloads instead of silently depending on
    ASCII-only testdata. Same collision resistance, engine-portable.

    Unlike the image/video paths (whose decoders genuinely need
    libraries and run as gated mapInPandas), windowing is pure byte
    arithmetic, so it stays ENTIRELY in whole-stage codegen: sequence →
    explode → substring → sha2, no Python, exact DuckDB twin. Output
    multiplicity is len/window_bytes; the explode multiplies row count
    but each row carries only its window's bytes.
    """
    bpw = int(sample_rate * bytes_per_sample * window_s)
    blob = F.col(blob_col)
    n = F.greatest(F.ceil(F.length(blob) / F.lit(bpw)), F.lit(1)).cast("int")
    win = df.select(
        F.col(id_col),
        blob,
        F.explode(F.sequence(F.lit(0), n - 1)).alias("window_index"),
    )
    off = F.col("window_index").cast("long") * bpw
    chunk = F.substring(blob, (off + 1).cast("int"), bpw)
    return win.select(
        F.col(id_col),
        F.col("window_index"),
        off.alias("byte_off"),
        F.round(off / F.lit(float(sample_rate * bytes_per_sample)), 6).alias(
            "start_s"
        ),
        F.length(chunk).alias("n_bytes"),
        F.sha2(F.hex(chunk), 256).alias("window_sha"),
    )
